"""Evaluator split into mixins (round-4 hardening: the 2.8k-line eval.py
monolith held both round-2 advisor bugs — mem/plane/control/mma are now
separately reviewable and fuzzable). Assembled by ..eval.Evaluator."""
