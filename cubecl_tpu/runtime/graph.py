"""Graph capture / replay — whole-sequence compilation.

Reference: CUDA-graph capture (client.start_capture/stop_capture +
Graph::replay, cubecl-runtime/src/client.rs:998-1020,120; CUDA impl
cubecl-cuda/src/compute/graph.rs) with persistent-pool pinning
(memory_manage.rs:135-165).

TPU-native equivalent: record the launch sequence, then jit the whole
recorded computation as ONE XLA executable — replay is a single dispatch,
eliminating per-launch Python/dispatch overhead exactly like a CUDA graph
eliminates per-kernel launch cost. Handles touched during capture are the
graph's inputs/outputs; replay rebinds them functionally.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

from .handle import Handle
from .kernel import KernelTask


@dataclass
class _Recorded:
    task: KernelTask
    buffer_ids: List[int]
    scalars: Tuple[Any, ...]
    mutable_indices: List[int]


class Graph:
    """A captured launch sequence compiled to one executable."""

    def __init__(self, client, recorded: List[_Recorded],
                 handles: Dict[int, Handle]):
        self._client = client
        self._recorded = recorded
        self._handles = handles
        self._jfn = None
        self._input_ids: List[int] = []
        self._output_ids: List[int] = []
        self._build()

    def _build(self) -> None:
        import jax

        server = self._client._dev.call(lambda s: s)
        compiled = []
        for rec in self._recorded:
            ck, _ = server.compile_kernel(rec.task)
            compiled.append(ck)
            rec.mutable_indices = ck.mutable_indices

        read_ids: List[int] = []
        written: set = set()
        for rec, ck in zip(self._recorded, compiled):
            for i, hid in enumerate(rec.buffer_ids):
                if hid not in written and hid not in read_ids:
                    read_ids.append(hid)
                if i in ck.mutable_indices:
                    written.add(hid)
        self._input_ids = read_ids
        self._output_ids = sorted(written)
        # inputs that the sequence also rewrites are DONATED on replay:
        # without donation XLA keeps the original buffers alive and a
        # captured in-place serving loop re-pays the copy the aliased
        # single-kernel path avoids (measured 2x — BENCH_NOTES hazard 4;
        # mirrors server.launch's donate_argnums on mutable buffers)
        self._donate_ids = [h for h in read_ids if h in written]
        self._ro_ids = [h for h in read_ids if h not in written]

        recorded = list(self._recorded)

        def whole(donated: Sequence[Any], readonly: Sequence[Any]):
            env: Dict[int, Any] = dict(zip(self._donate_ids, donated))
            env.update(zip(self._ro_ids, readonly))
            for rec, ck in zip(recorded, compiled):
                bufs = [env[hid] for hid in rec.buffer_ids]
                outs = ck.fn(bufs, rec.scalars)
                for k, i in enumerate(ck.mutable_indices):
                    env[rec.buffer_ids[i]] = outs[k]
            return [env[hid] for hid in self._output_ids]

        self._fn = whole  # unjitted body (re-traceable, e.g. for timing)
        # timing re-runs the same inputs, so it uses the non-donating jit
        self._jfn = jax.jit(whole)
        self._jfn_donate = jax.jit(whole, donate_argnums=(0,))

    def replay(self) -> None:
        """Re-dispatch the whole recorded sequence as one launch
        (reference Graph::replay, client.rs:120). Rewritten inputs are
        donated; their handles are rebound to the fresh outputs below,
        exactly like the single-kernel launch path."""
        don = [self._handles[hid].array for hid in self._donate_ids]
        ro = [self._handles[hid].array for hid in self._ro_ids]
        outs = self._jfn_donate(don, ro)
        for hid, arr in zip(self._output_ids, outs):
            self._handles[hid].array = arr

    @property
    def num_kernels(self) -> int:
        return len(self._recorded)


class CaptureState:
    """Recording sink installed on the client during capture."""

    def __init__(self) -> None:
        self.recorded: List[_Recorded] = []
        self.handles: Dict[int, Handle] = {}

    def record(self, task: KernelTask, buffers: Sequence[Handle],
               scalars: Sequence[Any]) -> None:
        for h in buffers:
            self.handles[h.id] = h
        self.recorded.append(_Recorded(
            task, [h.id for h in buffers], tuple(scalars), []))
