"""Tracing/profiling example (reference examples/tracing_example —
OTEL spans around collectives; here: the ServerLogger profile levels plus
jax.profiler integration)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cubecl_tpu import default_client
from cubecl_tpu.ops import reduce_sum


def launch():
    os.environ.setdefault("CUBECL_PROFILING_LEVEL", "medium")
    client = default_client()
    logger = client._dev.call(lambda s: s.logger)
    logger.profile_level = "medium"

    x = np.random.randn(1 << 16).astype(np.float32)
    h = client.create(x)

    d = client.profile(lambda: reduce_sum(client, h, line_size=128,
                                          target_cubes=16))
    logger.log_launch("reduce_sum", d.seconds)
    print(f"reduce_sum: {d.millis:.3f} ms")
    print("aggregated:", logger.summary())

    # device-level traces (viewable in TensorBoard / Perfetto):
    #   import jax
    #   with jax.profiler.trace("/tmp/jax-trace"):
    #       reduce_sum(client, h)


if __name__ == "__main__":
    launch()
