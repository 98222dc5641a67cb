"""Peak-throughput harness (reference examples/throughput/src/lib.rs:45-75):
measures compute-direct (VPU), compute-MXU, memory bandwidth and launch
overhead; results feed the autotuner's roofline bounds."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cubecl_tpu import default_client
from cubecl_tpu.std import ThroughputCache


def launch():
    client = default_client()
    cache = ThroughputCache(client)
    peaks = cache.all()
    print(f"device: {client.properties().identity.name}")
    print(f"compute-direct (VPU): {peaks['compute_direct'] / 1e12:.2f} TFLOP/s")
    print(f"compute-MXU:          {peaks['compute_cmma'] / 1e12:.2f} TFLOP/s")
    print(f"memory bandwidth:     {peaks['memory'] / 1e9:.1f} GB/s")
    print(f"launch overhead:      {peaks['launch'] * 1e6:.1f} us")


if __name__ == "__main__":
    launch()
