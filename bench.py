"""Benchmark driver: flagship membrane-detection step on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The benchmarked computation is the hot path of the reference's
flagship `filter_mrc -membrane ... -tv ...` pipeline (SURVEY 3.2):
separable Gaussian blur -> FD Hessian -> voxelwise closed-form
eigendecomposition -> planar saliency -> dense stick tensor voting ->
vote-tensor eigendecomposition -> stick saliency, fused into one jit.

vs_baseline compares voxels/s against the compiled C++ reference
(16-thread OpenMP) measured on the same machine and stored in
``baseline_cpp.json`` (see tools/measure_reference.py); falls back to
1.0 if no measurement is available.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as G

    # 128^3 keeps remote-compile time bounded (larger shapes compile
    # slowly through the axon remote-compile tunnel); execution-side
    # throughput is shape-stable from 128^3 up.
    n = int(os.environ.get("BENCH_SIZE", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    fn, _ = G.entry()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, n, n)).astype(np.float32))
    jfn = jax.jit(fn)
    # compile + warmup
    out = jfn(x)
    out.block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        out = jfn(x)
    out.block_until_ready()
    dt = (time.time() - t0) / iters
    voxels_per_s = (n ** 3) / dt

    vs_baseline = 1.0
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baseline_cpp.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("voxels_per_s"):
            vs_baseline = voxels_per_s / float(base["voxels_per_s"])

    print(json.dumps({
        "metric": "membrane_tv_pipeline_voxels_per_s",
        "value": round(voxels_per_s, 1),
        "unit": "voxels/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
