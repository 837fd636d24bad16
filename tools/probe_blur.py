"""Probe the fused Pallas separable blur on the real TPU: parity vs
the XLA shift-sum path and throughput.

Usage: python tools/probe_blur.py [n] [hw] [reps]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def run(n: int, hw: int, reps: int = 10):
    from visfd_tpu.ops.blur_pallas import _blur3_pallas_jit
    from visfd_tpu.ops.conv import _conv1d_axis_impl

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n, n, n), dtype=np.float32))
    k = jnp.asarray(rng.random(2 * hw + 1).astype(np.float32))

    def xla(v, kk):
        out = _conv1d_axis_impl(v, kk, 0)
        out = _conv1d_axis_impl(out, kk, 1)
        return _conv1d_axis_impl(out, kk, 2)

    def bench(f, tag):
        g = jax.jit(lambda v, kk: jax.lax.fori_loop(
            0, reps, lambda _, c: f(c, kk) * 0.5, v))
        o = g(x, k)
        np.asarray(o[0, 0, 0])  # warm
        t0 = time.time()
        o = g(x, k)
        _ = np.asarray(o[0, 0, 0])
        dt = (time.time() - t0) / reps
        mvox = n ** 3 / dt / 1e6
        gbs = n ** 3 * 8 / dt / 1e9
        print(f"{tag}: n={n} hw={hw} {dt*1e3:.2f} ms/iter, "
              f"{mvox:.0f} Mvox/s, {gbs:.0f} GB/s min-traffic "
              f"({gbs/819*100:.0f}% SoL)")

    a = _blur3_pallas_jit(x, k, k, k)
    b = xla(x, k)
    err = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
    print(f"parity max rel: {err:.3e}")
    bench(lambda v, kk: _blur3_pallas_jit(v, kk, kk, kk), "pallas")
    bench(xla, "xla   ")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    run(n, hw, reps)
