"""Probe the Pallas TV kernel on the real TPU: compile coverage across
(hw, volume), parity vs the XLA shift-sum path, and throughput.

Usage: python tools/probe_tv.py [hw] [n] [reps]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from visfd_tpu.features import tv as TV
from visfd_tpu.ops.tv_pallas import tv_dense_stick_pallas


def run(hw: int, n: int, reps: int = 3, check_parity: bool = True):
    sigma = hw / np.sqrt(2.0) + 1e-3  # truncate sqrt(2) -> this hw
    ratio = float(np.sqrt(2.0))
    assert int(np.floor(sigma * ratio)) == hw, (sigma, hw)
    rng = np.random.default_rng(0)
    sal = jnp.asarray(rng.random((n, n, n), dtype=np.float32))
    v = rng.normal(size=(n, n, n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    nvec = jnp.asarray(v)

    f = jax.jit(lambda s, d: tv_dense_stick_pallas(
        s, d, sigma, exponent=4, truncate_ratio=ratio)[0])

    # one dispatch covers `reps` executions (per-dispatch timing through
    # the axon tunnel is dominated by WAN latency; see bench.py)
    def loop(s, d):
        import jax.lax as lax

        def body(_, carry):
            return f(carry, d)[..., 0]
        return lax.fori_loop(0, reps, body, s)

    g = jax.jit(loop)
    t0 = time.time()
    try:
        out = f(sal, nvec)
        np.asarray(out[0, 0, 0])
        warm = g(sal, nvec)
        np.asarray(warm[0, 0, 0])
    except Exception as exc:
        print(f"hw={hw} n={n}: COMPILE/RUN FAILED: "
              f"{type(exc).__name__}: {str(exc)[:300]}")
        return
    t_compile = time.time() - t0

    t0 = time.time()
    o = g(sal, nvec)
    _ = np.asarray(o[0, 0, 0])
    dt = (time.time() - t0) / reps
    mvox = n ** 3 / dt / 1e6
    print(f"hw={hw} n={n}: compile+1st {t_compile:.1f}s, "
          f"{dt*1e3:.1f} ms/iter, {mvox:.1f} Mvox/s")

    if check_parity:
        ref = TV.tv_dense_stick(sal, nvec, sigma, exponent=4,
                                truncate_ratio=ratio, normalize=False,
                                use_pallas=False)
        a = np.asarray(out)
        b = np.asarray(ref)
        denom = np.abs(b).max()
        print(f"  parity max rel: {np.abs(a - b).max() / denom:.3e}")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        hw = int(sys.argv[1])
        n = int(sys.argv[2])
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        parity = "--no-parity" not in sys.argv
        run(hw, n, reps, parity)
    else:
        for hw, n, parity in [(2, 128, True), (3, 128, True),
                              (3, 192, True), (3, 256, False),
                              (4, 192, False), (5, 128, True),
                              (5, 192, False)]:
            run(hw, n, 3, parity)
