"""Bake-off: y-block size for the fused eigen kernels (round-5).

sym3_score_fused measured 1.0 Gvox/s at 28 GB/s -- nowhere near any
plausible bound (round-4 verdict weak #3).  The kernel is purely
voxelwise (no stencil halo), so the block shape is free; this measures
the y-block cap {64, 128, 256} for both fused kernels at 384^3 on the
real chip.  The winner becomes ``_pick_by``'s cap.

Run standalone with the TPU idle:  python tools/bakeoff_eig_by.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from visfd_tpu.ops import eigen_pallas as EP
    from visfd_tpu.features import hessian as FH

    n = int(os.environ.get("BAKE_SIZE", "384"))
    iters = int(os.environ.get("BAKE_ITERS", "10"))

    @jax.jit
    def gen():
        zz = jax.lax.broadcasted_iota(jnp.float32, (n,) * 3, 0)
        yy = jax.lax.broadcasted_iota(jnp.float32, (n,) * 3, 1)
        xx = jax.lax.broadcasted_iota(jnp.float32, (n,) * 3, 2)
        return jnp.sin(zz * 12.99 + yy * 78.2 + xx * 37.7)

    @jax.jit
    def gen_t6(v):
        return jnp.moveaxis(FH.hessian_fd(v), -1, 0)

    x = gen()
    float(x[0, 0, 0])
    t6 = gen_t6(x)
    float(t6[0, 0, 0, 0])

    orig_pick = EP._pick_by

    def timed(fn, out_index):
        c = fn()
        float(c[out_index])      # warm/compile
        t0 = time.time()
        for _ in range(iters):
            c = fn()
        float(c[out_index])
        return (time.time() - t0) / iters

    for cap in (64, 128, 256):
        def pick(ny, nxa, cap=cap):
            by = min(cap, -(-ny // 8) * 8)
            while (by > 8 and EP._SOLVER_STACK_SLOTS * (by + 2) * nxa * 4
                   > EP._STACK_BUDGET_BYTES):
                by = max(8, -(-by // 2 // 8) * 8)
            return by

        EP._pick_by = pick
        EP._sym3_score_impl.clear_cache()
        EP._hessian_principal_impl.clear_cache()
        try:
            dt_s = timed(lambda: EP.sym3_score_pallas(
                t6, decreasing=True, formula="stick")[0], (0, 0, 0))
            print(f"by<={cap}: sym3_score {n**3/dt_s/1e6:8.1f} Mvox/s")
        except Exception as e:
            print(f"by<={cap}: sym3_score FAILED "
                  f"({str(e).splitlines()[0][:90]})")
        try:
            dt_h = timed(lambda: EP.hessian_principal_pallas(
                x, 2.0, formula="planar", want_v=True)[0], (0, 0, 0))
            print(f"by<={cap}: hessian_eig {n**3/dt_h/1e6:8.1f} Mvox/s")
        except Exception as e:
            print(f"by<={cap}: hessian_eig FAILED "
                  f"({str(e).splitlines()[0][:90]})")
    EP._pick_by = orig_pick


if __name__ == "__main__":
    main()
