"""Multi-chip scaling projection from single-chip measurements.

Real multi-chip hardware is unavailable in this environment (one v5e
chip behind the axon tunnel), so this is the honest substitute the
round-4 verdict asked for (#7): measure the per-shard fused kernels on
the BLOCK SHAPES a (z, y) mesh would give each chip for a production
volume, model the halo-exchange bytes each step ships over ICI, and
project per-chip efficiency per mesh size.

Model (stated assumptions):

* Mesh shapes follow ``parallel.mesh.make_mesh``'s near-square
  factorization of N chips into (nz_m, ny_m); the volume is
  block-partitioned over (Z, Y), X unsharded.
* Per-chip compute time = measured single-chip time of each fused
  kernel on the per-chip block shape (same kernels the sharded path
  runs under shard_map; they are bit-identical per shard).
* Halo bytes per flagship step (both directions, per chip, hw = vote
  halfwidth, shapes in voxels, f32):
    - blur: hw_b-deep z/y faces of the input block (1 ch);
    - fused Hessian/eigen: 1-deep faces of the blurred block (1 ch);
    - TV: hw-deep faces of saliency (1 ch) + direction (3 ch).
  A (bz, by, nx) block's z-face is by*nx voxels, y-face bz*nx; interior
  chips exchange both faces of each axis (2x), edge chips one -- the
  projection uses the worst case (interior chip).
* ICI: v5e has 4 ICI links/chip; we assume the neighbor-exchange
  (ppermute) rides 1 link per face pair at ICI_BW_PER_LINK one-way
  (4.5e10 B/s, the published v5e figure); z and y exchanges serialize
  in halo_pad (two collectives).  DCN is NOT modeled: within-slice
  meshes only.
* Two projections: "no overlap" (halo time adds to compute -- the
  current shard_map code, which exchanges then computes) and
  "overlap" (halo fully hidden behind compute, the upper bound a
  double-buffered exchange could reach).

Writes a markdown table to stdout and merges a ``scaling_projection``
section into PERF.json.  Run with the TPU idle:

    python tools/scaling_projection.py [--volume 512] [--chips 1,2,4,8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ICI_BW_PER_LINK = 4.5e10   # bytes/s one-way per v5e ICI link


def near_square(n):
    best = (n, 1)
    for ny in range(1, int(np.sqrt(n)) + 1):
        if n % ny == 0:
            best = (n // ny, ny)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--volume", type=int, default=512)
    ap.add_argument("--chips", default="1,2,4,8,16")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--hw", type=int, default=3, help="vote halfwidth")
    ap.add_argument("--json-out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PERF.json"))
    cfg = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from visfd_tpu.ops import kernels as K
    from visfd_tpu.ops.blur_pallas import blur3_pallas
    from visfd_tpu.ops.eigen_pallas import (hessian_principal_pallas,
                                            sym3_score_pallas)
    from visfd_tpu.ops.tv_pallas import tv_dense_stick_pallas

    n = cfg.volume
    hw = cfg.hw
    tv_sigma = hw / np.sqrt(2.0) + 1e-6
    sigma_b = 2.0
    hw_b = int(np.floor(sigma_b * 2.5))
    k1 = jnp.asarray(K.gauss_kernel_1d(sigma_b, hw_b))

    def step(v, k1):
        blur = blur3_pallas(v, (k1, k1, k1))
        sal, dvec = hessian_principal_pallas(
            blur, sigma_b, decreasing=True, formula="planar",
            want_v=True)
        vote, _ = tv_dense_stick_pallas(
            sal, dvec, tv_sigma, exponent=4,
            truncate_ratio=float(np.sqrt(2.0)), channel_major=True,
            nvec_channel_major=True)
        s, _ = sym3_score_pallas(vote, decreasing=True, formula="stick")
        return s

    def bench_block(bz, by):
        @jax.jit
        def gen():
            zz = jax.lax.broadcasted_iota(jnp.float32, (bz, by, n), 0)
            yy = jax.lax.broadcasted_iota(jnp.float32, (bz, by, n), 1)
            xx = jax.lax.broadcasted_iota(jnp.float32, (bz, by, n), 2)
            return jnp.sin(zz * 12.99 + yy * 78.2 + xx * 37.7)

        # iterate ON DEVICE (one dispatch covers all iterations): the
        # remote tunnel's ~0.2 s per-dispatch latency would otherwise
        # put a flat floor under the small-block rows and masquerade
        # as poor per-chip scaling
        @jax.jit
        def looped(x0, k1):
            def body(i, s):
                out = step(s, k1)
                return s + out * 1e-30
            return jax.lax.fori_loop(0, cfg.iters, body, x0)

        x = gen()
        float(x[0, 0, 0])
        out = looped(x, k1)
        float(out[0, 0, 0])          # warm / compile
        t0 = time.time()
        out = looped(x, k1)
        float(out[0, 0, 0])
        return (time.time() - t0) / cfg.iters

    rows = []
    for n_chips in (int(c) for c in cfg.chips.split(",")):
        nz_m, ny_m = near_square(n_chips)
        if n % nz_m or n % ny_m:
            print(f"skip {n_chips} chips: {n} % ({nz_m},{ny_m}) != 0",
                  file=sys.stderr)
            continue
        bz, by = n // nz_m, n // ny_m
        try:
            dt = bench_block(bz, by)
        except Exception as e:
            print(f"{n_chips} chips ({bz}x{by}x{n}): FAILED "
                  f"({str(e).splitlines()[0][:90]})", file=sys.stderr)
            continue
        # halo bytes per step, interior chip, both directions per axis
        z_faces = 2 if nz_m > 1 else 0
        y_faces = 2 if ny_m > 1 else 0
        ch_per_step = (hw_b * 1          # blur halo
                       + 1 * 1           # hessian halo
                       + hw * (1 + 3))   # TV: saliency + direction
        halo_bytes = 4 * ch_per_step * (z_faces * by * n
                                        + y_faces * bz * n)
        t_halo = halo_bytes / ICI_BW_PER_LINK
        eff_no = dt / (dt + t_halo)
        vox = bz * by * n
        rows.append({
            "chips": n_chips, "mesh": [nz_m, ny_m],
            "block": [bz, by, n],
            "compute_ms_per_chip": dt * 1e3,
            "mvox_per_s_per_chip": vox / dt / 1e6,
            "halo_mbytes_per_step": halo_bytes / 1e6,
            "halo_ms": t_halo * 1e3,
            "efficiency_no_overlap": eff_no,
            "efficiency_overlap": 1.0 if t_halo <= dt else dt / t_halo,
            "aggregate_gvox_per_s_no_overlap":
                n_chips * vox / (dt + t_halo) / 1e9,
        })
        print(f"{n_chips:3d} chips  mesh ({nz_m},{ny_m})  block "
              f"{bz}x{by}x{n}: {dt*1e3:8.1f} ms/chip, halo "
              f"{halo_bytes/1e6:7.1f} MB = {t_halo*1e3:6.2f} ms, "
              f"eff {100*eff_no:5.1f}% (no overlap)", file=sys.stderr)

    hdr = ("| chips | mesh | per-chip block | compute ms | halo MB | "
           "halo ms | eff (no overlap) | aggregate Gvox/s |")
    sep = "|---|---|---|---|---|---|---|---|"
    lines = [hdr, sep]
    for r in rows:
        lines.append(
            f"| {r['chips']} | {r['mesh'][0]}x{r['mesh'][1]} | "
            f"{r['block'][0]}x{r['block'][1]}x{r['block'][2]} | "
            f"{r['compute_ms_per_chip']:.1f} | "
            f"{r['halo_mbytes_per_step']:.1f} | {r['halo_ms']:.2f} | "
            f"{100 * r['efficiency_no_overlap']:.1f}% | "
            f"{r['aggregate_gvox_per_s_no_overlap']:.2f} |")
    print("\n".join(lines))

    if not rows:
        # keep any previously measured projection rather than
        # clobbering PERF.json with an empty table
        print("no rows measured; PERF.json left untouched",
              file=sys.stderr)
        return
    if os.path.exists(cfg.json_out):
        with open(cfg.json_out) as f:
            report = json.load(f)
    else:
        report = {}
    report["scaling_projection"] = {
        "volume": n, "hw": hw,
        "ici_bw_per_link_bytes_per_s": ICI_BW_PER_LINK,
        "assumptions": "single-chip measured fused kernels on per-chip "
                       "block shapes; interior-chip halo bytes over 1 "
                       "ICI link/axis; no DCN; no overlap vs full "
                       "overlap bounds",
        "rows": rows,
    }
    with open(cfg.json_out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"written": cfg.json_out}))


if __name__ == "__main__":
    main()
