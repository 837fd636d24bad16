"""Measure the C++ reference END-TO-END (read -> membrane -> TV ->
connect -> write) to anchor the perf_report ``cli_e2e_*`` rows.

The round-4 verdict (#4) noted BENCH only tracked the membrane step;
the >=10x target in BASELINE.md is end-to-end.  This script times the
compiled reference binary (build: ``cp -r /root/reference
/tmp/visfd_build && cd /tmp/visfd_build && . ./setup_gcc.sh && make``)
on the same synthetic volume and flag set as perf_report's e2e stage:

    filter_mrc -w 1 -bin 1 -in vol.rec -out out.rec \
        -membrane minima 3.4641016 -tv 2.2 -tv-angle-exponent 4 \
        [-connect 1e-30]

Phases are separated by differencing (e2e run minus no-connect run ~=
the serial connect flood), because the reference prints no timings.
The OpenMP voxel loops scale ~linearly with threads
(filter3d.hpp:172); the connect flood (connect.hpp:431-809) is
SERIAL, so the 16-thread extrapolation is membrane_part/8 +
connect_part when measured on 2 threads.

Results are written into baseline_cpp.json under "e2e".
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BIN = "/tmp/visfd_build/bin/filter_mrc/filter_mrc"


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="128,384")
    ap.add_argument("--threads", type=int,
                    default=os.cpu_count() or 1)
    ap.add_argument("--membrane-rec",
                    default="/tmp/visfd_e2e_membrane.rec")
    cfg = ap.parse_args()

    from visfd_tpu.io import mrc

    if not os.path.exists(BIN):
        print(f"reference binary not built at {BIN}; see docstring",
              file=sys.stderr)
        return 1

    env = dict(os.environ, OMP_NUM_THREADS=str(cfg.threads))
    out = {}
    specs = [(int(s), None) for s in cfg.sizes.split(",")]
    if cfg.membrane_rec and os.path.exists(cfg.membrane_rec):
        # the membrane-phantom volume perf_report's e2e stage wrote:
        # the realistic workload (coherent saliency, small cluster
        # count) on the IDENTICAL input our CLI was timed on
        n_m = mrc.read_mrc(cfg.membrane_rec).data.shape[0]
        specs.append((n_m, cfg.membrane_rec))
    for n, rec in specs:
        td = f"/tmp/ref_e2e_{n}" + ("_membrane" if rec else "")
        os.makedirs(td, exist_ok=True)
        if rec is None:
            vol = np.random.default_rng(0).normal(
                size=(n, n, n)).astype(np.float32)
            mrc.write_mrc(os.path.join(td, "vol.rec"), vol)
            in_rec = os.path.join(td, "vol.rec")
        else:
            in_rec = rec
        base = [BIN, "-w", "1", "-bin", "1",
                "-in", in_rec,
                "-out", os.path.join(td, "out.rec"),
                "-membrane", "minima", "3.4641016",
                "-tv", "2.2", "-tv-angle-exponent", "4"]

        def run(args):
            t0 = time.time()
            r = subprocess.run(args, env=env, capture_output=True,
                               text=True)
            dt = time.time() - t0
            assert r.returncode == 0, r.stderr[-2000:]
            return dt

        dt_mem = run(base)
        dt_e2e = run(base + ["-connect", "1e-30"])
        connect_part = max(0.0, dt_e2e - dt_mem)
        dt16 = dt_mem / (16 / cfg.threads) + connect_part
        out[str(n) + ("_membrane" if rec else "")] = {
            "threads": cfg.threads,
            "membrane_tv_s": dt_mem,
            "e2e_s": dt_e2e,
            "connect_part_s": connect_part,
            "e2e_16thread_extrapolated_s": dt16,
            "e2e_voxels_per_s_16thread": n ** 3 / dt16,
        }
        print(f"{n}^3: membrane+tv {dt_mem:.1f}s, e2e {dt_e2e:.1f}s "
              f"({cfg.threads} threads); 16-thread extrapolation "
              f"{dt16:.1f}s = {n**3/dt16/1e6:.2f} Mvox/s",
              file=sys.stderr)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "baseline_cpp.json")
    with open(path) as f:
        base_json = json.load(f)
    base_json["e2e"] = out
    with open(path, "w") as f:
        json.dump(base_json, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
