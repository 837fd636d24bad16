"""Measure the C++ reference's membrane+TV pipeline wall-clock to set
the bench.py baseline.

Procedure (run on the benchmark host):

1. Build the reference:
     cp -r /root/reference /tmp/visfd_build
     cd /tmp/visfd_build && source setup_gcc.sh && make   # -O3 -fopenmp
2. Generate the same synthetic volume bench.py uses and time the
   matching flagship pipeline (sigma = 2 voxels, tv_sigma = 2 voxels,
   angle exponent 4, no auto-binning):
     filter_mrc -w 1 -bin 1 -in vol.mrc -out out.mrc \
         -membrane minima 3.4641016 -tv 1 -tv-angle-exponent 4
3. Record voxels/s into baseline_cpp.json. If the host has fewer
   cores than the 16-thread target, extrapolate linearly (the
   reference's hot loops are embarrassingly parallel OpenMP-for
   loops over voxels, filter3d.hpp:172 / feature.hpp:1998).

Measured 2026-08-17 on the round-1 build host (2 cores):
  - default (-tv-best 0.05, 5% salient): 128^3 in 1.490 s  (1.407e6 vox/s)
  - dense  (-tv-best 1.0):               128^3 in 1.923 s  (1.091e6 vox/s)
  - 16-thread extrapolation (x8): sparse 1.126e7, dense 8.72e6 vox/s

bench.py compares its DENSE pipeline throughput against the
reference's DEFAULT (sparse, best-case) 16-thread number -- the
conservative comparison.
"""

import json
import os

BASELINE = {
    "voxels_per_s": 1.126e7,
    "config": "filter_mrc -membrane minima 3.4641016 -tv 1 "
              "-tv-angle-exponent 4 (default -tv-best 0.05), 128^3, "
              "16-thread extrapolation from 2-core measurement "
              "(2.84e6 vox/s at 2 threads x 8)",
    "measured_threads": 2,
    "measured_voxels_per_s_2threads": 1.407e6,
    "dense_voxels_per_s_2threads": 1.091e6,
}

if __name__ == "__main__":
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "baseline_cpp.json")
    with open(path, "w") as f:
        json.dump(BASELINE, f, indent=2)
    print(json.dumps(BASELINE))
