"""Append extra probe-gated runs of ONE cluster size to the scaling pool.

Same machinery as bench_scaling.main (same zip, corpus, gating, probe
annotations, jsonl schema) — exists because best-of-pool needs a quiet
window per SIZE, and on a day when (say) the 4-core windows keep landing
noisy it is wasteful to pay an 8-minute 1-core leg for every extra
4-core sample.  Re-pool afterwards with `bench_scaling.py N 0 small big`
(zero new runs).

Usage: python tools/pool_extra_runs.py <n_images> <cores> <repeats>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from bench_scaling import REPO, code_rev, corpus, make_pyfiles_zip, run_once


def main() -> None:
    n_images = int(sys.argv[1])
    cores = int(sys.argv[2])
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    zpath = make_pyfiles_zip()
    cdir = corpus(n_images)
    rev = code_rev()
    log_path = os.path.join(REPO, "bench_out", "scaling_runs.jsonl")

    sys.path.insert(0, REPO)
    import bench as bench_mod

    for r in range(repeats):
        plog: list[float] = []
        iolog: list[float] = []
        lalog: list[float] = []
        bench_mod.wait_for_quiet_window(plog, iolog, lalog)
        res = run_once(zpath, cdir, cores)
        res["_probe_pre"] = [plog[-1], iolog[-1], lalog[-1]]
        res["_probe_post"] = [
            round(bench_mod.host_probe(), 3),
            round(bench_mod.io_probe(), 3),
        ]
        res["_probe_noisy"] = bench_mod.probes_noisy(
            *res["_probe_post"], bench_mod.probe_quiet_ref()
        )
        print(f"# local[{cores}] extra run {r}: {res}", file=sys.stderr)
        res["_rev"] = rev
        res["_n_images"] = n_images
        res["_ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        with open(log_path, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
