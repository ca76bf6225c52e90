"""Host parallel-scaling ceiling — pure-numpy calibration, no Spark.

The north rule asks for >= 0.8 throughput scaling efficiency between two
cluster sizes.  This sandbox has no cluster; the stand-in is local[2] vs
local[8] on ONE machine, where every "executor" shares one memory bus and
one OS scheduler.  This tool measures what the MACHINE itself can deliver
for embarrassingly parallel work (no Spark, no shuffle, no JVM): P
independent processes each run an identical fixed-work numpy kernel; with
perfect hardware scaling, wall time is flat in P and efficiency
(thr_P / thr_1) / P == 1.0.

Two kernels bracket the engine's stage mix:
  compute  — murmur fmix64 chain over an L2-resident array (CPU-bound,
             minimal memory traffic): the upper bound.
  bandwidth — the same chain over a ~512 MB working set (DRAM-bound,
             mirrors the MinHash/banding stages' access pattern): the
             realistic bound for this engine's hot stages.

Best-of-N per (kernel, P): this host shows multi-second page-fault stalls
(see BENCH/BASELINE.md); min is the stall-free estimator.

Writes bench_out/host_ceiling.json; tools/bench_scaling.py folds the
numbers into BENCH/BASELINE.md so the efficiency target has a measured
denominator.

Usage: python tools/host_ceiling.py [repeats] [p_small] [p_big]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_C3 = np.int64(np.uint64(0xFF51AFD7ED558CCD).astype(np.int64))


def _worker(
    n_elems: int, iters: int, barrier: "mp.Barrier", q: "mp.Queue"
) -> None:
    """Two timed phases, reported separately:
      alloc — allocate + first-touch the working set (the page-fault path;
              this sandbox serializes concurrent faulting pathologically)
      mix   — fmix64-style streaming mix over the pre-touched buffers (the
              no-allocation discipline of functions/minhash.py's hot loop)
    A barrier between them makes the mix phase measure STEADY-STATE
    concurrent bandwidth, not allocation contention."""
    t0 = time.time()
    buf = np.arange(n_elems, dtype=np.int64)
    tmp = np.empty_like(buf)
    tmp[:] = 0  # first-touch
    alloc_sec = time.time() - t0
    bu, tu = buf.view(np.uint64), tmp.view(np.uint64)
    barrier.wait()
    t1 = time.time()
    with np.errstate(over="ignore"):
        for _ in range(iters):
            np.right_shift(bu, np.uint64(33), out=tu)
            np.bitwise_xor(buf, tmp, out=buf)
            np.multiply(buf, _C3, out=buf)
    q.put((alloc_sec, time.time() - t1))


def run_procs(p: int, n_elems: int, iters: int) -> tuple[float, float]:
    """(max alloc sec, max mix sec) across p concurrent processes."""
    q: "mp.Queue" = mp.Queue()
    barrier = mp.Barrier(p)
    procs = [
        mp.Process(target=_worker, args=(n_elems, iters, barrier, q))
        for _ in range(p)
    ]
    for pr in procs:
        pr.start()
    res = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    return max(r[0] for r in res), max(r[1] for r in res)


KERNELS = {
    # ~256 KB working set (L2-resident), many passes: CPU-bound
    "compute": dict(n_elems=32_768, iters=40_000),
    # ~256 MB working set, few passes: DRAM-bandwidth-bound (sized down —
    # this sandbox's first-touch page faults make larger allocations
    # dominate the measurement; see memory: sandbox-performance-quirks)
    "bandwidth": dict(n_elems=32_000_000, iters=12),
}


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    p_small = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    p_big = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    out: dict = {"p_small": p_small, "p_big": p_big, "repeats": repeats,
                 "kernels": {}}
    for name, kw in KERNELS.items():
        walls = {p: {"alloc": [], "mix": []} for p in (p_small, p_big)}
        for _ in range(repeats):
            for p in (p_small, p_big):
                a, m = run_procs(p, **kw)
                walls[p]["alloc"].append(round(a, 6))
                walls[p]["mix"].append(round(m, 6))
        rec = {"walls": walls}
        for phase in ("alloc", "mix"):
            best_s = min(walls[p_small][phase])
            best_b = min(walls[p_big][phase])
            # throughput = work-units/sec; each process does one work-unit
            eff = ((p_big / best_b) / (p_small / best_s)) / (p_big / p_small)
            rec[phase] = {
                "best_wall_small": best_s,
                "best_wall_big": best_b,
                "efficiency": round(eff, 3),
            }
        out["kernels"][name] = rec
        print(
            f"# {name}: mix P={p_small} {rec['mix']['best_wall_small']}s vs "
            f"P={p_big} {rec['mix']['best_wall_big']}s -> eff "
            f"{rec['mix']['efficiency']} (alloc eff "
            f"{rec['alloc']['efficiency']})",
            file=sys.stderr,
        )

    os.makedirs(os.path.join(REPO, "bench_out"), exist_ok=True)
    out["_ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    path = os.path.join(REPO, "bench_out", "host_ceiling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
