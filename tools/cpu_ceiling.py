"""Measure this sandbox's hardware scaling ceiling, independent of Spark.

Runs N identical pure-CPU processes (tight integer loop: no memory
traffic, no I/O, no synchronization — embarrassingly parallel by
construction) and reports throughput at each parallelism level plus the
pairwise scaling efficiency. On ideal hardware every pair scales at
~1.0; any shortfall is the host (vCPU oversubscription / neighbor
steal), not the job. The Spark scaling numbers in BENCH/BASELINE.md are
read against this ceiling: an engine cannot out-scale the box it runs
on.

Usage: python tools/cpu_ceiling.py [levels ...]  (default: 2 8 32)
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

BURN = (
    "import time\n"
    "t0=time.process_time()\n"
    "x=0\n"
    "for i in range(40_000_000): x+=i*i\n"
    "print(time.process_time()-t0)"
)

#: memory-bandwidth-bound twin: each process sweeps a 256 MB array 8x
#: (DRAM-resident, way past LLC). Sort/shuffle-heavy Spark stages are
#: bound by THIS ceiling, not the integer one — a single socket's memory
#: controllers are shared by all 32 cores, while a real N->4N cluster
#: adds a socket's worth of bandwidth with every node.
BURN_MEM = (
    "import time, numpy as np\n"
    "a = np.zeros(32 * 1024 * 1024, dtype=np.int64)\n"
    "t0 = time.process_time()\n"
    "for _ in range(8): a += 1\n"
    "print(time.process_time() - t0)"
)


def run(nproc: int, code: str = BURN) -> tuple[float, float]:
    t0 = time.time()
    ps = [
        subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, text=True)
        for _ in range(nproc)
    ]
    cpus = [float(p.communicate()[0]) for p in ps]
    wall = time.time() - t0
    return wall, sum(cpus) / len(cpus)


def measure(levels: list[int], trials: int = 3, code: str = BURN) -> dict:
    out: dict = {"levels": {}}
    for n in levels:
        wall, cpu = min(run(n, code) for _ in range(trials))
        out["levels"][n] = {
            "wall_sec": round(wall, 2),
            "per_proc_cpu_sec": round(cpu, 2),
            "jobs_per_sec": round(n / wall, 3),
        }
    lv = sorted(out["levels"])
    out["pair_efficiency"] = {
        f"{a}->{b}": round(
            (out["levels"][b]["jobs_per_sec"]
             / out["levels"][a]["jobs_per_sec"]) / (b / a), 3)
        for a, b in zip(lv, lv[1:])
    }
    if len(lv) >= 2:
        a, b = lv[0], lv[-1]
        out["pair_efficiency"][f"{a}->{b}"] = round(
            (out["levels"][b]["jobs_per_sec"]
             / out["levels"][a]["jobs_per_sec"]) / (b / a), 3)
    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    kind = BURN
    if args and args[0] == "mem":
        kind, args = BURN_MEM, args[1:]
    levels = [int(x) for x in args] or [2, 8, 32]
    print(json.dumps(measure(levels, code=kind)))
