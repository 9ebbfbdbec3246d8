"""Two-parallelism scaling evidence for the north rule.

Runs the full rollup job (parquet tokenized-sequence table -> traval rule
cleaning -> explicit salted cascade raw->1m->1h->1d) on IDENTICAL input
at local[N] and local[4N], interleaved fresh-JVM trials, and reports:

- wall seconds per trial (best-of used for throughput: this sandbox is a
  shared VM with intermittent neighbor load causing 2-4x wall swings on
  identical plans while guest CPU sits idle);
- JVM CPU seconds per trial (utime+stime from /proc), which is immune to
  neighbor wall noise: equal CPU across configs proves the total work is
  constant, and cpu/wall gives the effective parallelism each config
  actually achieved.

Shuffle dirs on tmpfs + page-cache-warmed parquet input: this VM has
ONE fixed-bandwidth disk; on a real N->4N cluster storage/shuffle
bandwidth scales with nodes, so charging the single disk to the engine
would measure the sandbox, not the plan.

Usage: python tools/scaling_bench.py [rows] [n_small] [n_big] [trials]
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_TEMPLATE = """
import sys, time, json, os
sys.path.insert(0, {root!r})
os.makedirs("/dev/shm/spark-scaling-tmp", exist_ok=True)
import pyspark
os.environ.setdefault("SPARK_HOME", pyspark.__path__[0])
from traval_spark.session import get_spark
spark = get_spark("scaling", master={master!r},
                  shuffle_partitions={cores} * 3,
                  extra_conf={extra!r})
spark.sparkContext.setLogLevel("ERROR")
from traval_spark.pipeline import clean_sequences, default_ruleset
from traval_spark.rollup import build_cascade
seqs = spark.read.parquet({inp!r})
seqs.count()  # warm the OS page cache + parquet footers
# NO .cache(): the job needs 3 of 5 columns and parquet column
# pruning at the scan is the honest 100 TB read path; a full-width
# deserialized cache costs more memory bandwidth than it saves

CLK = os.sysconf("SC_CLK_TCK")
def tree_cpu():
    # utime+stime+cutime+cstime summed over THIS process and every live
    # descendant: covers the driver JVM and, in local-cluster mode, the
    # separate worker/executor JVMs and python workers. cutime/cstime
    # (stat fields 16/17) fold in descendants REAPED between samples —
    # without them a short-lived python worker's CPU would vanish from
    # the delta and understate the CPU-work-constancy metric. Live
    # children are never double-counted: cutime only covers waited-on
    # (dead) children.
    me = os.getpid()
    procs = {{}}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{{d}}/stat") as f:
                head, tail = f.read().rsplit(")", 1)
            parts = tail.split()
            procs[int(d)] = (int(parts[1]),
                             (int(parts[11]) + int(parts[12])
                              + int(parts[13]) + int(parts[14])) / CLK)
        except OSError:
            continue
    total, frontier = 0.0, {{me}}
    seen = set()
    while frontier:
        nxt = set()
        for pid, (ppid, cpu) in procs.items():
            if ppid in frontier and pid not in seen:
                nxt.add(pid); seen.add(pid); total += cpu
        frontier = nxt
    return total + procs[me][1]

def run():
    cleaned = clean_sequences(seqs, default_ruleset())
    df = build_cascade(cleaned, salted=True, n_salt=16)["1d"]
    df.write.format("noop").mode("overwrite").save()
run()  # warmup: codegen + cache touch
t0, c0 = time.time(), tree_cpu()
run()
wall, cpu = time.time() - t0, tree_cpu() - c0
print("RESULT " + json.dumps({{"wall": wall, "cpu": cpu}}))
"""

#: executor-mode layout: real separate executor JVMs (local-cluster),
#: 8 cores and a fixed heap each — growing the cluster N -> 4N adds
#: executors (the north rule's own wording), it does NOT grow a shared heap
EXEC_CORES = 8
EXEC_MEM_MB = 10240


def run_once(cores: int, inp: str, mode: str = "threads") -> dict:
    if mode == "executors":
        n_exec = cores // EXEC_CORES
        master = f"local-cluster[{n_exec},{EXEC_CORES},{EXEC_MEM_MB}]"
        extra = {
            "spark.local.dir": "/dev/shm/spark-scaling-tmp",
            "spark.executor.memory": f"{EXEC_MEM_MB - 2048}m",
        }
    else:
        master = f"local[{cores}]"
        extra = {"spark.local.dir": "/dev/shm/spark-scaling-tmp"}
    code = RUN_TEMPLATE.format(
        root=ROOT, cores=cores, inp=inp, master=master, extra=extra
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no result at {master}:\n{out.stderr[-2000:]}")


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    # "threads": local[N] (one shared JVM heap — pessimistic at 32);
    # "executors": local-cluster[N/8, 8, mem] — REAL separate executor
    # JVMs, the faithful model of the north rule's N -> 4N executors
    mode = sys.argv[5] if len(sys.argv) > 5 else "threads"
    if mode == "executors" and (n_small % EXEC_CORES or n_big % EXEC_CORES):
        raise SystemExit(f"executor mode needs multiples of {EXEC_CORES} cores")

    inp = f"/tmp/traval_bench_input_r{rows}_s42"
    if not os.path.exists(f"{inp}/_SUCCESS"):
        sys.path.insert(0, ROOT)
        from traval_spark.session import get_spark
        from traval_spark.sources.synth import synth_sequences

        spark = get_spark("gen", master=f"local[{n_big}]",
                          shuffle_partitions=n_big)
        spark.sparkContext.setLogLevel("ERROR")
        # max_tok=16: tokens are pruned by the measured job; keeps
        # generation minutes, not hours, with schema/skew intact
        synth_sequences(spark, rows, partitions=n_big * 2,
                        max_tok=16).write.mode("overwrite").parquet(inp)
        spark.stop()

    small, big = [], []
    for i in range(trials):  # interleave configs across time windows,
        # alternating which config goes first so neither systematically
        # lands in the calmer/noisier half of each time window
        order = (
            [(n_small, small), (n_big, big)]
            if i % 2 == 0
            else [(n_big, big), (n_small, small)]
        )
        for cores, bucket in order:
            bucket.append(run_once(cores, inp, mode))
            print(
                f"trial {i} {mode}[{cores}]: wall={bucket[-1]['wall']:.1f}s "
                f"cpu={bucket[-1]['cpu']:.0f}s",
                file=sys.stderr,
            )

    best_small = min(t["wall"] for t in small)
    best_big = min(t["wall"] for t in big)
    thr_small = rows / best_small
    thr_big = rows / best_big
    eff = (thr_big / thr_small) / (n_big / n_small)
    # CPU-seconds are immune to neighbor wall-clock noise: the min over
    # trials is the cleanest estimate of the work the engine actually
    # does at each layout. work_ratio ~1.0 proves added cores change the
    # schedule, not the work (no serialization point, no duplicated
    # compute) — the north rule's scaling criterion in a form this
    # shared VM can measure faithfully.
    cpu_small = min(t["cpu"] for t in small)
    cpu_big = min(t["cpu"] for t in big)
    work_ratio = cpu_big / cpu_small
    result = {
        "rows": rows,
        "mode": mode,
        "cores_small": n_small,
        "cores_big": n_big,
        "wall_small_sec": [round(t["wall"], 2) for t in small],
        "wall_big_sec": [round(t["wall"], 2) for t in big],
        "cpu_small_sec": [round(t["cpu"], 1) for t in small],
        "cpu_big_sec": [round(t["cpu"], 1) for t in big],
        "best_small_sec": round(best_small, 2),
        "best_big_sec": round(best_big, 2),
        "points_per_sec_small": round(thr_small),
        "points_per_sec_big": round(thr_big),
        "scaling_efficiency": round(eff, 3),
        "cpu_work_small_sec": round(cpu_small, 1),
        "cpu_work_big_sec": round(cpu_big, 1),
        "cpu_work_ratio": round(work_ratio, 3),
        "parallelism_small": round(
            min(zip((t["wall"] for t in small), (t["cpu"] for t in small)))[1]
            / best_small, 2),
        "parallelism_big": round(
            min(zip((t["wall"] for t in big), (t["cpu"] for t in big)))[1]
            / best_big, 2),
    }
    print(json.dumps(result))
    os.makedirs(f"{ROOT}/BENCH", exist_ok=True)
    # preserve any manually-curated sections (e.g. the larger-N
    # corroboration campaign) appended after the generated report
    tail = ""
    path = f"{ROOT}/BENCH/BASELINE.md"
    if os.path.exists(path):
        prev = open(path).read()
        marker = "\n## "
        if marker in prev:
            tail = prev[prev.index(marker):]
    with open(path, "w") as f:
        f.write(_report(result) + tail)


def _report(r: dict) -> str:
    verdict = "MET" if r["scaling_efficiency"] >= 0.8 else "NOT met"
    if r.get("mode") == "executors":
        cs = f"local-cluster[{r['cores_small'] // EXEC_CORES}x{EXEC_CORES}c]"
        cb = f"local-cluster[{r['cores_big'] // EXEC_CORES}x{EXEC_CORES}c]"
        layout = (f"{cs} vs {cb} — REAL separate executor JVMs "
                  f"({EXEC_CORES} cores, {EXEC_MEM_MB - 2048}m heap each), "
                  "the faithful model of N -> 4N executors")
    else:
        cs = f"local[{r['cores_small']}]"
        cb = f"local[{r['cores_big']}]"
        layout = f"{cs} vs {cb} (single shared JVM heap)"
    return f"""# BENCH baseline — measured scaling evidence

North-rule criterion (BASELINE.json): throughput scaling efficiency
>= 0.8 between N and 4N executors. Sandbox proxy: the full rollup job
(pruned parquet scan -> traval rule cleaning [hardmax +
chunked spike + via-join n-sigma + combine] -> explicit salted two-phase
rollup cascade raw->1m->1h->1d) on IDENTICAL input at
{layout}, fresh JVMs per
trial, configs interleaved in time.

| config | wall per trial (sec) | CPU per trial (sec, all JVMs) | best wall | points/sec |
|---|---|---|---|---|
| {cs} | {r['wall_small_sec']} | {r['cpu_small_sec']} | {r['best_small_sec']} | {r['points_per_sec_small']:,} |
| {cb}   | {r['wall_big_sec']} | {r['cpu_big_sec']} | {r['best_big_sec']} | {r['points_per_sec_big']:,} |

**Criterion {verdict}:
{r['scaling_efficiency']} vs the >= 0.8 bar.**

- input rows: {r['rows']:,} (deterministic synth; source_00 holds ~50% of
  rows — the skew case the salting + chunked windows exist for)
- **throughput scaling efficiency ({r['cores_small']} -> {r['cores_big']}
  cores, best-of-trials wall): {r['scaling_efficiency']}**
- **work constancy (min CPU-sec across trials, noise-immune):
  {r['cpu_work_small_sec']}s at {cs} vs
  {r['cpu_work_big_sec']}s at {cb} — ratio
  {r['cpu_work_ratio']}** (1.0 = the {r['cores_big'] // r['cores_small']}x
  layout does identical work; no serialization point, no duplicated
  compute, CPU-sec per point is flat across layouts)
- effective parallelism in the best trial (cpu/wall):
  {r['parallelism_small']}x at {cs},
  {r['parallelism_big']}x at {cb}

Measurement caveats (shared-VM sandbox)
- Wall clock on this box swings 2-4x between identical runs (neighbor
  load; guest steal reads ~0, CPUs idle during stalls). Best-of-N
  interleaved trials is the faithful engine-cost estimate; per-trial CPU
  seconds (immune to neighbor wall noise) are listed to show total work
  is constant across configs — added cores change the layout, not the
  work.
- Input parquet warm in the OS page cache + shuffle on tmpfs: a single fixed-bandwidth virtio disk
  does not model an N->4N cluster whose storage/shuffle bandwidth scales
  with nodes.
- Skew handling is what makes the hot key scale at all: without the
  chunked windows + salted two-phase aggregation, source_00 pins one
  task and added cores idle (see tests/test_rules.py::
  test_chunked_equals_unchunked and test_rollup.py::
  test_salted_rollup_equals_unsalted for exactness proofs).
"""


if __name__ == "__main__":
    main()
