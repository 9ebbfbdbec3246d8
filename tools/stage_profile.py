"""Locate the parallelism ceiling of the scaling job.

Runs the scaling-bench job once at the given parallelism with the Spark
event log enabled, then reports per stage: task count, stage wall,
sum/max of task durations, and effective parallelism (task-time / wall).
Stages whose task count or effective parallelism is far below the core
count are the scaling bottleneck; inter-stage gaps expose driver-side
serialization.

Usage: python tools/stage_profile.py [cores] [rows]
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN = """
import sys, os, json
sys.path.insert(0, {root!r})
os.makedirs("/dev/shm/spark-scaling-tmp", exist_ok=True)
os.makedirs({evdir!r}, exist_ok=True)
from traval_spark.session import get_spark
spark = get_spark("stage-profile", master="local[{cores}]",
                  shuffle_partitions={cores} * 3,
                  extra_conf={{
                      "spark.local.dir": "/dev/shm/spark-scaling-tmp",
                      "spark.eventLog.enabled": "true",
                      "spark.eventLog.dir": "file://{evdir}",
                      "spark.eventLog.compress": "false",
                      "spark.eventLog.rolling.enabled": "false",
                  }})
spark.sparkContext.setLogLevel("ERROR")
from traval_spark.pipeline import clean_sequences, default_ruleset
from traval_spark.rollup import build_cascade
seqs = spark.read.parquet({inp!r})
seqs.count()  # warm page cache; no .cache() — parquet prunes to 3 of 5 cols

def run():
    cleaned = clean_sequences(seqs, default_ruleset())
    df = build_cascade(cleaned, salted=True, n_salt=16)["1d"]
    df.write.format("noop").mode("overwrite").save()
run()  # warmup
spark.sparkContext.setJobGroup("measured", "measured run")
run()
spark.stop()
"""


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 64_000_000
    inp = f"/tmp/traval_bench_input_r{rows}_s42"
    evdir = f"/tmp/stage_profile_ev_{cores}"
    import shutil
    if os.path.isdir(evdir):
        shutil.rmtree(evdir)
    code = RUN.format(root=ROOT, cores=cores, inp=inp, evdir=evdir)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True)
    if r.returncode != 0:
        print(r.stderr[-3000:])
        sys.exit(1)

    cands = [p for p in glob.glob(f"{evdir}/**/*", recursive=True)
             if os.path.isfile(p) and "appstatus" not in p]
    logf = max(cands, key=os.path.getsize)
    stages: dict[int, dict] = {}
    measured_jobs: set[int] = set()
    job_stages: dict[int, list[int]] = {}
    tasks: dict[int, list[float]] = {}
    with open(logf) as f:
        for line in f:
            ev = json.loads(line)
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jid = ev["Job ID"]
                job_stages[jid] = [s["Stage ID"] for s in ev["Stage Infos"]]
                if props.get("spark.jobGroup.id") == "measured":
                    measured_jobs.add(jid)
            elif t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:60],
                    "ntask": si["Number of Tasks"],
                    "wall": (si.get("Completion Time", 0)
                             - si.get("Submission Time", 0)) / 1e3,
                }
            elif t == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev["Task Info"]
                tm = ev.get("Task Metrics") or {}
                sr = tm.get("Shuffle Read Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                im = tm.get("Input Metrics") or {}
                tasks.setdefault(sid, []).append({
                    "dur": (ti["Finish Time"] - ti["Launch Time"]) / 1e3,
                    "gc": tm.get("JVM GC Time", 0) / 1e3,
                    "cpu": tm.get("Executor CPU Time", 0) / 1e9,
                    "srb": (sr.get("Local Bytes Read", 0)
                            + sr.get("Remote Bytes Read", 0)) / 1e6,
                    "swb": sw.get("Shuffle Bytes Written", 0) / 1e6,
                    "inb": im.get("Bytes Read", 0) / 1e6,
                })

    keep = {s for j in measured_jobs for s in job_stages.get(j, [])}
    rows_out = []
    for sid in sorted(keep):
        if sid not in stages:
            continue  # skipped stage (reused shuffle output)
        st = stages[sid]
        ts = tasks.get(sid, [])
        durs = [t["dur"] for t in ts]
        tsum, tmax = sum(durs), max(durs, default=0.0)
        gc = sum(t["gc"] for t in ts)
        cpu = sum(t["cpu"] for t in ts)
        srb = sum(t["srb"] for t in ts)
        swb = sum(t["swb"] for t in ts)
        inb = sum(t["inb"] for t in ts)
        rows_out.append((sid, st["ntask"], st["wall"], tsum, tmax,
                         tsum / st["wall"] if st["wall"] > 0 else 0.0,
                         gc, cpu, srb, swb, inb, st["name"]))
    total_wall = sum(r[2] for r in rows_out)
    print(f"cores={cores} measured stages={len(rows_out)} "
          f"stage-wall total={total_wall:.1f}s")
    print(f"{'sid':>4} {'ntask':>6} {'wall':>7} {'tsum':>8} {'cpu':>8} "
          f"{'gc':>6} {'tmax':>7} {'par':>5} {'inMB':>7} {'srMB':>7} "
          f"{'swMB':>7}")
    for (sid, ntask, wall, tsum, tmax, par, gc, cpu, srb, swb, inb,
         name) in rows_out:
        flag = " <== ceiling" if wall > 0.05 * total_wall and (
            par < cores * 0.5 or ntask < cores) else ""
        print(f"{sid:>4} {ntask:>6} {wall:>7.2f} {tsum:>8.1f} {cpu:>8.1f} "
              f"{gc:>6.1f} {tmax:>7.2f} {par:>5.1f} {inb:>7.0f} {srb:>7.0f} "
              f"{swb:>7.0f}{flag}")


if __name__ == "__main__":
    main()
