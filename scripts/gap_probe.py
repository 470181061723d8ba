#!/usr/bin/env python3
"""Driver-gap attribution for the flagship job.

Runs profile(mode="approx") (or the full flagship with --full) with the
Spark event log enabled, then parses the log into a timeline of
jobs/stages: for each job, submit->first-task-launch lag, task-time
span, and the *gaps between jobs* (pure driver-side time: plan build,
Catalyst, AQE loops, collect handling).  Prints one JSON line.

Usage: python scripts/gap_probe.py <cpus> <input_path> [--full]
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus, path = sys.argv[1], sys.argv[2]
    full = "--full" in sys.argv
    logdir = "/tmp/dp_eventlog"
    os.makedirs(logdir, exist_ok=True)
    for f in glob.glob(f"{logdir}/*"):
        shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)

    from datapatterns_spark.session import get_spark

    n = int(cpus)
    spark = get_spark(
        "gap-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=str(max(n * 2, 8)),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": logdir,
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.sql.files.openCostInBytes": "1m",
            "spark.driver.extraJavaOptions": (
                f"-XX:ActiveProcessorCount={n + 2} -XX:+UseParallelGC "
                f"-XX:ParallelGCThreads={n}"
            ),
        },
    )
    spark.range(10).count()

    from bench import flagship_profile_validate, prepare_transcripts
    from datapatterns_spark.operators.profile import profile

    warm = prepare_transcripts(
        spark, int(os.environ.get("SPARK_GRAFT_WARM_CONVS", "250000"))
    )
    df_warm = spark.read.parquet(warm)
    if full:
        flagship_profile_validate(spark, warm)
    else:
        profile(df_warm.drop("part"), mode="approx").collect()

    df = spark.read.parquet(path)
    t_start = time.time() * 1000
    t0 = time.time()
    if full:
        flagship_profile_validate(spark, path)
    else:
        profile(df.drop("part"), mode="approx").collect()
    wall = time.time() - t0
    t_end = time.time() * 1000
    spark.stop()

    # ---- parse the event log ----
    cand = sorted(glob.glob(f"{logdir}/*"))
    logfs = []
    for c in cand:
        if os.path.isdir(c):  # Spark 4 rolling v2 layout
            logfs.extend(sorted(glob.glob(f"{c}/events_*")))
        else:
            logfs.append(c)

    def lines():
        for logf in logfs:
            opener = gzip.open if logf.endswith(".gz") else open
            with opener(logf, "rt") as fh:
                yield from fh

    jobs = {}  # id -> dict
    stages = {}
    if True:
        for line in lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "submit": ev["Submission Time"],
                    "end": None,
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "group": (ev.get("Properties") or {}).get("spark.jobGroup.id", ""),
                    "desc": ((ev.get("Properties") or {}).get(
                        "spark.job.description", ""))[:80],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "submit": si.get("Submission Time"),
                    "complete": si.get("Completion Time"),
                    "tasks": si.get("Number of Tasks"),
                    "name": si.get("Stage Name", "")[:60],
                }

    measured = sorted(
        (j for j in jobs.values() if j["end"] and j["submit"] >= t_start - 200),
        key=lambda j: j["submit"],
    )
    if not measured:
        print(json.dumps({"error": "no measured jobs"}))
        return
    t_first = measured[0]["submit"]
    spans = []
    for j in measured:
        spans.append((j["submit"], j["end"]))
    spans.sort()
    # merge overlapping job spans; gaps between merged spans = driver-only
    merged = [list(spans[0])]
    for s, e in spans[1:]:
        if s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    in_jobs = sum(e - s for s, e in merged) / 1000
    gaps = sum(
        (merged[i + 1][0] - merged[i][1]) for i in range(len(merged) - 1)
    ) / 1000
    pre = (t_first - (t_end - wall * 1000)) / 1000  # before first job submit
    tail = (t_end - merged[-1][1]) / 1000
    out = {
        "cpus": n,
        "wall_s": round(wall, 2),
        "in_jobs_s": round(in_jobs, 2),
        "driver_gaps_s": round(gaps, 2),
        "pre_first_job_s": round(pre, 2),
        "post_last_job_s": round(tail, 2),
        "n_jobs": len(measured),
        "jobs": [
            {
                "dur_s": round((j["end"] - j["submit"]) / 1000, 2),
                "t0_s": round((j["submit"] - t_first) / 1000, 2),
                "desc": j["desc"],
            }
            for j in measured
        ],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
