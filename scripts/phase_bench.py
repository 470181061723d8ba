#!/usr/bin/env python3
"""Per-phase timing of the flagship profile+validate job.

Usage: python scripts/phase_bench.py <cpus> <input_path>

Times each constituent phase of the flagship separately so scaling
regressions can be attributed (read, profile pass 1, pass 2, low-card
histogram, checks row+group pass, stat pass).  Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus, path = sys.argv[1], sys.argv[2]
    from bench import N_PARTS, build_session

    from datapatterns_spark.operators import constraints as C
    from datapatterns_spark.operators.profile import profile
    from datapatterns_spark.sources.transcripts import transcript_check_suite

    spark = build_session(cpus)
    timings: dict[str, float] = {}

    if os.environ.get("DP_PHASE_WARM", "1") == "1":
        from bench import flagship_profile_validate, prepare_transcripts

        warm = prepare_transcripts(
            spark, int(os.environ.get("SPARK_GRAFT_WARM_CONVS", "65000"))
        )
        flagship_profile_validate(spark, warm)

    def phase(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 2)
        print(f"[phase] {name}: {timings[name]}s", file=sys.stderr, flush=True)
        return out

    if path.startswith("table:"):
        # Re-attach the bucketed table's CLUSTERED BY metadata in this
        # fresh process (the catalog is per-session).
        from bench import prepare_transcripts_bucketed

        n_convs = int(path.split("_b")[-1].split("_")[0])
        df = spark.table(prepare_transcripts_bucketed(spark, n_convs)[len("table:"):])
    else:
        df = spark.read.parquet(path)
    n = phase("count", lambda: df.count())

    prof_df = df.drop("part")
    phase("profile_approx", lambda: profile(prof_df, mode="approx").collect())

    suite = transcript_check_suite()
    row_group = [c for c in suite if c.kind in ("row", "group")]
    stat = [c for c in suite if c.kind == "stat"]
    parts = [str(i) for i in range(N_PARTS)]

    def run(checks):
        from pyspark.sql import functions as F

        v, viol = C.run_checks(
            df, checks,
            partition_col=F.pmod(F.xxhash64("conv_id"), F.lit(N_PARTS)),
            key_cols=["conv_id", "turn_idx"], partitions=parts,
        )
        v.collect()
        viol.count()
        viol.unpersist()

    phase("checks_row_group", lambda: run(row_group))
    if stat:
        phase("checks_stat", lambda: run(stat))

    total = sum(timings.values())
    print(json.dumps({"cpus": int(cpus), "turns": n, "total": round(total, 2),
                      "phases": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
