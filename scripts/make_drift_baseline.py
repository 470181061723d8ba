#!/usr/bin/env python3
"""Derive the stored turn_idx drift baselines for the flagship
transcript check suite.

The per-turn ``turn_idx`` distribution of the synthetic generator is
scale-invariant (conv_len is drawn per conversation independent of
n_conversations), so a histogram measured once on a reference snapshot
is a valid "stored baseline profile" for any table size.  Prints the
32-bin (PSI) and 64-bin (KS) fraction lists that are pasted into
``datapatterns_spark/sources/transcripts.py``.

Usage: python scripts/make_drift_baseline.py [n_convs]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    from datapatterns_spark.operators.constraints import baseline_histogram
    from datapatterns_spark.session import get_spark
    from datapatterns_spark.sources.transcripts import generate_transcripts

    spark = get_spark("drift-baseline", master="local[8]")
    df = generate_transcripts(spark, n_conversations=n, seed=42)
    for name, bins in (("PSI", 32), ("KS", 64)):
        frac, lo, hi = baseline_histogram(df, "turn_idx", bins=bins, lo=0.0, hi=64.0)
        xs = [round(frac.get(i, 0.0), 6) for i in range(bins)]
        print(f"_TURN_{name}_BASELINE = [  # {bins} bins, lo=0, hi=64, {n} convs seed 42")
        for i in range(0, bins, 8):
            print("    " + ", ".join(f"{x:.6f}" for x in xs[i : i + 8]) + ",")
        print("]")
    spark.stop()


if __name__ == "__main__":
    main()
