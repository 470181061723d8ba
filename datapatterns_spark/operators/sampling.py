"""Deterministic stratified sampling — a training-data pipeline op
beyond the reference (whose only sampler is the systematic whole-table
ENTH, Profile.ecl:283-288 / SURVEY §2.2 P6).

``sample_stratified`` draws exactly ``k`` rows per stratum (e.g. per
language, per source) as a seeded uniform draw WITHOUT replacement:
rows rank by ``xxhash64(seed, key...)`` inside their stratum, so the
sample is a pure function of (data, seed) — reproducible across runs,
partitionings and engines (the DuckDB oracle replays the identical
hash).  Scale shape: the ranking runs through the salted two-phase
top-k (``profile.grouped_topk``), so a hot stratum (one language being
90% of a crawl) is never a single window partition; the shuffle
carries at most ``buckets * k`` survivor rows per stratum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .profile import grouped_topk


def sample_stratified(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    key_cols: list[str],
    seed: int = 0,
) -> DataFrame:
    """Return ``df``'s columns plus ``sample_rank`` (1..k within the
    stratum), keeping exactly ``min(k, stratum size)`` rows per
    stratum.  ``key_cols`` must identify a row (they feed the rank
    hash and the deterministic tiebreak)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    rank_hash = F.xxhash64(F.lit(int(seed)), *[F.col(c) for c in key_cols])
    order = [rank_hash.asc(), *[F.col(c).asc() for c in key_cols]]
    return grouped_topk(
        df,
        strata_cols,
        order,
        k,
        salt_col=F.xxhash64(*[F.col(c) for c in key_cols]),
        rank_name="sample_rank",
    )
