"""Approximate-nearest-neighbor similarity search over an embedding
column (``array<float>``) — training-data pipeline capability (not in
the reference).

* :func:`brute_force_topk` — exact cosine top-k per query: broadcast
  the (small) query set, one pass over the corpus, per-query window
  top-k.  The correctness baseline.
* :func:`ivf_topk` — IVF-style scale path: corpus assigned to
  ``n_cells`` centroid cells; a query scans only its ``n_probe``
  nearest cells.  Centroids start as deterministic seeded Gaussians
  and by default get ``refine_sweeps=1`` Lloyd sweep(s) over a
  bounded deterministic corpus sample (driver-side k-means on
  <= n_cells*sample_per_cell vectors), which balances cell sizes —
  unrefined random centroids leave hot cells that dominate the probe
  scan at scale.  Recall is tunable via n_probe; exactness is NOT
  guaranteed (documented) — use brute force to measure recall
  (measured on testdata in BASELINE.md).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import cosine
from .profile import grouped_topk


def _finish_topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k over (query_id, neighbor_id, cos) — salted
    two-phase ranking, NEVER a whole-query window partition: in brute
    force every query's candidate set is the entire corpus, so a plain
    ``Window.partitionBy(query_id)`` would sort |corpus| rows in ONE
    task per query regardless of cluster size.  Phase 1 keeps k per
    (query, salt-bucket) across the full cluster; phase 2 ranks the
    bounded (<= buckets*k per query) survivors."""
    return grouped_topk(
        scored,
        ["query_id"],
        [F.desc("cos"), F.asc("neighbor_id")],
        k,
        salt_col=F.xxhash64("neighbor_id"),
        rank_name="rank",
    )


def _unit(vec: list[float]) -> list[float]:
    n = sum(x * x for x in vec) ** 0.5 or 1.0
    return [x / n for x in vec]


def _random_centroids(dim: int, n_cells: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [_unit([rng.gauss(0, 1) for _ in range(dim)]) for _ in range(n_cells)]


def _refined_centroids(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    n_cells: int,
    seed: int,
    sweeps: int,
    sample_per_cell: int = 64,
) -> list[list[float]]:
    """Seeded Gaussian centroids plus ``sweeps`` Lloyd iterations over
    a bounded DETERMINISTIC corpus sample: the ``n_cells *
    sample_per_cell`` rows with the smallest ``xxhash64(id)`` (a
    TakeOrdered job — no full sort, no ``rand()``), averaged per
    nearest-cell driver-side.  The driver transfer is bounded
    (sample_size * dim doubles) and the result is a pure function of
    (data, seed), so repeated runs plan identical literal centroids.
    Empty cells keep their previous centroid."""
    cents = _random_centroids(dim, n_cells, seed)
    if sweeps <= 0:
        return cents
    n_sample = n_cells * sample_per_cell
    sample = [
        [float(x) for x in r["v"]]
        for r in corpus.select(
            F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h")
        )
        .orderBy("h")
        .limit(n_sample)
        .collect()
    ]
    if not sample:
        return cents
    for _ in range(sweeps):
        sums = [[0.0] * dim for _ in range(n_cells)]
        counts = [0] * n_cells
        for v in sample:
            best, best_dot = 0, float("-inf")
            for i, c in enumerate(cents):
                d = sum(x * w for x, w in zip(v, c))
                if d > best_dot:
                    best, best_dot = i, d
            counts[best] += 1
            s = sums[best]
            for j, x in enumerate(v):
                s[j] += x
        cents = [
            _unit([x / counts[i] for x in sums[i]]) if counts[i] else cents[i]
            for i in range(n_cells)
        ]
    return cents


def _nearest_cells(vec: Column, centroids: list[list[float]], top: int) -> Column:
    """Indices of the ``top`` nearest centroids by dot product —
    LITERAL formulation: every centroid weight is a plan literal.
    Right for small ``n_cells * dim`` (and required by the SQL oracle,
    which replays the same literals); above
    ``LITERAL_CENTROID_LIMIT`` doubles use the broadcast formulation
    (:func:`_nearest_cells_col`) — a 4096-cell x 768-dim index would
    put ~3M literals in the Catalyst tree (plan blowup, no codegen
    reuse)."""
    scored = F.array(
        *[
            F.struct(
                (
                    -F.aggregate(
                        F.zip_with(
                            vec,
                            F.array(*[F.lit(w) for w in c]),
                            lambda x, w: x.cast("double") * w,
                        ),
                        F.lit(0.0),
                        lambda s, x: s + x,
                    )
                ).alias("neg_dot"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.transform(F.slice(F.array_sort(scored), 1, top), lambda s: s["cell"])


# n_cells * dim above which ivf_topk switches from plan-literal
# centroids to the broadcast centroid frame (8192 doubles ~ the 16x64
# oracle pin x8 — far under any Catalyst pain point, far over test
# configs that should keep byte-identical literal plans)
LITERAL_CENTROID_LIMIT = 8192


def _centroid_frame(spark, centroids: list[list[float]]):
    """ONE-row DataFrame carrying every centroid as DATA (an
    ``array<struct<cell:int, cv:array<double>>>`` value) — shipped to
    executors via a broadcast cross join instead of the logical plan,
    so plan size is O(1) in ``n_cells * dim``."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(
                "_cents",
                ArrayType(
                    StructType(
                        [
                            StructField("cell", IntegerType()),
                            StructField("cv", ArrayType(DoubleType())),
                        ]
                    )
                ),
            )
        ]
    )
    row = [([(i, [float(x) for x in c]) for i, c in enumerate(centroids)],)]
    return spark.createDataFrame(row, schema)


def _nearest_cells_col(vec: Column, cents_col: Column, top: int) -> Column:
    """Indices of the ``top`` nearest centroids by dot product, with
    the centroids read from a runtime column (the broadcast centroid
    frame) — identical argmin ordering semantics to
    :func:`_nearest_cells` (struct<neg_dot, cell> lexicographic
    sort)."""
    scored = F.transform(
        cents_col,
        lambda c: F.struct(
            (
                -F.aggregate(
                    F.zip_with(
                        vec, c["cv"], lambda x, w: x.cast("double") * w
                    ),
                    F.lit(0.0),
                    lambda s, x: s + x,
                )
            ).alias("neg_dot"),
            c["cell"].alias("cell"),
        ),
    )
    return F.transform(F.slice(F.array_sort(scored), 1, top), lambda s: s["cell"])


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos, rank)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
    )
    return _finish_topk(scored, k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "vec_id",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int | None = None,
    seed: int = 42,
    refine_sweeps: int = 1,
) -> DataFrame:
    """IVF-bucketed approximate top-k.  Corpus rows are assigned to
    their nearest centroid cell once; each query joins only its
    n_probe nearest cells — the scan shrinks ~n_probe/n_cells.

    ``refine_sweeps`` Lloyd sweeps over a bounded deterministic sample
    (see :func:`_refined_centroids`) balance cell populations; pass 0
    to pin the raw seeded centroids (used by the SQL oracle, which
    replays them as literals).  When ``dim`` is omitted it is probed
    from ONE row of the QUERY frame — the small broadcast side, never
    a corpus scan; pass ``dim`` explicitly to avoid the extra tiny
    job on hot paths.

    Cell assignment has two formulations with identical semantics:
    ``n_cells * dim <= LITERAL_CENTROID_LIMIT`` inlines the centroid
    weights as plan literals (byte-stable plans — the SQL oracle
    replays them); above the limit the centroids ride a ONE-row
    broadcast frame as data (:func:`_centroid_frame`), keeping the
    Catalyst tree O(1) while every corpus row still computes its
    argmin cell in a single projection — no extra shuffle either
    way."""
    if dim is None:
        row = queries.select(vec_col).first()
        if row is None:
            # empty query set: a valid no-op (callers filter their
            # query batches) — return an empty result with the output
            # schema instead of crashing on the dim probe.  neighbor_id
            # takes the CORPUS id type (a query/corpus id type mismatch
            # would otherwise give this branch a different schema than
            # the non-empty path, breaking unions/appends downstream)
            return (
                queries.select(F.col(query_id_col).alias("query_id"))
                .limit(0)
                .crossJoin(
                    corpus.select(F.col(id_col).alias("neighbor_id")).limit(0)
                )
                .select(
                    "query_id",
                    "neighbor_id",
                    # lit(None).cast: a bare lit(0.0) is non-nullable,
                    # which alone diverges from the non-empty schema
                    F.lit(None).cast("double").alias("cos"),
                    F.lit(1).alias("rank"),
                )
            )
        dim = len(row[0])
    centroids = _refined_centroids(
        corpus, vec_col, id_col, dim, n_cells, seed, refine_sweeps
    )
    if n_cells * dim <= LITERAL_CENTROID_LIMIT:
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            _nearest_cells(F.col(vec_col), centroids, 1)[0].alias("cell"),
        )
        q = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.explode(
                _nearest_cells(F.col(vec_col), centroids, n_probe)
            ).alias("cell"),
        )
    else:
        cents = _centroid_frame(corpus.sparkSession, centroids)
        c = (
            corpus.crossJoin(F.broadcast(cents))
            .select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("cv"),
                _nearest_cells_col(F.col(vec_col), F.col("_cents"), 1)[0].alias(
                    "cell"
                ),
            )
        )
        q = (
            queries.crossJoin(F.broadcast(cents))
            .select(
                F.col(query_id_col).alias("query_id"),
                F.col(vec_col).alias("qv"),
                F.explode(
                    _nearest_cells_col(F.col(vec_col), F.col("_cents"), n_probe)
                ).alias("cell"),
            )
        )
    scored = c.join(F.broadcast(q), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    return _finish_topk(scored, k)
