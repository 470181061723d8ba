"""Mergeable t-digest quantile sketch (pure numpy, deterministic).

The incremental profile (operators/incremental.py) stores one compact,
MERGEABLE state row per (partition, attribute); every component merges
with an associative Spark built-in — except quantiles, which until
round 4 existed only in the one-shot profile via ``percentile_approx``
(whose internal sketch Spark does not expose as a storable column).
This module supplies the missing mergeable quantile state: Dunning's
merging t-digest [Dunning & Ertl, "Computing extremely accurate
quantiles using t-digests", 2019], the sketch the BASELINE north-star
names for profile quantiles.

Reference analogue: the reference computes quartiles exactly via its
positional math (/root/reference/Profile.ecl:1104-1139) and has no
incremental/mergeable form at all; this is the documented approx-mode
deviation (same status as HLL cardinality) applied to the incremental
layer.

Design for 10^12 rows — the sketch is built in TWO passes that never
materialize a whole group:

1. ``mapInPandas`` over the melted value stream: each Arrow batch
   groups locally (vectorized numpy sort + greedy compress) and emits
   one serialized sub-digest per (partition, attribute) seen in the
   batch.  Memory is bounded by the Arrow batch size regardless of
   group skew — a hot partition yields MORE sub-digest rows, never a
   bigger task.
2. an ordinary ``groupBy(partition, attribute)`` +
   ``applyInPandas`` merge over the slim sub-digest rows (each a few
   KB; group size = number of contributing batches, not rows).

Both are the sanctioned Arrow-vectorized shapes (no per-row Python).
Merging digests across partitions at read time (merge_states) reuses
pass 2 on the stored state rows.

Determinism: centroids are built from a stable sort of the input
values, and the greedy compress pass is order-deterministic, so the
same (batching, data) always yields the same bytes.  Different
partition groupings may yield different centroid sets — estimates
agree within the rank-error bound (tested), which is the documented
contract of any mergeable quantile sketch.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"TD1"
# k_1 scale function: k(q) = (delta / 2pi) * asin(2q - 1).  Rank error
# near the median ~ O(1/delta); 100 gives ~1% worst-case mid-quantile
# rank error at a few hundred centroids (~5 KB serialized).
DEFAULT_COMPRESSION = 100.0


def _k(q: np.ndarray | float, delta: float):
    return (delta / (2.0 * np.pi)) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


def _k_inv(k: np.ndarray | float, delta: float):
    return (np.sin(k * (2.0 * np.pi) / delta) + 1.0) / 2.0


def _compress(
    means: np.ndarray, weights: np.ndarray, delta: float
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy merge pass over centroids sorted by mean (paper alg. 1)."""
    if means.size == 0:
        return means, weights
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    q0 = 0.0
    q_limit = _k_inv(_k(q0, delta) + 1.0, delta)
    cur_m = float(means[0])
    cur_w = float(weights[0])
    for m, w in zip(means[1:], weights[1:]):
        q = q0 + (cur_w + w) / total
        if q <= q_limit:
            # weighted mean keeps the centroid exact for its members
            cur_m += (m - cur_m) * (w / (cur_w + w))
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q0 += cur_w / total
            q_limit = _k_inv(_k(q0, delta) + 1.0, delta)
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


class TDigest:
    """Immutable-ish t-digest: build from values, merge, query."""

    __slots__ = ("means", "weights", "vmin", "vmax", "delta")

    def __init__(self, means, weights, vmin, vmax, delta=DEFAULT_COMPRESSION):
        self.means = np.asarray(means, dtype=np.float64)
        self.weights = np.asarray(weights, dtype=np.float64)
        self.vmin = float(vmin)
        self.vmax = float(vmax)
        self.delta = float(delta)

    # -- construction -------------------------------------------------
    @classmethod
    def from_values(
        cls, values, delta: float = DEFAULT_COMPRESSION
    ) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return cls(np.empty(0), np.empty(0), np.nan, np.nan, delta)
        v = np.sort(v, kind="stable")
        m, w = _compress(v, np.ones_like(v), delta)
        return cls(m, w, v[0], v[-1], delta)

    @classmethod
    def merge_all(cls, digests) -> "TDigest":
        ds = [d for d in digests if d.means.size]
        if not ds:
            delta = digests[0].delta if digests else DEFAULT_COMPRESSION
            return cls(np.empty(0), np.empty(0), np.nan, np.nan, delta)
        deltas = {d.delta for d in ds}
        if len(deltas) > 1:
            # mixing compression contracts would silently blend rank-error
            # bounds; fail fast like profile_incremental's per-store guard
            raise ValueError(
                "merge_all: digests carry differing delta values "
                f"{sorted(deltas)}; rebuild with one quantile_delta"
            )
        delta = ds[0].delta
        means = np.concatenate([d.means for d in ds])
        weights = np.concatenate([d.weights for d in ds])
        order = np.argsort(means, kind="stable")
        m, w = _compress(means[order], weights[order], delta)
        return cls(
            m, w, min(d.vmin for d in ds), max(d.vmax for d in ds), delta
        )

    # -- query --------------------------------------------------------
    @property
    def count(self) -> float:
        return float(self.weights.sum())

    def quantile(self, q: float) -> float:
        """Estimate the q-quantile by interpolating between centroid
        midpoints, clamped to the tracked [min, max]."""
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        total = self.count
        idx = np.clip(q, 0.0, 1.0) * total
        # centroid mass centered on its mean
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if idx <= cum[0]:
            # interpolate from the true min into the first centroid
            t = idx / max(cum[0], 1e-300)
            return float(self.vmin + t * (self.means[0] - self.vmin))
        if idx >= cum[-1]:
            t = (idx - cum[-1]) / max(total - cum[-1], 1e-300)
            return float(self.means[-1] + t * (self.vmax - self.means[-1]))
        i = int(np.searchsorted(cum, idx, side="right"))
        t = (idx - cum[i - 1]) / (cum[i] - cum[i - 1])
        return float(self.means[i - 1] + t * (self.means[i] - self.means[i - 1]))

    def cdf(self, x: float) -> float:
        """Estimated P(V <= x) — the inverse of :meth:`quantile`, used
        by sketch-based drift (KS distance between two digests)."""
        if self.means.size == 0:
            return float("nan")
        # order matters: x >= vmax first, so the degenerate vmin == vmax
        # digest (constant column) reports P(V <= v) = 1 at its own value
        if x >= self.vmax:
            return 1.0
        if x < self.vmin:
            return 0.0
        total = self.count
        cum = np.cumsum(self.weights) - self.weights / 2.0
        pts = np.concatenate(([self.vmin], self.means, [self.vmax]))
        ranks = np.concatenate(([0.0], cum, [total]))
        # side='right' skips past centroids AT x, so x == vmin lands
        # right of any mass concentrated at the minimum (zero-inflated
        # columns report ~half that mass, not 0)
        i = int(np.searchsorted(pts, x, side="right"))
        lo, hi = pts[i - 1], pts[i]
        t = 0.0 if hi == lo else (x - lo) / (hi - lo)
        est = (ranks[i - 1] + t * (ranks[i] - ranks[i - 1])) / total
        if x == self.vmin:
            # the observed minimum carries at least half of one
            # sample's mass (Dunning's convention) — never hard 0
            est = max(est, 0.5 / total)
        return float(est)

    # -- serialization ------------------------------------------------
    def to_bytes(self) -> bytes:
        n = int(self.means.size)
        head = _MAGIC + struct.pack(
            "<dddi", self.delta, self.vmin, self.vmax, n
        )
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        if not b or b[:3] != _MAGIC:
            raise ValueError("not a TD1 t-digest payload")
        delta, vmin, vmax, n = struct.unpack_from("<dddi", b, 3)
        off = 3 + struct.calcsize("<dddi")
        means = np.frombuffer(b, dtype=np.float64, count=n, offset=off)
        weights = np.frombuffer(
            b, dtype=np.float64, count=n, offset=off + 8 * n
        )
        return cls(means.copy(), weights.copy(), vmin, vmax, delta)


def ks_distance(a: TDigest, b: TDigest, n_points: int = 256) -> float:
    """Sketch-based two-sample KS statistic: max |CDF_a - CDF_b| over
    the union of both digests' centroid/extreme support points (plus an
    even grid for safety).  Error is bounded by the digests' rank
    error, so this is a drift metric computable from stored profile
    states WITHOUT rescanning either dataset."""
    if a.means.size == 0 or b.means.size == 0:
        return float("nan")
    pts = np.unique(
        np.concatenate(
            [
                a.means, b.means,
                [a.vmin, a.vmax, b.vmin, b.vmax],
                np.linspace(
                    min(a.vmin, b.vmin), max(a.vmax, b.vmax), n_points
                ),
            ]
        )
    )
    return float(
        max(abs(a.cdf(float(x)) - b.cdf(float(x))) for x in pts)
    )
