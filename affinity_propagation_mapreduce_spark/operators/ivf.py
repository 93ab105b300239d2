"""Shared IVF coarse-quantizer sizing and training for the approximate
vector paths (sparse AP candidates, knn_cosine_ivf, dedup_embed_cosine_ivf).

Cost model.  An IVF pass has two stages:

* coarse scoring: every point scores against all ``nlist`` centroids —
  O(N · nlist) similarity evaluations;
* within-cell verify: every point meets the members of its ``nprobe``
  probed cells — O(N · nprobe · N/nlist) pair evaluations at the
  expected cell size N/nlist.

The total is minimized where the two terms balance,
``nlist = sqrt(nprobe · N)``, giving cells of ~sqrt(N/nprobe) members
and O(N^1.5 · sqrt(nprobe)) total work — sub-quadratic in N.  (The
previous sizing, ``nlist = N/64``, made the *pair count* linear but the
coarse-scoring step O(N²/64) — a constant-factor reduction, not an
asymptotic one.  A fixed nlist has the dual flaw: cells grow O(N) and
within-cell work is O(N²/nlist).)  Beyond ~10⁹ points the next step is
a two-level quantizer (score sqrt(nlist) super-cells, then the cells
under the best super-cells), which brings coarse scoring to O(N·N^0.25);
the single-level balance is sufficient for the scales this repo targets
and keeps the oracle SQL mirrorable.

The centroid *broadcast* is O(nlist · d) = O(sqrt(N)) bytes — e.g.
10⁹ points × 64 dims ⇒ ~63k centroids ≈ 32 MB, within executor budget.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Embeddings row count at the driver's oracle scale (sf0.01).  Oracle SQL
# strings are static, so they embed nlist evaluated at this N; the Spark
# side computes the same function of the actual count and the two agree
# at the only sf the oracle ever runs at.
ORACLE_SF_N = 500


def cost_balanced_nlist(n: int, nprobe: int) -> int:
    """Coarse-quantizer size balancing coarse scoring against within-cell
    verification: nlist = sqrt(nprobe·N), floored at 16 so tiny inputs
    keep a meaningful quantizer."""
    return max(16, int(round(math.sqrt(nprobe * n))))


def train_centroids(
    emb: DataFrame,
    nlist: int,
    sample_per_cell: int = 8,
    iters: int = 2,
) -> np.ndarray:
    """Deterministic sampled Lloyd refinement (the k-means|| shortcut:
    train on a bounded sample, not the corpus).

    A deterministic md5-ordered sample of ~``sample_per_cell · nlist``
    points is collected to the driver — O(nlist · d) = O(sqrt(N)) bytes,
    the same order as the centroid broadcast itself — initialized from
    the ``nlist`` lowest-vec_id sampled points, and refined with
    ``iters`` Lloyd steps in numpy.  Empty cells keep their previous
    centroid.  Everything is a pure function of (vec_id, embedding), so
    retries and re-runs reproduce the same quantizer.

    On clustered data this tracks the density modes the lowest-id
    pseudo-centroids miss (recall comparison in tests/test_ann_recall.py);
    the lowest-id scheme remains the declared oracle-mirrorable variant.
    """
    rows = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(nlist * sample_per_cell)
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    pts = np.array([r.embedding for r in rows], dtype="f8")
    nlist = min(nlist, len(pts))
    cent = pts[:nlist].copy()
    for _ in range(iters):
        d2 = (
            (pts * pts).sum(axis=1, keepdims=True)
            - 2.0 * pts @ cent.T
            + (cent * cent).sum(axis=1)[None, :]
        )
        assign = d2.argmin(axis=1)
        for c in range(nlist):
            members = pts[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent
