"""Measured growth law for the sub-quadratic scale paths (r5 verdict #6).

The driver's testdata ships only two distinct corpus sizes (500 and 2000
embeddings), so the O(N^1.5) design claims can't be fitted from the sf
directories alone.  These tests drive the REAL candidate generators
(operators/ap.ivf_candidate_pairs, textops.q_dedup_near_minhash) over a
synthetic N-sweep via their input-override parameters and fit the
log-log slope of the deterministic work metric — candidate-pair count —
against N.  The dense path is exactly 2.0; the scale paths must stay
below 1.8.  Counts, not wall times: the bench host's variance (PLANS.md)
makes time-based exponents unresolvable, while pair counts are exact.

The fitted curves are recorded in BASELINE.md §growth.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from affinity_propagation_mapreduce_spark.operators import ap, textops

IVF_NS = (1000, 3000, 9000)
DOC_NS = (500, 2000, 8000)


def _clustered_emb(spark, n: int, d: int = 16, k_true: int = 32,
                   cluster_ordered: bool = True):
    """Deterministic clustered corpus — the regime IVF targets.  With
    ``cluster_ordered`` the vec_ids follow the clusters (the adversarial
    ingestion order that collapses the lowid quantizer, per
    test_ann_recall — the sweep runs the TRAINED quantizer through it);
    without, ids are a fixed permutation (the declared regime for the
    lowid oracle-mirrorable variant: ids uncorrelated with content)."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(k_true, d))
    reps = np.repeat(centers, n // k_true + 1, axis=0)[:n]
    pts = reps + 0.6 * rng.normal(size=(n, d))
    if not cluster_ordered:
        pts = pts[rng.permutation(n)]
    return spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )


def _synthetic_docs(spark, n: int, vocab: int = 5000, dup_rate: float = 0.05):
    """Deterministic corpus with a FIXED near-dup rate: every 1/dup_rate-th
    doc is a light mutation of its predecessor, so true-positive pairs
    grow linearly in N — any superlinear candidate growth comes from the
    banding itself (bucket skew), which is what the exponent bounds."""
    rng = np.random.default_rng(13)
    rows = []
    step = int(1 / dup_rate)
    toks = None
    for i in range(n):
        if i % step == 1 and toks is not None:
            mutated = list(toks)
            mutated[rng.integers(0, len(mutated))] = f"w{rng.integers(0, vocab)}"
            toks = mutated
        else:
            toks = [f"w{rng.integers(0, vocab)}" for _ in range(30)]
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _slope(ns, counts) -> float:
    """Least-squares slope of log(count) vs log(N)."""
    xs = [math.log(n) for n in ns]
    ys = [math.log(max(c, 1)) for c in counts]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )


@pytest.mark.parametrize("trained", [False, True], ids=["lowid", "trained"])
def test_ivf_candidate_growth_subquadratic(spark, trained):
    """Candidate-pair count of the IVF generator (the shared mechanism
    under ap_assign_sparse and dedup_embed_cosine_ivf) grows with
    exponent < 1.8 over a 9× N sweep, and each point's candidate set
    stays far below the dense N²/2."""
    counts = []
    for n in IVF_NS:
        emb = _clustered_emb(spark, n, cluster_ordered=trained)
        c = ap.ivf_candidate_pairs(
            spark, sf_dir=None, trained=trained, emb=emb, n=n
        ).count()
        counts.append(c)
        assert c < 0.2 * n * (n - 1) / 2, (n, c)
    slope = _slope(IVF_NS, counts)
    assert slope < 1.8, (counts, slope)
    assert slope > 0.8, (counts, slope)  # sanity: it does grow with N


def test_minhash_candidate_growth_linear(spark):
    """Emitted near-dup pairs of the banded-MinHash pipeline grow
    ~linearly when the true dup rate is fixed — the banding introduces
    no superlinear candidate blowup (bucket skew would)."""
    counts = []
    for n in DOC_NS:
        docs = _synthetic_docs(spark, n)
        c = textops.q_dedup_near_minhash(
            spark, sf_dir=None, broadcast_verify=True, docs=docs
        ).count()
        counts.append(c)
    slope = _slope(DOC_NS, counts)
    assert slope < 1.3, (counts, slope)
    # the synthetic dup structure was actually found (not vacuous)
    assert counts[-1] >= 0.5 * DOC_NS[-1] * 0.05, counts


def test_blocked_dense_layout_growth():
    """The blocked dense AP layout scales by block COUNT, not block
    size: per-task bytes stay bounded by _TARGET_BLOCK_BYTES while the
    number of blocks grows ~N² once the memory bound dominates the
    parallelism floor — the property that lets the same layout run on a
    1000-executor cluster without any task ever holding more than one
    bounded block."""
    from affinity_propagation_mapreduce_spark.operators import ap_dense

    class _SC:
        defaultParallelism = 32

    class _Spark:
        sparkContext = _SC()

    spark = _Spark()
    rows = {n: ap_dense._n_blocks(spark, n) for n in (2_000, 10_000, 40_000)}
    for n, nb in rows.items():
        per_task_rows = -(-n // nb)
        assert per_task_rows * 3 * n * 8 <= ap_dense._TARGET_BLOCK_BYTES * 1.1
    # work floor at small N (r15 optimization): when the whole state is
    # small, blocks carry at least _MIN_BLOCK_BYTES each rather than
    # fanning out to every core — the JVM↔Python handshake is per task,
    # so 32 near-empty blocks cost more than 11 useful ones.  The floor
    # never caps the memory bound, so large-N behavior is unchanged.
    total_2k = 2_000 * 3 * 2_000 * 8
    assert rows[2_000] == total_2k // ap_dense._MIN_BLOCK_BYTES  # 11 < 32
    assert total_2k / rows[2_000] >= ap_dense._MIN_BLOCK_BYTES
    # ~N^2 block growth beyond the parallelism/work floor
    assert rows[10_000] >= 35
    ratio = rows[40_000] / rows[10_000]
    assert 12 <= ratio <= 20, rows  # 16 = (4x N)^2 within slack
