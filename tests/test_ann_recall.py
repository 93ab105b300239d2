"""Recall of the approximate scale paths vs their exact counterparts."""

from __future__ import annotations

from affinity_propagation_mapreduce_spark.operators import textops, vector

from .conftest import SF_T2


def test_ivf_recall_vs_exact(spark):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in vector.q_knn_cosine_topk(spark, SF_T2).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in vector.q_knn_cosine_ivf(spark, SF_T2).collect()
    }
    recall = len(exact & approx) / len(exact)
    # nprobe=4 of 16 cells on unclustered data: expect most true
    # neighbors probed; assert a floor that catches structural breakage
    assert recall >= 0.5, f"IVF recall {recall:.2f}"


def test_minhash_recall_vs_exact(spark):
    """dedup_near_minhash is the banded-LSH twin of dedup_ngram_jaccard
    (MinHash over the same word-bigram shingle sets, exact shingle-
    Jaccard verify): every emitted pair must be in the exact operator's
    output, and band recall at j>=0.8 must hold (theory ≈ 0.985)."""
    exact = {
        (r.doc_lo, r.doc_hi)
        for r in textops.q_dedup_ngram_jaccard(spark, SF_T2).collect()
    }
    approx = {
        (r.doc_lo, r.doc_hi)
        for r in textops.q_dedup_near_minhash(spark, SF_T2).collect()
    }
    assert approx <= exact  # every emitted pair is exact-verified
    recall = len(approx) / len(exact)
    assert recall >= 0.95, f"MinHash recall {recall:.3f}"


def test_embed_cosine_ivf_subset_and_recall(spark):
    """The IVF scale twin emits a strict subset of the exact operator's
    pairs (bitwise-identical cosine for shared pairs — same fold order)
    with structural recall."""
    exact = {
        (r.i, r.k): r.cosine
        for r in vector.q_dedup_embed_cosine(spark, SF_T2).collect()
    }
    approx = {
        (r.i, r.k): r.cosine
        for r in vector.q_dedup_embed_cosine_ivf(spark, SF_T2).collect()
    }
    assert set(approx) <= set(exact)
    for pair, cos in approx.items():
        assert cos == exact[pair]  # bitwise, not approximate
    recall = len(approx) / len(exact) if exact else 1.0
    assert recall >= 0.5, f"IVF embed-dup recall {recall:.2f}"


def test_sparse_ap_assigns_everyone(spark):
    """Sparse AP over the k-NN candidate graph: every point gets a label
    (k=32 keeps the graph connected enough here) and exemplars
    self-label."""
    from affinity_propagation_mapreduce_spark.operators import ap

    from .conftest import SF_SMALL as _sf  # noqa: F401

    rows = ap.cluster_sparse(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    labels = {r.vec_id: r.exemplar for r in rows}
    exemplars = {e for e in labels.values() if e != -1}
    assert exemplars, "no exemplars elected"
    assert all(labels[e] == e for e in exemplars)
    assert sum(1 for v in labels.values() if v == -1) == 0
