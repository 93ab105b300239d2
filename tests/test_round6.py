"""Round-6 additions: driver-visible quality gates for the approximate
paths and the stream≡batch twins (r5 verdict #4/#5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from affinity_propagation_mapreduce_spark.operators import events as ev_ops
from affinity_propagation_mapreduce_spark.operators import vector

from .conftest import SF_SMALL


def test_ann_recall_gate_green(spark):
    """The gate passes on real data and reports one row per method with
    recall at or above its floor."""
    rows = vector.q_ann_recall_gate(spark, SF_SMALL).collect()
    assert {r.method for r in rows} == set(vector.RECALL_FLOORS)
    for r in rows:
        assert r.recall >= vector.RECALL_FLOORS[r.method]
        assert 0 < r.n_hit <= r.n_exact


def test_ann_recall_gate_raises_below_floor(spark, monkeypatch):
    """An impossible floor must turn the gate into a raise — the driver
    row goes red on recall collapse instead of silently passing."""
    monkeypatch.setitem(vector.RECALL_FLOORS, "knn_cosine_ivf", 1.01)
    with pytest.raises(AssertionError, match="below floor"):
        vector.q_ann_recall_gate(spark, SF_SMALL)


def test_ivf_dup_subset_gate_green(spark):
    row = vector.q_ivf_dup_subset_gate(spark, SF_SMALL).collect()[0]
    assert row.n_not_subset == 0
    assert row.n_bitwise_mismatch == 0
    assert row.recall >= vector.IVF_DUP_RECALL_FLOOR


def test_median_fast_path_bitwise_equals_distributed(spark, monkeypatch):
    """_FAST_MEDIAN_MAX_N silently switches the preference plan from the
    Arrow-collected driver median to the distributed percentile at
    N=10,001 (r5 verdict #7): the two paths must produce the BITWISE
    identical preference, so the cliff changes cost, never results.
    Verified both ways: fast vs distributed on the same kernel output,
    and end-to-end cluster() with the gate forced to the fallback."""
    from affinity_propagation_mapreduce_spark.operators import ap

    off = ap.similarity_off_diagonal(spark, SF_SMALL)
    fast = ap._median_preference_fast(spark, SF_SMALL, off)
    assert fast is not None
    dist = off.agg(F.expr("percentile(s, 0.5)").alias("p")).collect()[0].p
    assert fast == dist  # bitwise, no tolerance

    # below the gate the fast path must decline and cluster() still works
    monkeypatch.setattr(ap, "_FAST_MEDIAN_MAX_N", 10)
    assert ap._median_preference_fast(spark, SF_SMALL, off) is None
    # end-to-end on the fallback plan: same labels as the fast plan
    # (T_DEFAULT iterations — one iteration elects no exemplars yet)
    fall = {r.vec_id: r.exemplar for r in ap.cluster(spark, SF_SMALL).collect()}
    monkeypatch.setattr(ap, "_FAST_MEDIAN_MAX_N", 10_000)
    fastl = {r.vec_id: r.exemplar for r in ap.cluster(spark, SF_SMALL).collect()}
    assert fall == fastl


def test_stream_batch_equiv_gate_raises_on_divergence(spark, monkeypatch):
    """Corrupting one batch operator must make the combined gate raise:
    proves the multiset comparison actually bites (the green path is
    covered per-twin in test_streaming.py and by the driver row)."""

    real = ev_ops.q_win_tumbling

    def corrupted(spark_, sf_dir):
        return real(spark_, sf_dir).withColumn(
            "n_events", F.col("n_events") + 1
        )

    monkeypatch.setattr(ev_ops, "q_win_tumbling", corrupted)
    with pytest.raises(AssertionError, match="diverged"):
        ev_ops.q_stream_batch_equiv_gate(spark, SF_SMALL)
