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


# ---------------------------------------------------------------------------
# Blocked dense engine (operators/ap_dense.py) — r6 verdict #3
# ---------------------------------------------------------------------------


def test_blocked_first_iteration_bitwise_equals_coordinate(spark):
    """chain[0]'s coordinate view must be BITWISE equal to one coordinate
    responsibility+availability pass: the blocked row kernel is selection
    arithmetic and the column-stat combine reproduces the same values, so
    the engine swap may never move a number at iteration 1 (where the
    driver's unrounded r hash bites)."""
    from affinity_propagation_mapreduce_spark.operators import ap

    view = ap.cached_chain(spark, SF_SMALL)[0]
    coord = ap.availability_pass(
        ap.responsibility_pass(ap.init_state(ap.cached_smat(spark, SF_SMALL)))
    )
    row = (
        view.alias("b")
        .join(coord.alias("c"), ["i", "k"])
        .agg(
            F.count("*").alias("n"),
            F.max(F.abs(F.col("b.s") - F.col("c.s"))).alias("ds"),
            F.max(F.abs(F.col("b.r") - F.col("c.r"))).alias("dr"),
            F.max(F.abs(F.col("b.a") - F.col("c.a"))).alias("da"),
        )
        .collect()[0]
    )
    assert row.n == 500 * 500
    # s and iteration-1 r are selection arithmetic — bitwise guaranteed.
    # a is a group sum: the blocked engine's deterministic block-order
    # combine and the coordinate hash-agg CAN differ in summation order
    # (observed 0.0 here, but not guaranteed across hosts/parallelism),
    # so a gets the same ~1e-12 tolerance class the oracle rounding
    # absorbs rather than a bitwise pin.
    assert (row.ds, row.dr) == (0.0, 0.0)
    assert row.da < 1e-9


def test_blocked_labels_equal_coordinate_cluster(spark):
    """End-to-end: the blocked assignment (_labels fast path) must agree
    with the coordinate reference pipeline cluster() exactly."""
    from affinity_propagation_mapreduce_spark.operators import ap

    blocked = {r.vec_id: r.exemplar for r in ap._labels(spark, SF_SMALL).collect()}
    coord = {r.vec_id: r.exemplar for r in ap.cluster(spark, SF_SMALL).collect()}
    assert blocked == coord and len(blocked) == 500


def test_blocked_gate_falls_back_to_coordinate(spark, monkeypatch):
    """Forcing the size gate to 0 must route _labels through the
    coordinate engine and produce the same labels — the cliff changes
    cost, never results (same contract as the median gate)."""
    from affinity_propagation_mapreduce_spark.operators import ap, ap_dense

    fast = {r.vec_id: r.exemplar for r in ap._labels(spark, SF_SMALL).collect()}
    ap.clear_cache()
    monkeypatch.setattr(ap_dense, "BLOCKED_MAX_N", 0)
    assert ap._dense(spark, SF_SMALL) is None
    fall = {r.vec_id: r.exemplar for r in ap._labels(spark, SF_SMALL).collect()}
    ap.clear_cache()  # drop coordinate-path cache entries built under the gate
    assert fast == fall


def test_blocked_pref_matches_oracle_formula(spark):
    """Blocked median/min preference scalars equal the distributed
    percentile / min over the coordinate off-diagonal (bitwise)."""
    from affinity_propagation_mapreduce_spark.operators import ap

    d = ap._dense(spark, SF_SMALL)
    off = ap.cached_off(spark, SF_SMALL)
    dist = off.agg(
        F.expr("percentile(s, 0.5)").alias("med"), F.min("s").alias("mn")
    ).collect()[0]
    assert d.pref_value("median") == dist.med
    assert d.pref_value("min") == dist.mn


def test_fused_dense_loop_equals_coordinate(spark, monkeypatch):
    """The fused single-job-per-iteration dense loop (retain=False, the
    bench-scale path) must produce the same labels as the coordinate
    reference pipeline, and its accumulator-carried exemplar hint must
    equal the label set."""
    from affinity_propagation_mapreduce_spark.operators import ap

    ap.clear_cache()
    monkeypatch.setattr(ap, "_CHAIN_RETAIN_MAX_N", 0)  # force fused path
    fused = {r.vec_id: r.exemplar for r in ap._labels(spark, SF_SMALL).collect()}
    ex_hint = {r.exemplar for r in ap.q_ap_exemplars(spark, SF_SMALL).collect()}
    coord = {r.vec_id: r.exemplar for r in ap.cluster(spark, SF_SMALL).collect()}
    ap.clear_cache()
    assert fused == coord
    assert ex_hint == set(coord.values())


def test_blocked_sparse_loop_equals_coordinate(spark, monkeypatch):
    """The fused ragged-blocked sparse loop must agree with the
    coordinate sparse loop (same candidate graph, same update algebra;
    only group-sum ORDER differs, so labels may diverge at most on
    threshold knife-edges — none on this data)."""
    from affinity_propagation_mapreduce_spark.operators import ap, ap_dense

    blocked = {
        r.vec_id: r.exemplar for r in ap.cluster_sparse(spark, SF_SMALL).collect()
    }
    monkeypatch.setattr(ap_dense, "BLOCKED_MAX_N", 0)
    ap.clear_cache()
    coord = {
        r.vec_id: r.exemplar for r in ap.cluster_sparse(spark, SF_SMALL).collect()
    }
    ap.clear_cache()
    assert blocked == coord and len(blocked) == 500


def test_fused_loop_is_run_deterministic(spark, monkeypatch):
    """Two independent fused-chain runs must agree BITWISE on the final
    availability values: partials are keyed and combined in sorted block
    order over id-sorted rows, so the floating-point sum order cannot
    vary with task scheduling — the property that keeps knife-edge
    exemplar thresholds (a+r>0) stable across reruns."""
    from affinity_propagation_mapreduce_spark.operators import ap

    monkeypatch.setattr(ap, "_CHAIN_RETAIN_MAX_N", 0)  # force fused path

    def final_view():
        ap.clear_cache()
        d = ap._dense(spark, SF_SMALL)
        st = ap._dense_chain(spark, SF_SMALL, retain=False)[-1]
        return d.coordinate_view(st).localCheckpoint(eager=True)

    v1, v2 = final_view(), final_view()
    row = (
        v1.alias("x")
        .join(v2.alias("y"), ["i", "k"])
        .agg(
            F.count("*").alias("n"),
            F.max(F.abs(F.col("x.r") - F.col("y.r"))).alias("dr"),
            F.max(F.abs(F.col("x.a") - F.col("y.a"))).alias("da"),
        )
        .collect()[0]
    )
    ap.clear_cache()
    assert row.n == 500 * 500
    assert (row.dr, row.da) == (0.0, 0.0)
