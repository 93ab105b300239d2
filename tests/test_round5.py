"""Round-5 additions: approx-percentile error bound and the
driver-visible stream≡batch key."""

from __future__ import annotations

from pyspark.sql import functions as F

from affinity_propagation_mapreduce_spark import registry
from affinity_propagation_mapreduce_spark.operators import relational

from .conftest import SF_T2


def _q(spark, name):
    return registry.queries()[name](spark, SF_T2)


def test_approx_percentile_rank_error_bound(spark):
    """approx_percentile(accuracy=A) guarantees rank error <= n/A: the
    value it returns for quantile q must be an element whose true rank
    is within [floor((q - eps) * n), ceil((q + eps) * n)]."""
    rows = {r.o_orderstatus: r for r in _q(spark, "agg_percentiles_approx").collect()}
    assert rows
    orders = relational._t(spark, SF_T2, "orders")
    eps = 1.0 / relational.APPROX_PCT_ACCURACY
    for status, row in rows.items():
        vals = sorted(
            r.o_totalprice
            for r in orders.where(F.col("o_orderstatus") == status)
            .select("o_totalprice")
            .collect()
        )
        n = len(vals)
        assert n == row.n
        for q, approx in ((0.5, row.median_approx), (0.9, row.p90_approx)):
            # rank of the approx value among the true values (rounding to
            # 2 decimals moves a value by < 0.01, well below value gaps)
            lo_rank = sum(1 for v in vals if v < approx - 0.01)
            hi_rank = sum(1 for v in vals if v <= approx + 0.01)
            want = q * n
            slack = eps * n + 1.5  # +1 for rounding at either edge
            assert lo_rank - slack <= want <= hi_rank + slack, (
                status, q, approx, lo_rank, hi_rank, n
            )


def test_stream_batch_equiv_sessionize_green(spark):
    """The driver-visible key must drain the stream, agree with batch
    for every user, and report all-match rows."""
    df = _q(spark, "stream_batch_equiv_sessionize")
    rows = df.collect()
    assert rows
    assert all(r.sessions_match for r in rows)


def test_partition_prune_readback_plan_prunes(spark):
    """The declared query must carry its event_type predicate as
    PartitionFilters on the read-back scan (directory-level pruning),
    not as a post-scan filter."""
    from affinity_propagation_mapreduce_spark.operators.events import (
        partition_pruned_readback,
    )

    pruned = partition_pruned_readback(spark, SF_T2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    assert "event_type" in plan.split("PartitionFilters")[1].split("]")[0], plan
    got = _q(spark, "partition_prune_readback")
    assert got.count() > 0


def test_doc_repetition_signals_well_formed(spark):
    """Repetition fractions are true fractions and the flag is exactly
    the disjunction of the two threshold tests."""
    from affinity_propagation_mapreduce_spark.operators.textops import (
        REPETITION_TAU,
    )

    rows = _q(spark, "doc_repetition").collect()
    assert len(rows) == 500
    for r in rows:
        assert 0.0 <= r.top_token_frac <= 1.0
        assert 0.0 <= r.dup_bigram_frac <= 1.0
        want = (
            r.top_token_frac > REPETITION_TAU
            or r.dup_bigram_frac > REPETITION_TAU
        )
        # rounded-at-4 values only disagree with the raw flag within 5e-5
        # of the cutoff; no fixture doc sits that close
        assert r.is_repetitive == want, r


def test_doc_repetition_plan_is_single_explode_no_selfjoin(spark):
    """The bigram signal must stay array-side: exactly one Generate (the
    token histogram's explode), no sort-merge self-join, and only the
    two token-aggregation exchanges — the shape that keeps a corpus
    pass at one shuffle-pair instead of re-shuffling an exploded token
    table against itself."""
    import re

    from affinity_propagation_mapreduce_spark.operators.textops import (
        q_doc_repetition,
    )

    plan = (
        q_doc_repetition(spark, SF_T2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Generate") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2, plan
