"""Round-9 additions: scale-safe B19 ranks, persisted-ANN serving twins,
multi-batch CDC MERGE chain, streaming crash-recovery (in test_streaming)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from affinity_propagation_mapreduce_spark.operators.relational import (
    _t,
    q_win_ntile_pctrank,
)

from .conftest import SF_T2

SF_01 = "/root/testdata/sf0.1"


def test_ntile_pctrank_matches_global_window(spark):
    """The range-partition + offset formulation must be VALUE-identical
    to the textbook global window at a larger sf than parity checks
    (different range boundaries, more ties)."""
    cust = _t(spark, SF_01, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    ref = cust.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
    got = q_win_ntile_pctrank(spark, SF_01)
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_merge_apply_branch_semantics(spark):
    """The chain-only MERGE branches, pinned on a constructed feed:
    matched+D deletes, unmatched+D is a NO-OP (never arises single-shot),
    unmatched+U inserts, and a deleted key re-inserts in a later batch."""
    from affinity_propagation_mapreduce_spark.operators.relational import (
        _merge_apply,
    )

    state = spark.createDataFrame(
        [(1, "a", "SEG", 10.0), (2, "b", "SEG", 20.0)],
        "custkey long, name string, mktsegment string, acctbal double",
    )
    feed_schema = (
        "key long, op string, new_bal double, o_orderdate date, o_orderkey long"
    )
    import datetime as dt

    d = dt.date(2024, 1, 1)
    batch0 = spark.createDataFrame(
        [(1, "D", 0.0, d, 1), (3, "D", 0.0, d, 2), (4, "U", 44.0, d, 3)],
        feed_schema,
    )
    s1 = _merge_apply(state, batch0)
    got1 = {r.custkey: (r.name, r.acctbal) for r in s1.collect()}
    assert got1 == {2: ("b", 20.0), 4: ("new-4", 44.0)}
    batch1 = spark.createDataFrame([(1, "U", 99.0, d, 9)], feed_schema)
    got2 = {r.custkey: (r.name, r.acctbal) for r in _merge_apply(s1, batch1).collect()}
    assert got2 == {2: ("b", 20.0), 4: ("new-4", 44.0), 1: ("new-1", 99.0)}


def test_ntile_pctrank_no_single_partition_sort(spark):
    """The scale claim, asserted on BOTH plan halves (the checkpoint
    truncates the final plan, so the range stage must be inspected
    pre-checkpoint — review r9 #5): the rank stage is a range exchange,
    and no half funnels the table through one task or a Window."""
    from affinity_propagation_mapreduce_spark.operators.relational import (
        ntile_ranked_parts,
    )

    stage = (
        ntile_ranked_parts(spark, SF_T2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in stage.lower()
    assert "Exchange SinglePartition" not in stage
    assert "Window" not in stage
    plan = (
        q_win_ntile_pctrank(spark, SF_T2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan
    # no Window at all: ranks are closed forms of the id-encoded
    # (pid, local row number) + broadcast offsets
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
