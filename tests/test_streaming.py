"""Streaming twins ≡ batch on bounded input (SURVEY.md §5.2.5).

Each twin runs through readStream with an available-now trigger into a
memory sink and is compared to its batch operator's result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from affinity_propagation_mapreduce_spark.operators import events as ev_ops
from affinity_propagation_mapreduce_spark.streaming import twins

from .conftest import SF_SMALL


def _run_stream(spark, df, name: str, output_mode: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_tumbling_twin_equals_batch(spark):
    stream = twins.tumbling_stream(twins.stream_events(spark, SF_SMALL))
    got = _run_stream(spark, stream, "t_tumbling", "complete")
    want = ev_ops.q_win_tumbling(spark, SF_SMALL)
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_dedup_twin_equals_batch(spark):
    stream = twins.dedup_stream(twins.stream_events(spark, SF_SMALL))
    got = _run_stream(spark, stream, "t_dedup", "append")
    want = ev_ops.q_dedup_stateful(spark, SF_SMALL).select(
        "user_id",
        "event_type",
        F.col("first_event_id").alias("event_id"),
        F.col("first_ts").alias("ts"),
    )
    cols = ["user_id", "event_type", "event_id", "ts"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sliding_twin_equals_batch(spark):
    stream = twins.sliding_stream(twins.stream_events(spark, SF_SMALL))
    got = _run_stream(spark, stream, "t_sliding", "complete")
    want = ev_ops.q_win_sliding(spark, SF_SMALL)
    cols = ["window_start", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_topk_twin_equals_batch(spark):
    stream = twins.topk_users_stream(twins.stream_events(spark, SF_SMALL))
    got = _run_stream(spark, stream, "t_topk", "complete")
    want = ev_ops.q_topk_users_window(spark, SF_SMALL)
    cols = ["user_id", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_watermark_twin_equals_batch(spark):
    stream = twins.watermark_stream_raw(spark, SF_SMALL)
    got = _run_stream(spark, stream, "t_watermark", "append")
    want = ev_ops.q_late_data_watermark(spark, SF_SMALL)
    cols = ["event_id", "user_id", "ts", "event_type"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_twin_spans_match_batch(spark):
    """session_window twin: per-user session count and event totals match
    the batch cumsum sessionization."""
    stream = twins.session_stream(twins.stream_events(spark, SF_SMALL))
    got = _run_stream(spark, stream, "t_sessions", "complete")
    want = ev_ops.q_sessionize(spark, SF_SMALL)
    got_per_user = _rows(
        got.groupBy("user_id").agg(
            F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events")
        ),
        ["user_id", "n_sessions", "n_events"],
    )
    want_per_user = _rows(
        want.groupBy("user_id").agg(
            F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events")
        ),
        ["user_id", "n_sessions", "n_events"],
    )
    assert got_per_user == want_per_user


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState must carry state BETWEEN micro-batches:
    events split into two files fed one-per-trigger; the final emitted
    running totals per user must equal the batch aggregate."""
    import math

    from affinity_propagation_mapreduce_spark.sources import table
    from affinity_propagation_mapreduce_spark.streaming.stateful import (
        running_user_totals,
    )
    from affinity_propagation_mapreduce_spark.streaming.twins import (
        _events_raw_schema,
    )

    schema, ts_is_long = _events_raw_schema(
        spark, f"{SF_SMALL}/events.parquet"
    )
    raw = spark.read.schema(schema).parquet(f"{SF_SMALL}/events.parquet")
    half = raw.count() // 2
    src = str(tmp_path / "stream_in")
    raw.where(F.col("event_id") < half).coalesce(1).write.parquet(f"{src}/f0")
    raw.where(F.col("event_id") >= half).coalesce(1).write.parquet(f"{src}/f1")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    if ts_is_long:
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got_df = spark.table("t_stateful")
    # the LAST emission per user (largest n_events) is the final total
    last = {
        r.user_id: (r.n_events, r.total_value)
        for r in got_df.orderBy("n_events").collect()
    }
    want = {
        r.user_id: (r.n, r.tv)
        for r in table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(last) == set(want)
    for u in want:
        assert last[u][0] == want[u][0]
        assert math.isclose(last[u][1], want[u][1], rel_tol=1e-9)
    # state really crossed batches: some user must have emitted twice
    emit_counts = got_df.groupBy("user_id").count().agg(F.max("count")).first()[0]
    assert emit_counts >= 2, "no user spanned multiple micro-batches"


def test_resample_ffill_twin_equals_batch(spark):
    """Gap-fill twin: per-user stateful hourly grid + forward fill equals
    the batch resample operator exactly on bounded input."""
    stream = twins.resample_ffill_stream(spark, SF_SMALL)
    got = _run_stream(spark, stream, "t_ffill", "append")
    want = ev_ops.q_resample_ffill(spark, SF_SMALL)
    cols = ["user_id", "hour", "value_ffill", "is_observed"]
    assert _rows(got, cols) == _rows(want, cols)


def test_rollup_twin_matches_batch_grain_totals(spark):
    """The streaming rollup twin's hour-grain rows must equal the batch
    rollup's hour grain exactly; coarser streaming grains (fixed-width
    windows) must conserve the event total."""
    stream = twins.rollup_stream(twins.stream_events(spark, SF_SMALL))
    got = _run_stream(spark, stream, "t_rollup", "complete")
    batch = ev_ops.q_rollup_timeseries(spark, SF_SMALL)
    got_hours = _rows(
        got.where("grain = 'hour'").withColumnRenamed("window_start", "hour"),
        ["hour", "n_events", "sum_value"],
    )
    want_hours = _rows(
        batch.where("grain = 'hour'").select("hour", "n_events", "sum_value"),
        ["hour", "n_events", "sum_value"],
    )
    assert got_hours == want_hours
    total = batch.where("grain = 'total'").collect()[0].n_events
    for grain in ("hour", "day", "month"):
        got_total = sum(r.n_events for r in got.where(f"grain = '{grain}'").collect())
        assert got_total == total, grain


def test_attribution_stream_stream_join_equals_batch_pairs(spark):
    """The watermarked stream-stream interval join must emit exactly the
    batch join stage's (purchase, view) pair set on bounded input."""
    from affinity_propagation_mapreduce_spark.operators.events import (
        ATTRIB_WINDOW_MIN,
    )
    from affinity_propagation_mapreduce_spark.sources import table

    stream = twins.attribution_stream(twins.stream_events(spark, SF_SMALL))
    got = _run_stream(spark, stream, "t_attrib", "append")
    ev = table(spark, SF_SMALL, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
    )
    want = p.join(
        v,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            > F.col("purchase_ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW_MIN} MINUTES")
        ),
    ).select("purchase_id", "view_id")
    got_pairs = {(r.purchase_id, r.view_id) for r in got.collect()}
    want_pairs = {(r.purchase_id, r.view_id) for r in want.collect()}
    assert got_pairs == want_pairs


def test_transitions_twin_equals_batch_pairs(spark):
    """The stateful-lag twin's per-transition rows equal the batch lag
    window's, as a multiset — and aggregating them reproduces the
    declared transition-matrix counts exactly."""
    from pyspark.sql import Window

    got = _run_stream(
        spark,
        twins.transitions_stream_raw(spark, SF_SMALL),
        "transitions_sink",
        "append",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
    )
    cols = ["user_id", "from_type", "to_type"]
    assert _rows(got, cols) == _rows(want, cols)
    got_counts = _rows(
        got.groupBy("from_type", "to_type").agg(F.count("*").alias("n")),
        ["from_type", "to_type", "n"],
    )
    batch_counts = _rows(
        ev_ops.q_event_transitions(spark, SF_SMALL),
        ["from_type", "to_type", "n"],
    )
    assert got_counts == batch_counts


def test_stream_stop_resume_exactly_once(spark, tmp_path):
    """Checkpoint recovery (r8 verdict #6, in-suite variant): the same
    file-to-file tumbling query is run twice — once uninterrupted, once
    stopped mid-run after ≥2 committed micro-batches and restarted from
    its checkpoint — and the two sinks must match row-for-row (no loss,
    no duplicates).  The harsher SIGKILL-mid-flight variant is
    tools/stream_crash_run.py (BASELINE.md §streaming-crash)."""
    import os
    import time

    from affinity_propagation_mapreduce_spark.streaming.twins import (
        _events_raw_schema,
    )

    sf_dir = "/root/testdata/sf0.01"
    schema, ts_is_long = _events_raw_schema(spark, f"{sf_dir}/events.parquet")
    raw = spark.read.schema(schema).parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "drop")
    # 24 time-ordered files -> 24 micro-batches at one file per trigger
    # (time-ordered so the watermark advances monotonically)
    raw.repartitionByRange(24, "ts").sortWithinPartitions("ts").write.parquet(src)

    def build(out):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        ev = (
            stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            if ts_is_long
            else stream
        )
        return (
            twins.tumbling_stream(ev)
            .writeStream.format("parquet")
            .option("path", f"{out}/data")
            .option("checkpointLocation", f"{out}/ckpt")
            .trigger(availableNow=True)
            .start()
        )

    control_out = str(tmp_path / "control")
    q = build(control_out)
    q.awaitTermination(300)

    crash_out = str(tmp_path / "crash")
    q = build(crash_out)
    commits = f"{crash_out}/ckpt/commits"
    deadline = time.time() + 120
    stopped_after = None
    while time.time() < deadline and q.isActive:
        try:
            n_commits = len(
                [f for f in os.listdir(commits) if not f.startswith(".")]
            )
        except OSError:
            n_commits = 0
        if n_commits >= 2:
            q.stop()
            stopped_after = n_commits
            break
        time.sleep(0.02)
    assert stopped_after is not None and q.isActive is False, (
        "query finished before the interrupt — raise the file count"
    )
    # resume from the same checkpoint to completion
    q = build(crash_out)
    q.awaitTermination(300)

    control = spark.read.parquet(f"{control_out}/data")
    crashed = spark.read.parquet(f"{crash_out}/data")
    assert control.exceptAll(crashed).count() == 0, "rows lost in recovery"
    assert crashed.exceptAll(control).count() == 0, "duplicate rows after recovery"
    assert control.count() > 0
