"""Structured-Streaming twins of the F-row batch queries (SURVEY.md §2 F).

Each twin consumes the same events parquet through ``readStream`` and
applies the SAME aggregation expressions as the batch operator, so
batch/stream equivalence on bounded input is by construction (tested in
tests/test_streaming.py with an available-now trigger and memory sink).

Watermarks are declared on every stateful twin — on an unbounded source
they bound state; on the bounded test input they drop nothing, keeping
results equal to batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# events schema for the file-stream source (readStream requires an
# explicit schema).  ts has shipped as raw nanos (int64) in one testdata
# generation and TIMESTAMP(US) in another — sniff the footer via a batch
# read and build the matching schema (sources.table does the same dance
# for batch).
def _events_raw_schema(spark: SparkSession, src: str) -> tuple[StructType, bool]:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ts_is_long = (
        spark.read.parquet(src).schema["ts"].dataType.typeName()
        in ("long", "bigint")
    )
    from pyspark.sql.types import TimestampType

    return (
        StructType(
            [
                StructField("event_id", LongType()),
                StructField("ts", LongType() if ts_is_long else TimestampType()),
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("value", DoubleType()),
                StructField("props", StringType()),
            ]
        ),
        ts_is_long,
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet — the streaming twin of
    sources.table('events').  The file-stream source requires a
    *directory* of files (that's its real-world shape: files landing in
    a drop folder), so the single testdata file is staged into a temp
    dir once per scale factor."""
    import shutil
    import tempfile

    src = f"{sf_dir}/events.parquet"
    stage = os.path.join(
        tempfile.gettempdir(),
        "apms_stream_" + os.path.basename(os.path.normpath(sf_dir)),
    )
    os.makedirs(stage, exist_ok=True)
    dst = os.path.join(stage, "events.parquet")
    if not os.path.exists(dst) or os.path.getsize(dst) != os.path.getsize(src):
        shutil.copyfile(src, dst)

    schema, ts_is_long = _events_raw_schema(spark, src)
    raw = spark.readStream.schema(schema).format("parquet").load(stage)
    # LTZ (timestamp_micros), not NTZ: EventTimeWatermark requires
    # TIMESTAMP type; session timeZone=UTC keeps wall values equal to
    # the batch NTZ column
    if ts_is_long:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def tumbling_stream(ev: DataFrame) -> DataFrame:
    """Streaming twin of q_win_tumbling (1h tumbling window × type)."""
    return (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(ev: DataFrame) -> DataFrame:
    """Streaming twin of q_dedup_stateful via dropDuplicatesWithinWatermark
    on (user_id, event_type) — first-arrival wins, state bounded by the
    watermark."""
    return (
        ev.withWatermark("ts", "31 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type", "event_id", "ts")
    )


def sliding_stream(ev: DataFrame) -> DataFrame:
    """Streaming twin of q_win_sliding: 1-hour windows sliding every 30
    minutes (each event lands in 2 windows), same flattened
    window_start output as the batch operator."""
    return (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def topk_users_stream(ev: DataFrame) -> DataFrame:
    """Streaming twin of q_topk_users_window: fixed-day filter + per-user
    counts.  The final ORDER BY/LIMIT ranking is legal in streaming only
    under complete output mode — which is how the twin runs (the sink
    re-ranks on every trigger, exactly the semantics of a live top-k
    dashboard)."""
    from ..operators.events import TOPK_DAY

    day = ev.where((F.col("ts") >= TOPK_DAY) & (F.col("ts") < "2024-01-16"))
    return (
        day.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(10)
    )


_WM_OUTPUT = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", LongType()),  # micros; rebuilt to timestamp below
        StructField("event_type", StringType()),
    ]
)

_WM_STATE = StructType([StructField("max_ts", LongType())])


def _staged_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the RAW events parquet with ts normalized to a
    LONG of epoch MICROS (whichever physical encoding the testdata
    generation used) — the stateful kernels below do their state math on
    integer micros.  The file-stream source needs a directory, so the
    single testdata file is staged into a tmp dir keyed by sf."""
    import shutil
    import tempfile

    src = f"{sf_dir}/events.parquet"
    stage = os.path.join(
        tempfile.gettempdir(),
        "apms_stream_" + os.path.basename(os.path.normpath(sf_dir)),
    )
    os.makedirs(stage, exist_ok=True)
    dst = os.path.join(stage, "events.parquet")
    if not os.path.exists(dst) or os.path.getsize(dst) != os.path.getsize(src):
        shutil.copyfile(src, dst)
    schema, ts_is_long = _events_raw_schema(spark, src)
    raw = spark.readStream.schema(schema).format("parquet").load(stage)
    ts_us = (
        F.expr("ts div 1000") if ts_is_long else F.unix_micros(F.col("ts"))
    )
    return raw.withColumn("ts", ts_us.cast("long"))


def watermark_stream_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_late_data_watermark: per-user 1-hour lateness
    cutoff carried as explicit keyed state (applyInPandasWithState).
    Each micro-batch advances the user's max event time and emits only
    events within 1 hour of it — the per-key watermark the batch
    operator renders with a window max.  Built directly over the raw
    staged source (state math runs on integer micros; the output ts is
    rebuilt to the same TIMESTAMP the batch operator emits).  Append
    caveat (inherent to streaming): rows emitted in an earlier
    micro-batch cannot be retracted when a later batch advances the max;
    on bounded single-trigger input the result equals batch exactly
    (tested)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    raw = _staged_events_stream(spark, sf_dir)

    hour_us = 3_600_000_000

    def _update(key, pdfs, state: GroupState):
        (user_id,) = key
        (max_ts,) = state.get if state.exists else (None,)
        frames = []
        for pdf in pdfs:
            us = pdf["ts"].astype("int64")  # epoch micros (normalized source)
            cur_max = int(us.max())
            max_ts = cur_max if max_ts is None else max(max_ts, cur_max)
            frames.append(
                pd.DataFrame(
                    {
                        "event_id": pdf["event_id"],
                        "user_id": user_id,
                        "ts": us,
                        "event_type": pdf["event_type"],
                    }
                )
            )
        state.update((int(max_ts),))
        out = pd.concat(frames)
        yield out[out["ts"] >= max_ts - hour_us]

    kept = raw.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_WM_OUTPUT,
        stateStructType=_WM_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return kept.select(
        "event_id",
        "user_id",
        F.timestamp_micros(F.col("ts")).alias("ts"),
        "event_type",
    )


def session_stream(ev: DataFrame) -> DataFrame:
    """Streaming twin of q_sessionize using the native session_window
    (30-min gap).  Session identity differs from the batch cumsum id
    (windows vs ordinals) but span/count per (user, session) match."""
    return (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


_FFILL_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("hour", LongType()),  # micros; rebuilt to timestamp below
        StructField("value_ffill", DoubleType()),
        StructField("is_observed", LongType()),
    ]
)

# (last emitted hour in micros, last filled value) per user
_FFILL_STATE = StructType(
    [StructField("last_hour", LongType()), StructField("last_value", DoubleType())]
)

_HOUR_US = 3_600_000_000


def resample_ffill_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_resample_ffill: per-user gap-fill carried as
    explicit keyed state (applyInPandasWithState).  Each micro-batch
    extends the user's hourly grid from the state's last emitted hour to
    the batch's max hour, forward-filling from the state's last value —
    so a user silent for a whole micro-batch still gets their hours
    emitted on the next event.  On bounded single-trigger input the
    output equals the batch operator exactly (tested); on unbounded
    input the append caveat of watermark_stream_raw applies (hours
    already emitted are not retracted by late data)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    raw = _staged_events_stream(spark, sf_dir)

    def _update(key, pdfs, state: GroupState):
        (user_id,) = key
        last_hour, last_value = state.get if state.exists else (None, None)
        batches = [pdf for pdf in pdfs]
        pdf = pd.concat(batches)
        us = pdf["ts"].astype("int64")  # epoch micros (normalized source)
        pdf = pdf.assign(us=us, hour=(us // _HOUR_US) * _HOUR_US)
        # deterministic last observation per hour: (ts, event_id) order.
        # tail(1) takes the last ROW per group — GroupBy.last() would skip
        # NaN per column and diverge from the batch row_number() pick when
        # value is NULL.
        obs = (
            pdf.sort_values(["us", "event_id"])
            .groupby("hour", as_index=False)
            .tail(1)[["hour", "value"]]
        )
        start = obs["hour"].min() if last_hour is None else last_hour + _HOUR_US
        end = int(obs["hour"].max())
        if end < start:
            # batch entirely within already-emitted hours: state unchanged
            yield pd.DataFrame(columns=_FFILL_OUTPUT.fieldNames())
            return
        grid = pd.DataFrame({"hour": range(int(start), end + _HOUR_US, _HOUR_US)})
        out = grid.merge(obs, on="hour", how="left")
        out["is_observed"] = out["value"].notna().astype("int64")
        out["value"] = out["value"].ffill()
        if last_value is not None:
            out["value"] = out["value"].fillna(last_value)
        state.update((end, float(out["value"].iloc[-1])))
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "hour": out["hour"].astype("int64"),
                "value_ffill": out["value"],
                "is_observed": out["is_observed"],
            }
        )

    filled = raw.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_FFILL_OUTPUT,
        stateStructType=_FFILL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return filled.select(
        "user_id",
        F.timestamp_micros(F.col("hour")).alias("hour"),
        "value_ffill",
        F.col("is_observed").cast("boolean").alias("is_observed"),
    )


def rollup_stream(ev: DataFrame) -> DataFrame:
    """Streaming twin of q_rollup_timeseries for the three time grains:
    hour/day/month continuous aggregates as a union of windowed
    aggregations over the same stream (Structured Streaming has no
    streaming ROLLUP, and the batch operator's grand-total row would
    need complete-mode global state — the twin declares the three
    incremental grains, which is exactly what a continuous aggregate
    materializes)."""
    grains = []
    for grain, width in (("hour", "1 hour"), ("day", "1 day"), ("month", "31 days")):
        # month windows: the events span is a single calendar month in
        # the testdata; a 31-day tumbling window anchored by Spark's
        # epoch-aligned windowing covers it.  On an unbounded feed a
        # calendar-month grain would roll up from the day grain
        # downstream (days compose into exact months; fixed windows
        # don't).
        grains.append(
            ev.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", width).alias("w"))
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            )
            .select(
                F.lit(grain).alias("grain"),
                F.col("w.start").alias("window_start"),
                "n_events",
                "sum_value",
            )
        )
    out = grains[0]
    for g in grains[1:]:
        out = out.unionByName(g)
    return out


def attribution_stream(ev: DataFrame) -> DataFrame:
    """Streaming twin of q_attribution_window's JOIN STAGE: a
    stream-stream inner join of the purchase stream against the view
    stream on user_id with the 1-hour interval condition.  Watermarks on
    BOTH sides bound the join state (views retained only while a
    matching purchase can still arrive).  The batch operator's top-1
    per purchase is a post-join ranking the append-mode twin leaves to
    the consumer — the capability under test is the watermarked
    interval join itself; equality of the emitted PAIR SET with the
    batch join stage is asserted in tests."""
    from ..operators.events import ATTRIB_WINDOW_MIN

    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    return purchases.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            > F.col("purchase_ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW_MIN} MINUTES")
        ),
        "inner",
    ).select("purchase_id", "user_id", "purchase_ts", "view_id", "view_ts")


_TRANS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("from_type", StringType()),
        StructField("to_type", StringType()),
    ]
)
_TRANS_STATE = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_type", StringType()),
    ]
)


def transitions_stream_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_event_transitions' per-user lag: each user's
    LAST event rides keyed state across micro-batches
    (applyInPandasWithState), and every batch emits one row per
    consecutive (prev → next) event-type pair in (ts, event_id) order —
    the cross-batch boundary pair comes from the carried state.
    Aggregating the emitted pairs reproduces the batch transition matrix
    exactly on bounded input (tested, and checked by
    q_stream_batch_equiv_gate).  Append caveat (inherent): per-user
    batches must arrive time-ordered; the single-trigger bounded source
    guarantees it."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    raw = _staged_events_stream(spark, sf_dir)

    def _update(key, pdfs, state: GroupState):
        (user_id,) = key
        last_type = state.get[2] if state.exists else None
        pdf = pd.concat(list(pdfs))
        if len(pdf) == 0:
            yield pd.DataFrame(
                {"user_id": [], "from_type": [], "to_type": []}
            )
            return
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        types = list(pdf["event_type"])
        out_from, out_to = [], []
        prev = last_type
        for t in types:
            if prev is not None:
                out_from.append(prev)
                out_to.append(t)
            prev = t
        state.update(
            (
                int(pdf["ts"].iloc[-1]),
                int(pdf["event_id"].iloc[-1]),
                types[-1],
            )
        )
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_from),
                "from_type": out_from,
                "to_type": out_to,
            }
        )

    return raw.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_TRANS_OUTPUT,
        stateStructType=_TRANS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
