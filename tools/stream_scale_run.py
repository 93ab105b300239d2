"""Structured-Streaming scale run — the streaming analogue of
above_gate_run.py / text_scale_run.py.

Every streaming proof so far ran at sf scale (≤60k events); this runner
measures the REAL streaming twins on a synthesized multi-million-event
drop folder: files land in a directory, `readStream` picks them up, the
stateful session-window / tumbling aggregations run under their
production watermarks with an `availableNow` trigger, and results land
in a parquet sink with a checkpoint — the exactly-once file-to-file
shape a production job uses.

  python tools/stream_scale_run.py 10000000

Prints one JSON line per twin: wall, input rows, output rows, events/s.
Synthesis is excluded from the timing.  Results recorded in BASELINE.md
§streaming-scale.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/stream_scale"

# timeline warp: 5 h of activity then 1 h of silence, so per-user gaps
# really exceed the 30-min session gap once per cycle
_ACTIVE_US = 5 * 3600 * 1_000_000
_QUIET_US = 3600 * 1_000_000


def synth_events_dir(spark, n: int) -> str:
    """Deterministic event corpus shaped like testdata events: ~n/1000
    users, 5 event types independent of user, ~90 s per-user event
    spacing warped into 5h-active/1h-quiet cycles (~25 h of activity →
    ~30 h span) so every user closes a session at every quiet hour."""
    from pyspark.sql import functions as F

    out = os.path.join(BASE, f"n{n}", "events")
    if os.path.isfile(os.path.join(out, "_SUCCESS")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    # ~n/1000 users => per-user timeline spans (n/users)*90s — days, so
    # all but the final watermark-held 2h of sessions close and the
    # append-mode file sink receives them (the production shape: the
    # tail is held back until later files advance the watermark)
    users = max(100, n // 1000)
    base_ts = 1_700_000_000_000_000  # micros
    df = (
        spark.range(n)
        .withColumn("event_id", F.col("id"))
        .withColumn("h", F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10).cast("long"))
        # type comes from an INDEPENDENT md5 slice: users is a multiple
        # of 5, so typing by h%5 would give every user exactly one event
        # type — and e.g. zero view→purchase attribution pairs exist
        # (caught when the stream-stream ladder row first ran: the
        # batch/stream pair sets agreed at 0 = 0, a vacuous proof)
        .withColumn("h2", F.conv(F.substring(F.md5(F.col("id").cast("string")), 9, 8), 16, 10).cast("long"))
        .withColumn("user_id", F.col("h") % users)
        .withColumn("seq", (F.col("id") / users).cast("long"))
        # jitter: 1-60 s of per-event displacement on the 90 s grid
        .withColumn("gap_us", (F.lit(1) + F.col("h") % 60) * 1_000_000)
        # REAL session structure (r10 harness fix): the linear 90 s grid
        # has no per-user gap ever exceeding the 30-min session gap, so
        # every user is ONE never-closing session — the 60-70k "sessions"
        # earlier ladder runs emitted were artifacts of watermark-dropped
        # rows carving artificial holes (see the mtime note below).  Warp
        # the timeline into 5h-active / 1h-quiet cycles: sessions close at
        # every quiet hour for every user, deterministically.
        .withColumn("lin_us", F.col("seq") * F.lit(90_000_000))
        .withColumn(
            "ts",
            F.lit(base_ts)
            + (F.col("lin_us") / F.lit(_ACTIVE_US)).cast("long")
            * F.lit(_ACTIVE_US + _QUIET_US)
            + F.col("lin_us") % F.lit(_ACTIVE_US)
            + F.col("gap_us"),
        )
        .withColumn(
            "event_type",
            F.element_at(
                F.array(*[F.lit(t) for t in ("view", "click", "purchase", "signup", "logout")]),
                (F.col("h2") % 5 + 1).cast("int"),
            ),
        )
        .withColumn("value", F.round((F.col("h") % 10_000) / 100.0, 2))
        .withColumn("props", F.lit('{"src":"synth"}'))
        .select("event_id", F.col("ts").cast("long").alias("ts"), "user_id", "event_type", "value", "props")
    )
    # range-partition by ts: part-00000 holds the earliest span, so the
    # file source admits files in event-time order (a real drop folder
    # fills chronologically) and the watermark advances monotonically
    # instead of jumping to max after the first random file
    df.repartitionByRange(32, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(out)
    # FileStreamSource admits files by MODIFICATION TIME, and 32
    # concurrently-written parts land with ~identical mtimes — admission
    # order then mixes early and late ts ranges, the watermark jumps
    # ahead on the first late-range file, and every stateful twin
    # silently drops the rows that arrive behind it (caught when the
    # stream-stream join emitted 17% of the batch pair set: per-batch
    # numRowsDroppedByWatermark ~20% with the watermark stuck for 4
    # batches).  Range partition i holds ts range i, so stamping
    # strictly increasing mtimes in part order makes admission mirror a
    # real drop folder filling chronologically.
    parts = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    t0 = time.time() - 2 * len(parts)
    for i, f in enumerate(parts):
        os.utime(os.path.join(out, f), (t0 + 2 * i, t0 + 2 * i))
    return out


def run_twin(spark, name: str, stream_df, out_dir: str) -> dict:
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", f"{out_dir}/{name}/data")
        .option("checkpointLocation", f"{out_dir}/{name}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows_in = sum(p["numInputRows"] for p in q.recentProgress)
    out_rows = spark.read.parquet(f"{out_dir}/{name}/data").count()
    return {"rows_in": rows_in, "rows_out": out_rows}


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.session import get_spark
    from affinity_propagation_mapreduce_spark.streaming import twins

    spark = get_spark(f"stream-scale-{n}")
    spark.sparkContext.setLogLevel("ERROR")
    src = synth_events_dir(spark, n)

    schema, _ = twins._events_raw_schema(spark, src)
    out_dir = os.path.join(BASE, f"n{n}", "out")
    shutil.rmtree(out_dir, ignore_errors=True)

    for name, build in (
        ("session_stream", twins.session_stream),
        ("tumbling_stream", twins.tumbling_stream),
        ("attribution_stream", twins.attribution_stream),
    ):
        # 4 files/batch => 8 micro-batches: the watermark advances
        # between batches (it lags one batch), so closed sessions emit
        # as the stream progresses — availableNow honors the per-batch
        # admission limit
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 4)
            .format("parquet")
            .load(src)
        )
        ev = raw.withColumn("ts", F.timestamp_micros(F.col("ts")))
        t0 = time.time()
        stats = run_twin(spark, name, build(ev), out_dir)
        wall = time.time() - t0
        if name == "attribution_stream":
            # the hardest stateful shape (r9 verdict #7): assert the
            # watermarked stream-stream interval join emitted EXACTLY
            # the batch join's pair set — inner joins emit eagerly on
            # match, so nothing is watermark-held at end of input
            ev_batch = spark.read.parquet(src).withColumn(
                "ts", F.timestamp_micros(F.col("ts"))
            )
            ref = twins.attribution_stream(ev_batch)
            got = spark.read.parquet(f"{out_dir}/{name}/data")
            extra = got.exceptAll(ref).count()
            missing = ref.exceptAll(got).count()
            stats.update(
                pairs_batch=ref.count(), pairs_extra=extra, pairs_missing=missing
            )
            if extra or missing:
                raise AssertionError(
                    f"stream-stream pair set diverged: +{extra}/-{missing}"
                )
        print(
            json.dumps(
                {
                    "op": name,
                    "n_events": n,
                    "wall_sec": round(wall, 1),
                    "events_per_sec": round(n / wall),
                    **stats,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
