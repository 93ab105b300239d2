"""Streaming crash-recovery proof — round-9 verdict item #6.

Kills a file-to-file streaming twin MID-RUN (SIGKILL of the whole child
process group — a real crash, not a graceful stop), restarts the same
query from its checkpoint, and asserts the final sink equals an
uninterrupted control run row-for-row: exactly-once across failure.

  python tools/stream_crash_run.py 2000000

Protocol:
  1. control: session_stream over the synthesized drop folder
     (stream_scale_run.synth_events_dir), availableNow with
     maxFilesPerTrigger=4, own checkpoint+sink, runs to completion.
  2. crash: the SAME stream with a fresh checkpoint+sink runs in a
     subprocess; the parent polls <ckpt>/commits/ and SIGKILLs the
     child's process group as soon as ≥2 micro-batches have committed
     (so the kill lands mid-flight with real state in the checkpoint).
  3. resume: a fresh process restarts from the killed checkpoint and
     runs availableNow to completion.
  4. verdict: both sinks read back through their _spark_metadata commit
     logs; exceptAll must be empty BOTH ways (no loss, no duplicates).

Prints one JSON line; recorded in BASELINE.md §streaming-crash.
"""
from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/stream_crash"


def _run_stream(spark, src: str, out: str) -> None:
    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.streaming import twins

    schema, _ = twins._events_raw_schema(spark, src)
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .format("parquet")
        .load(src)
    )
    ev = raw.withColumn("ts", F.timestamp_micros(F.col("ts")))
    q = (
        twins.session_stream(ev)
        .writeStream.format("parquet")
        .option("path", f"{out}/data")
        .option("checkpointLocation", f"{out}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def child_main(src: str, out: str) -> None:
    from affinity_propagation_mapreduce_spark.session import get_spark

    spark = get_spark("stream-crash-child")
    spark.sparkContext.setLogLevel("ERROR")
    _run_stream(spark, src, out)


def main() -> int:
    if sys.argv[1] == "--child":
        child_main(sys.argv[2], sys.argv[3])
        return 0

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from affinity_propagation_mapreduce_spark.session import get_spark
    from stream_scale_run import synth_events_dir

    spark = get_spark(f"stream-crash-{n}")
    spark.sparkContext.setLogLevel("ERROR")
    src = synth_events_dir(spark, n)
    out = os.path.join(BASE, f"n{n}")
    shutil.rmtree(out, ignore_errors=True)

    # 1. control
    t0 = time.time()
    _run_stream(spark, src, f"{out}/control")
    control_wall = round(time.time() - t0, 1)

    # 2. crash a subprocess mid-run after >=2 committed micro-batches
    crash_out = f"{out}/crash"
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", src, crash_out],
        start_new_session=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    commits_dir = f"{crash_out}/ckpt/commits"
    deadline = time.time() + 600
    committed = 0
    while time.time() < deadline:
        if child.poll() is not None:
            raise RuntimeError(
                "child finished before the kill — raise n or lower "
                "maxFilesPerTrigger so the run spans more batches"
            )
        try:
            committed = len(
                [f for f in os.listdir(commits_dir) if not f.startswith(".")]
            )
        except OSError:
            committed = 0
        if committed >= 2:
            # re-check liveness immediately before the kill: the child
            # may have finished (or died) since the top-of-loop poll —
            # killing a reaped pid raises, and a completed run would
            # vacuously "recover" (review r9 #6)
            if child.poll() is not None:
                raise RuntimeError(
                    "child finished before the kill — raise n or lower "
                    "maxFilesPerTrigger so the run spans more batches"
                )
            try:
                os.killpg(os.getpgid(child.pid), signal.SIGKILL)
            except ProcessLookupError:
                raise RuntimeError(
                    "child exited in the kill window — raise n so the "
                    "kill lands mid-run"
                )
            break
        time.sleep(0.2)
    else:
        raise RuntimeError("no second commit within 600s")
    child.wait()

    # 3. resume from the killed checkpoint in a fresh process
    t1 = time.time()
    rc = subprocess.call(
        [sys.executable, os.path.abspath(__file__), "--child", src, crash_out]
    )
    assert rc == 0, "resume run failed"
    resume_wall = round(time.time() - t1, 1)

    # 4. compare through the sinks' commit logs
    control = spark.read.parquet(f"{out}/control/data")
    crashed = spark.read.parquet(f"{crash_out}/data")
    missing = control.exceptAll(crashed).count()
    extra = crashed.exceptAll(control).count()
    print(
        json.dumps(
            {
                "n_events": n,
                "control_wall_sec": control_wall,
                "resume_wall_sec": resume_wall,
                "commits_before_kill": committed,
                "control_rows": control.count(),
                "crashed_rows": crashed.count(),
                "missing_after_recovery": missing,
                "duplicates_after_recovery": extra,
                "exactly_once": missing == 0 and extra == 0,
            }
        ),
        flush=True,
    )
    return 0 if missing == 0 and extra == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
