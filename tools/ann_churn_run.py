"""ANN-index churn drill — round-10 verdict item #7.

Hammers ONE persisted index with the full maintenance mix — appends,
tombstone deletes, a re-insert-after-delete, compactions — from a
mutator subprocess that the parent SIGKILLs at staggered points (process
group kill: a real crash, mid-Spark-write included), while a concurrent
reader subprocess serves continuously against the same layout.  After
every kill the SAME feed replays from the top: every operation is
idempotent by tag, so the drill asserts crash-resumability from
arbitrary points, the exact property the v3 generation-pointer commit
protocol claims.

  python tools/ann_churn_run.py 100000

Verdict checks (all hard-asserted, printed as one JSON line):
  - zero serve errors while mutations and kills were in flight
  - final codes tree holds EXACTLY the expected live set (base ∪ appends
    − deletes + the re-insert), each id exactly once — no lost live row,
    no resurrected dead row
  - both ledgers contain every tag; replaying every feed is a no-op
  - no pending tombstones after the final fold; a final serve returns
    no deleted neighbor
Recorded in BASELINE.md §ann-serving (churn drill).
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

from above_gate_run import synth_dir  # noqa: E402

# the deterministic churn feed (ids are vec_id predicates):
#   base   = vec_id % 5 != 0
#   append-<i> = vec_id % 5 == 0 and vec_id % 3 == i   (i = 0, 1, 2)
#   del-a  = vec_id % 17 == 3
#   del-b  = vec_id % 23 == 5   (overlaps del-a: the double-decrement leg)
#   reinsert = the 10 smallest del-a ids, re-appended AFTER both deletes
N_REINSERT = 10

# mutator op sequence (each idempotent by tag; replayed from the top
# after every kill)
OPS = [
    ("append", "append-0"),
    ("delete", "del-a"),
    ("append", "append-1"),
    ("compact", ""),
    ("delete", "del-b"),
    ("append", "append-2"),
    ("reinsert", "reinsert-x"),
    ("compact", ""),
]

# seconds after mutator launch at which the parent SIGKILLs it; one
# entry per crash round, then a final uninterrupted pass.  Staggered so
# the kills sample different windows (session startup, mid-append,
# mid-compact, between rename and meta write).
KILL_AFTER = [12.0, 18.0, 24.0, 31.0, 39.0]


def _splits(spark, sf_dir):
    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.sources import table

    raw = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = raw.where(F.col("vec_id") % 5 != 0)
    appends = {
        f"append-{i}": raw.where(
            (F.col("vec_id") % 5 == 0) & (F.col("vec_id") % 3 == i)
        )
        for i in range(3)
    }
    dels = {
        "del-a": raw.where(F.col("vec_id") % 17 == 3).select("vec_id"),
        "del-b": raw.where(F.col("vec_id") % 23 == 5).select("vec_id"),
    }
    return raw, base, appends, dels


def _reinsert_ids(n: int) -> list[int]:
    # re-insert candidates must be ids del-a EFFECTIVELY deleted —
    # i.e. present in a batch del-a covers (base ∪ append-0; deletes
    # are SEQUENCED, so del ids living only in later appends are
    # correctly untouched).  Re-appending a never-deleted id would
    # legitimately duplicate it, which is not the leg under test.
    out = [
        v for v in range(n)
        if v % 17 == 3 and (v % 5 != 0 or v % 3 == 0)
    ]
    return out[:N_REINSERT]


def mutator(n: int, path: str) -> None:
    """Child entrypoint: replay the whole op feed (idempotent)."""
    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.operators import ann_index as ai
    from affinity_propagation_mapreduce_spark.session import get_spark

    sf_dir = synth_dir(n)
    spark = get_spark(f"ann-churn-mut-{n}")
    spark.sparkContext.setLogLevel("ERROR")
    raw, _base, appends, dels = _splits(spark, sf_dir)
    rids = _reinsert_ids(n)
    for op, tag in OPS:
        if op == "append":
            ai.append_ann_index(spark, path, appends[tag], tag)
        elif op == "delete":
            ai.delete_ann_index(spark, path, dels[tag], tag)
        elif op == "reinsert":
            ai.append_ann_index(
                spark, path, raw.where(F.col("vec_id").isin(rids)), tag
            )
        elif op == "compact":
            ai.compact_ann_index(spark, path)
    print("MUTATOR_FEED_COMPLETE", flush=True)


def server(n: int, path: str, stop_flag: str) -> None:
    """Child entrypoint: serve in a loop until the flag file appears.
    Every serve must return rows for every query; any exception is a
    drill failure (printed, nonzero exit)."""
    from affinity_propagation_mapreduce_spark.operators import ann_index as ai
    from affinity_propagation_mapreduce_spark.session import get_spark

    sf_dir = synth_dir(n)
    spark = get_spark(f"ann-churn-srv-{n}")
    spark.sparkContext.setLogLevel("ERROR")
    qids, qmat, qnrm = ai._query_rows(spark, sf_dir, n_queries=8)
    serves = 0
    while not os.path.exists(stop_flag):
        res = ai.search_ann_index(spark, path, qids, qmat, qnrm)
        per_q = res.groupBy("query_id").count().count()
        assert per_q == len(qids), f"serve returned {per_q}/{len(qids)} queries"
        serves += 1
        print(f"SERVES={serves}", flush=True)
    print(f"SERVER_CLEAN serves={serves}", flush=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    if len(sys.argv) > 2 and sys.argv[2] == "--mutator":
        mutator(n, sys.argv[3])
        return
    if len(sys.argv) > 2 and sys.argv[2] == "--server":
        server(n, sys.argv[3], sys.argv[4])
        return

    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.operators import ann_index as ai
    from affinity_propagation_mapreduce_spark.session import get_spark

    sf_dir = synth_dir(n)
    spark = get_spark(f"ann-churn-{n}")
    spark.sparkContext.setLogLevel("ERROR")
    raw, base, appends, dels = _splits(spark, sf_dir)
    path = f"/tmp/spark_graft_ann/churn-n{n}"
    shutil.rmtree(path, ignore_errors=True)
    for f in (f"{path}.lock", f"{path}.flag"):
        try:
            os.remove(f)
        except OSError:
            pass
    t0 = time.monotonic()
    ai.build_ann_index(spark, sf_dir, path=path, emb_raw=base)
    build_sec = round(time.monotonic() - t0, 1)

    me = os.path.abspath(__file__)
    stop_flag = f"{path}.flag"
    srv = subprocess.Popen(
        [sys.executable, me, str(n), "--server", path, stop_flag],
        start_new_session=True,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    kills = 0
    t0 = time.monotonic()
    try:
        for kill_after in KILL_AFTER:
            child = subprocess.Popen(
                [sys.executable, me, str(n), "--mutator", path],
                start_new_session=True,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            try:
                child.wait(timeout=kill_after)
                break  # feed completed before this kill point
            except subprocess.TimeoutExpired:
                os.killpg(os.getpgid(child.pid), signal.SIGKILL)
                child.wait()
                kills += 1
        else:
            # final uninterrupted pass: the feed must complete
            rc = subprocess.run(
                [sys.executable, me, str(n), "--mutator", path],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            ).returncode
            assert rc == 0, f"final mutator pass failed rc={rc}"
    finally:
        with open(stop_flag, "w"):
            pass
        srv_out, _ = srv.communicate(timeout=600)
    churn_sec = round(time.monotonic() - t0, 1)
    assert srv.returncode == 0, f"server crashed during churn:\n{srv_out[-2000:]}"
    serves = sum(1 for ln in srv_out.splitlines() if ln.startswith("SERVES="))
    assert serves > 0, "server never completed a serve during the churn"

    # ---- final verification (quiesced) -----------------------------------
    comp = ai.compact_ann_index(spark, path)  # quiesce: fold anything pending
    meta = ai._read_meta(path)
    rids = _reinsert_ids(n)
    # the expected dead set honors delete SEQUENCING: del-a (applied
    # after append-0) covers base ∪ append-0; del-b (applied after
    # append-1) covers base ∪ append-0 ∪ append-1; ids matching the
    # delete predicates that live only in later appends stay live
    in_cover_a = (F.col("vec_id") % 5 != 0) | (F.col("vec_id") % 3 == 0)
    in_cover_b = (F.col("vec_id") % 5 != 0) | (F.col("vec_id") % 3 != 2)
    deleted = (
        dels["del-a"].where(in_cover_a)
        .union(dels["del-b"].where(in_cover_b))
        .distinct()
        .where(~F.col("vec_id").isin(rids))
    )
    expected = (
        base.select("vec_id")
        .union(appends["append-0"].select("vec_id"))
        .union(appends["append-1"].select("vec_id"))
        .union(appends["append-2"].select("vec_id"))
        .join(deleted, "vec_id", "left_anti")
    ).distinct()
    n_expected = expected.count()
    codes = spark.read.parquet(ai.codes_root(path))
    n_codes = codes.count()
    n_ids = codes.select("vec_id").distinct().count()
    missing = expected.join(codes.select("vec_id"), "vec_id", "left_anti").count()
    extra = codes.select("vec_id").join(expected, "vec_id", "left_anti").count()
    assert missing == 0, f"{missing} live rows LOST"
    assert extra == 0, f"{extra} dead rows RESURRECTED"
    assert n_codes == n_ids == n_expected, (n_codes, n_ids, n_expected)
    for tag in ("append-0", "append-1", "append-2", "reinsert-x"):
        assert tag in meta["batches"], f"batch ledger lost {tag}"
        assert ai.append_ann_index(spark, path, appends.get(tag) or raw.limit(0), tag) == 0
    for tag in ("del-a", "del-b"):
        assert tag in meta["deletes"], f"delete ledger lost {tag}"
        assert ai.delete_ann_index(spark, path, dels[tag], tag) == 0
    assert not ai._tombstone_dirs(path), "tombstones pending after final fold"
    qids, qmat, qnrm = ai._query_rows(spark, sf_dir, n_queries=50)
    res = ai.search_ann_index(spark, path, qids, qmat, qnrm)
    dead_served = (
        res.join(deleted.withColumnRenamed("vec_id", "neighbor_id"),
                 "neighbor_id", "left_semi").count()
    )
    assert dead_served == 0, f"{dead_served} dead neighbors served"
    print(json.dumps({
        "n": n,
        "build_sec": build_sec,
        "churn_sec": churn_sec,
        "kills": kills,
        "serves_during_churn": serves,
        "generation": meta["generation"],
        "rows_live": n_codes,
        "rows_expected": n_expected,
        "dead_neighbors_served": 0,
        "ledgers_consistent": True,
    }), flush=True)


# ---- compaction-race variant (r11 verdict "missing" #2 done-criterion) ----
#
#   python tools/ann_churn_run.py 100000 --race
#
# A STORE_RAW layout (so serves exercise the full one-snapshot path:
# shortlist + tombstone anti-join + raw rerank) is hammered by a racer
# that appends a slice, compacts, deletes the previous slice, compacts —
# every iteration flips the generation TWICE — while a reader serves
# continuously via serve_topk.  Asserts zero serve errors across the
# generation churn and the exact sequenced live set at the end.

RACE_ROUNDS = 8
RACE_MOD = 101  # slice i = vec_id % RACE_MOD == i; base = the rest


def _race_slices(spark, sf_dir):
    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.sources import table

    raw = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = raw.where(F.col("vec_id") % RACE_MOD >= RACE_ROUNDS)
    slices = {
        i: raw.where(F.col("vec_id") % RACE_MOD == i)
        for i in range(RACE_ROUNDS)
    }
    return raw, base, slices


def race_server(n: int, path: str, stop_flag: str) -> None:
    from affinity_propagation_mapreduce_spark.operators import ann_index as ai
    from affinity_propagation_mapreduce_spark.session import get_spark

    sf_dir = synth_dir(n)
    spark = get_spark(f"ann-race-srv-{n}")
    spark.sparkContext.setLogLevel("ERROR")
    qids, qmat, qnrm = ai._query_rows(spark, sf_dir, n_queries=8)
    serves = 0
    while not os.path.exists(stop_flag):
        # the full serving pipeline on the raw layout: one model
        # snapshot end-to-end, raw rerank from probed partitions
        res = ai.serve_topk(spark, path, qids, qmat, qnrm)
        per_q = res.groupBy("query_id").count().count()
        assert per_q == len(qids), f"serve returned {per_q}/{len(qids)} queries"
        serves += 1
        print(f"SERVES={serves}", flush=True)
    print(f"SERVER_CLEAN serves={serves}", flush=True)


def race_main(n: int) -> None:
    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.operators import ann_index as ai
    from affinity_propagation_mapreduce_spark.session import get_spark

    sf_dir = synth_dir(n)
    spark = get_spark(f"ann-race-{n}")
    spark.sparkContext.setLogLevel("ERROR")
    raw, base, slices = _race_slices(spark, sf_dir)
    path = f"/tmp/spark_graft_ann/race-n{n}"
    shutil.rmtree(path, ignore_errors=True)
    for f in (f"{path}.lock", f"{path}.flag"):
        try:
            os.remove(f)
        except OSError:
            pass
    t0 = time.monotonic()
    ai.build_ann_index(spark, sf_dir, path=path, emb_raw=base, store_raw=True)
    build_sec = round(time.monotonic() - t0, 1)

    me = os.path.abspath(__file__)
    stop_flag = f"{path}.flag"
    srv = subprocess.Popen(
        [sys.executable, me, str(n), "--race-server", path, stop_flag],
        start_new_session=True,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    gen0 = ai._gen_of(ai._read_meta(path))
    t0 = time.monotonic()
    try:
        for i in range(RACE_ROUNDS):
            ai.append_ann_index(spark, path, slices[i], f"race-a{i}")
            ai.compact_ann_index(spark, path)
            if i > 0:
                ai.delete_ann_index(spark, path, slices[i - 1], f"race-d{i - 1}")
                ai.compact_ann_index(spark, path)
    finally:
        with open(stop_flag, "w"):
            pass
        srv_out, _ = srv.communicate(timeout=600)
    race_sec = round(time.monotonic() - t0, 1)
    assert srv.returncode == 0, f"server crashed during race:\n{srv_out[-2000:]}"
    serves = sum(1 for ln in srv_out.splitlines() if ln.startswith("SERVES="))
    assert serves > 0, "server never completed a serve during the race"

    meta = ai._read_meta(path)
    flips = ai._gen_of(meta) - gen0
    assert flips == 2 * RACE_ROUNDS - 1, f"expected {2*RACE_ROUNDS-1} flips, got {flips}"
    # sequenced live set: base ∪ last slice (every earlier slice was
    # deleted AFTER its append, so its cover includes it)
    expected = base.select("vec_id").union(
        slices[RACE_ROUNDS - 1].select("vec_id")
    )
    n_expected = expected.count()
    codes = spark.read.parquet(ai.codes_root(path))
    n_codes = codes.count()
    missing = expected.join(codes.select("vec_id"), "vec_id", "left_anti").count()
    extra = codes.select("vec_id").join(expected, "vec_id", "left_anti").count()
    assert missing == 0, f"{missing} live rows LOST across the race"
    assert extra == 0, f"{extra} dead rows RESURRECTED across the race"
    assert n_codes == n_expected, (n_codes, n_expected)
    assert not ai._tombstone_dirs(path), "tombstones pending after final fold"
    print(json.dumps({
        "mode": "compact-race",
        "n": n,
        "build_sec": build_sec,
        "race_sec": race_sec,
        "generation_flips": flips,
        "serves_during_race": serves,
        "rows_live": n_codes,
        "rows_expected": n_expected,
        "ledgers_consistent": True,
    }), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "--race":
        race_main(int(sys.argv[1]))
    elif len(sys.argv) > 2 and sys.argv[2] == "--race-server":
        race_server(int(sys.argv[1]), sys.argv[3], sys.argv[4])
    else:
        main()
