"""Round 15: the unified lakehouse table layer (versioned sharded
manifests surviving append/compact/MERGE, bloom sidecars, read-grace
retention), plus the r14-advice hardening of the write-once layouts
(drift guard, bound-type validation, typed bloom probes)."""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _tmp(name: str) -> str:
    return f"/tmp/spark_graft_tests/r15_{name}_{uuid.uuid4().hex[:8]}"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(os.path.join(SF_SMALL, "lineitem.parquet")).select(
        "l_shipdate", "l_orderkey", "l_returnflag", "l_quantity"
    )


@pytest.fixture(scope="module")
def customer(spark):
    return spark.read.parquet(os.path.join(SF_SMALL, "customer.parquet")).select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )


# --- write-once layout hardening (r14 advice) --------------------------------


def test_write_once_drift_guard_raises(spark, lineitem):
    from affinity_propagation_mapreduce_spark.sources.io import (
        scan_clustered,
        write_clustered_table,
    )

    base = _tmp("drift")
    write_clustered_table(lineitem, base, "l_shipdate", n_files=4)
    df, st = scan_clustered(spark, base, lower="1995-01-01 00:00:00")
    assert st["files_total"] == 4
    # simulate a second writer dropping a file into the layout
    victim = [f for f in os.listdir(base) if f.endswith(".parquet")][0]
    shutil.copy(
        os.path.join(base, victim), os.path.join(base, "part-rogue.parquet")
    )
    with pytest.raises(RuntimeError, match="manifest drift"):
        scan_clustered(spark, base, lower="1995-01-01 00:00:00")
    shutil.rmtree(base)


def test_bound_type_mismatch_raises(spark, lineitem):
    from affinity_propagation_mapreduce_spark.sources.io import (
        scan_clustered,
        write_clustered_table,
    )

    base = _tmp("btype")
    write_clustered_table(lineitem, base, "l_shipdate", n_files=4)
    # timestamp key renders as string in the manifest; a numeric bound
    # must fail fast with the descriptive error, not a bare TypeError
    with pytest.raises(ValueError, match="rendering"):
        scan_clustered(spark, base, lower=12345)
    shutil.rmtree(base)


def test_bloom_probe_typed_cast(spark, lineitem):
    """Probing a BIGINT bloom column with a Python float used to hash
    '5.0' vs the build's '5' — a silent false negative.  The probe is
    now cast to the stored type: float and int probes agree."""
    from affinity_propagation_mapreduce_spark.sources.io import (
        scan_clustered_point,
        write_clustered_table_with_blooms,
    )

    base = _tmp("bprobe")
    write_clustered_table_with_blooms(
        lineitem, base, "l_shipdate", bloom_for=["l_orderkey"], n_files=4
    )
    k = lineitem.agg(F.min("l_orderkey")).first()[0]
    df_i, st_i = scan_clustered_point(spark, base, "l_orderkey", int(k))
    df_f, st_f = scan_clustered_point(spark, base, "l_orderkey", float(k))
    assert df_i.count() == df_f.count() > 0
    assert st_i["files_kept"] == st_f["files_kept"]
    shutil.rmtree(base)


# --- lakehouse: lifecycle ------------------------------------------------------


def test_lakehouse_append_grows_manifest_by_reference(spark, lineitem):
    from affinity_propagation_mapreduce_spark.sources import lakehouse as lh

    base = _tmp("grow")
    a = lineitem.where(F.col("l_orderkey") % 2 == 0)
    b = lineitem.where(F.col("l_orderkey") % 2 == 1)
    lh.create_table(a, base, "l_shipdate", n_files=4)
    lst0 = lh._read_list(base, 0)
    lh.append_table(b, base, n_files=2)
    lst1 = lh._read_list(base, 1)
    # old shards are REUSED by reference: same shard file names prefix the list
    old = {s["shard"] for s in lst0["shards"]}
    assert old <= {s["shard"] for s in lst1["shards"]}
    assert len(lst1["shards"]) > len(lst0["shards"])
    full, st = lh.read_table(spark, base)
    assert full.count() == lineitem.count()
    shutil.rmtree(base)


def test_lakehouse_compact_preserves_rows_and_time_travel(spark, lineitem):
    from affinity_propagation_mapreduce_spark.sources import lakehouse as lh

    base = _tmp("compact")
    lh.create_table(lineitem, base, "l_shipdate", n_files=8)
    st0 = lh.head_stats(base)
    lh.compact_table(spark, base, target_bytes=st0["bytes"] // 3 + 1)
    st1 = lh.head_stats(base)
    assert st1["files"] < st0["files"]
    assert st1["rows"] == st0["rows"]
    v0, _ = lh.read_table(spark, base, version=0)
    head, _ = lh.read_table(spark, base)
    assert v0.count() == head.count() == lineitem.count()
    shutil.rmtree(base)


def test_lakehouse_merge_legs(spark, customer):
    """Update, delete, and out-of-range insert through the COW merge;
    only range-affected files rewrite."""
    from affinity_propagation_mapreduce_spark.sources import lakehouse as lh

    base = _tmp("merge")
    lh.create_table(customer, base, "c_custkey", n_files=8)
    k = customer.agg(F.min("c_custkey")).first()[0]
    upd = customer.where(F.col("c_custkey") == k).select(
        "c_custkey", "c_name", "c_mktsegment", F.lit(-1.0).alias("c_acctbal")
    ).withColumn("op", F.lit("U"))
    res = lh.merge_table(spark, base, upd)
    assert res["files_rewritten"] == 1 and res["files_total"] == 8
    head, _ = lh.read_table(spark, base)
    assert head.where(F.col("c_custkey") == k).first().c_acctbal == -1.0
    assert head.count() == customer.count()

    dele = upd.withColumn("op", F.lit("D"))
    lh.merge_table(spark, base, dele)
    head, _ = lh.read_table(spark, base)
    assert head.where(F.col("c_custkey") == k).count() == 0
    assert head.count() == customer.count() - 1

    ins = spark.createDataFrame(
        [(10**9, "brand-new", "NEW", 5.0, "U")],
        "c_custkey long, c_name string, c_mktsegment string, "
        "c_acctbal double, op string",
    )
    ri = lh.merge_table(spark, base, ins)
    head, _ = lh.read_table(spark, base)
    assert head.where(F.col("c_custkey") == 10**9).count() == 1
    assert head.count() == customer.count()
    shutil.rmtree(base)


def test_lakehouse_merge_rejects_duplicate_key_feed(spark, customer):
    """A change feed with multiple rows per key would FAN OUT the
    outer join (silent row inflation) — merge_table enforces the CDC
    one-row-per-key contract up front."""
    from affinity_propagation_mapreduce_spark.sources import lakehouse as lh

    base = _tmp("mdup")
    lh.create_table(customer, base, "c_custkey", n_files=4)
    k = customer.agg(F.min("c_custkey")).first()[0]
    one = customer.where(F.col("c_custkey") == k).withColumn(
        "op", F.lit("U")
    )
    dup = one.unionByName(one)
    with pytest.raises(ValueError, match="one row per key"):
        lh.merge_table(spark, base, dup)
    shutil.rmtree(base)


def test_lakehouse_shard_pruning(spark, lineitem, monkeypatch):
    """With tiny shards, a selective scan opens only the OVERLAPPING
    shard files — the manifest-open cost the sharding exists for."""
    from affinity_propagation_mapreduce_spark.sources import lakehouse as lh

    monkeypatch.setattr(lh, "SHARD_FILES", 2)
    base = _tmp("shards")
    lh.create_table(lineitem, base, "l_shipdate", n_files=12)
    plan = lh.plan_scan(
        base, lower="1995-03-01 00:00:00", upper="1995-06-30 00:00:00"
    )
    assert plan["shards_total"] == 6
    assert plan["shards_opened"] < plan["shards_total"]
    assert plan["files_kept"] <= 2 * plan["shards_opened"]
    df, st = lh.read_table(
        spark, base, lower="1995-03-01 00:00:00", upper="1995-06-30 00:00:00"
    )
    exact = lineitem.where(
        (F.col("l_shipdate") >= "1995-03-01") & (F.col("l_shipdate") <= "1995-06-30")
    ).count()
    assert df.count() == exact
    shutil.rmtree(base)


def test_lakehouse_bloom_sidecar_point_lookup(spark, lineitem):
    from affinity_propagation_mapreduce_spark.sources import lakehouse as lh

    base = _tmp("bloom")
    lh.create_table(
        lineitem, base, "l_shipdate", bloom_for=["l_orderkey"], n_files=6
    )
    k = lineitem.agg(F.min("l_orderkey")).first()[0]
    df, st = lh.read_table_point(spark, base, "l_orderkey", k)
    assert st["files_kept"] < st["files_total"]
    assert df.count() == lineitem.where(F.col("l_orderkey") == k).count()
    # typed probe: float probe of a BIGINT column must not false-negative
    df2, st2 = lh.read_table_point(spark, base, "l_orderkey", float(k))
    assert df2.count() == df.count()
    shutil.rmtree(base)


def test_lakehouse_expire_grace_and_reclaim(spark, customer):
    from affinity_propagation_mapreduce_spark.sources import lakehouse as lh

    base = _tmp("expire")
    lh.create_table(customer, base, "c_custkey", n_files=4)
    lh.compact_table(spark, base, target_bytes=10**9)  # v1: one file
    lh.compact_table(spark, base, target_bytes=10**9)  # v2
    # v0 aged, v1 freshly read
    s0 = os.path.join(base, "meta", "reads", "v0.last-read")
    if os.path.isfile(s0):
        os.utime(s0, (time.time() - 7200,) * 2)
    lh._stamp_read(base, 1)
    r1 = lh.expire_versions(base, keep_last=1, grace_seconds=3600)
    assert r1["dropped"] == [0]
    with pytest.raises(ValueError, match="expired or never committed"):
        lh.read_table(spark, base, version=0)
    v1, _ = lh.read_table(spark, base, version=1)  # grace survivor
    assert v1.count() == customer.count()
    r2 = lh.expire_versions(base, keep_last=1, grace_seconds=0.0)
    assert r2["dropped"] == [1]
    n_disk = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _d, _s, fs in os.walk(base)
    )
    assert n_disk == lh.head_stats(base)["files"]
    head, _ = lh.read_table(spark, base)
    assert head.count() == customer.count()
    shutil.rmtree(base)


def test_lakehouse_crash_atomicity(spark, customer):
    """A batch landed without a committed version (simulated crash
    between land and log commit) is INVISIBLE to readers and reclaimed
    by expire's orphan sweep... the log is the single commit point."""
    from affinity_propagation_mapreduce_spark.sources import lakehouse as lh

    base = _tmp("crash")
    lh.create_table(customer, base, "c_custkey", n_files=4)
    # simulate: a writer landed a batch dir then died before commit
    orphan = lh._land_batch(
        customer.limit(10), base, "c_custkey", 1
    )
    assert os.path.isdir(orphan)
    head, st = lh.read_table(spark, base)
    assert head.count() == customer.count()  # orphan invisible
    assert st["files_total"] == 4
    # a FRESH orphan survives the age-gated vacuum (it may be an
    # in-flight writer about to commit) …
    r = lh.vacuum(base, orphan_age_seconds=3600)
    assert r["data_files_deleted"] == 0
    assert os.path.isdir(orphan)
    # … an aged one is reclaimed
    r = lh.vacuum(base, orphan_age_seconds=0.0)
    assert r["data_files_deleted"] >= 1
    assert not os.path.isdir(orphan)
    head2, _ = lh.read_table(spark, base)
    assert head2.count() == customer.count()
    shutil.rmtree(base)


# --- z-order string dimensions (r14 missing #5) --------------------------------


def test_zorder_string_dimension_prunes(spark, customer):
    """A string z-order dim must prune on its own: write customer
    z-ordered on (c_name, c_acctbal), assert a name-band-only scan
    keeps a strict file subset AND returns exactly the predicate's
    rows."""
    from affinity_propagation_mapreduce_spark.sources.io import (
        scan_zordered,
        write_zordered_table,
    )

    base = _tmp("zstr")
    write_zordered_table(
        customer.select("c_name", "c_acctbal", "c_mktsegment"),
        base,
        ["c_name", "c_acctbal"],
        n_files=8,
    )
    lo, hi = "Customer#000000020", "Customer#000000060"
    df, st = scan_zordered(spark, base, {"c_name": (lo, hi)})
    assert st["files_kept"] < st["files_total"]
    exact = customer.where(
        (F.col("c_name") >= lo) & (F.col("c_name") <= hi)
    ).count()
    assert df.count() == exact > 0
    shutil.rmtree(base)


def test_zorder_string_boundaries_deterministic(spark, customer):
    from affinity_propagation_mapreduce_spark.sources.io import (
        _string_rank_bounds,
    )

    b1 = _string_rank_bounds(customer, "c_name", 16)
    b2 = _string_rank_bounds(customer, "c_name", 16)
    assert b1 == b2
    assert b1 == sorted(b1)
    assert 1 <= len(b1) <= 15


# --- JPEG 4:2:0 + restart intervals (r14 missing #4) ----------------------------


def _smooth_img(h, w, ph):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    return (
        np.stack(
            [
                128 + 100 * np.sin(xx / 16.0 + ph),
                128 + 90 * np.cos(yy / 14.0 + 2 * ph),
                128 + 80 * np.sin((xx + yy) / 22.0 + 3 * ph),
            ],
            axis=-1,
        )
        .clip(0, 255)
        .astype(np.uint8)
    )


import numpy as np  # noqa: E402


def test_jpeg_420_round_trip_bounded():
    from affinity_propagation_mapreduce_spark.operators.multimodal import (
        JPEG_MAX_ABS_ERR_420,
        JPEG_MEAN_ABS_ERR_420,
        decode_jpeg,
        encode_jpeg,
    )

    for ph in (0, 5, 41):
        img = _smooth_img(40, 56, ph)
        dec = decode_jpeg(encode_jpeg(img, subsample="420"))
        assert dec.shape == img.shape
        err = np.abs(dec.astype("i4") - img.astype("i4")).max(axis=2)
        assert int(err.max()) <= JPEG_MAX_ABS_ERR_420
        assert float(err.mean()) <= JPEG_MEAN_ABS_ERR_420


def test_jpeg_restart_intervals_resync():
    """A DRI stream must decode identically to the no-restart stream —
    and the decoder must actually consume RST markers (byte counts
    differ)."""
    from affinity_propagation_mapreduce_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    img = _smooth_img(48, 64, 9)
    plain = encode_jpeg(img, subsample="420")
    rst = encode_jpeg(img, subsample="420", restart_mcus=1)
    assert rst != plain and b"\xff\xdd" in rst
    assert np.array_equal(decode_jpeg(rst), decode_jpeg(plain))


def test_jpeg_420_non_mcu_aligned_dims():
    """Odd dims exercise the edge-replicate padding + crop on the
    16x16 MCU grid."""
    from affinity_propagation_mapreduce_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    img = _smooth_img(37, 51, 3)
    dec = decode_jpeg(encode_jpeg(img, subsample="420", restart_mcus=2))
    assert dec.shape == (37, 51, 3)


def test_jpeg_422_round_trip_bounded():
    from affinity_propagation_mapreduce_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    img = _smooth_img(40, 56, 11)
    dec = decode_jpeg(encode_jpeg(img, subsample="422", restart_mcus=2))
    assert dec.shape == img.shape
    err = np.abs(dec.astype("i4") - img.astype("i4"))
    # horizontal-only chroma halving loses less than 4:2:0
    assert int(err.max()) <= 20 and float(err.mean()) <= 5.0


def test_jpeg_progressive_still_raises():
    from affinity_propagation_mapreduce_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    payload = bytearray(encode_jpeg(_smooth_img(16, 16, 1)))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2  # rebrand SOF0 as progressive SOF2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(payload))


# --- the new declared keys run green end-to-end --------------------------------


def test_lakehouse_zorder_boxes_survive_mutation(spark, lineitem):
    """A z-ordered lakehouse table keeps multi-dimensional pruning
    through append + compaction: a quantity-only range must prune
    files at the head even though the cluster key is l_shipdate."""
    from affinity_propagation_mapreduce_spark.sources import lakehouse as lh

    base = _tmp("zlake")
    li = lineitem  # l_shipdate, l_orderkey, l_returnflag, l_quantity
    a = li.where(F.col("l_orderkey") % 2 == 0)
    b = li.where(F.col("l_orderkey") % 2 == 1)
    lh.create_table(
        a, base, "l_shipdate", n_files=6,
        zorder_by=["l_shipdate", "l_quantity"],
    )
    lh.append_table(b, base, n_files=3)
    st = lh.head_stats(base)
    lh.compact_table(spark, base, target_bytes=st["bytes"] // 6 + 1)
    df, stats = lh.read_table(spark, base, ranges={"l_quantity": (1.0, 10.0)})
    assert stats["files_kept"] < stats["files_total"]
    exact = li.where(
        (F.col("l_quantity") >= 1.0) & (F.col("l_quantity") <= 10.0)
    ).count()
    assert df.count() == exact > 0
    # COW merge works identically on the z layout (update-all-matching)
    k = li.agg(F.min("l_shipdate")).first()[0]
    ch = li.where(F.col("l_shipdate") == k).select(
        "l_shipdate", "l_orderkey", "l_returnflag",
        F.lit(-5.0).alias("l_quantity"),
    ).withColumn("op", F.lit("U"))
    res = lh.merge_table(spark, base, ch)
    assert res["files_rewritten"] < res["files_total"]
    head, _ = lh.read_table(spark, base)
    assert head.where(F.col("l_quantity") == -5.0).count() == ch.count()
    assert head.count() == li.count()
    # and the z boxes are still there for the NEXT scan
    _df2, st2 = lh.read_table(spark, base, ranges={"l_quantity": (1.0, 10.0)})
    assert st2["files_kept"] < st2["files_total"]
    shutil.rmtree(base)


def test_lakehouse_zorder_unknown_dim_raises(spark, customer):
    from affinity_propagation_mapreduce_spark.sources import lakehouse as lh

    base = _tmp("zdim")
    lh.create_table(
        customer, base, "c_custkey", n_files=4,
        zorder_by=["c_custkey", "c_acctbal"],
    )
    with pytest.raises(ValueError, match="not a clustered dimension"):
        lh.read_table(spark, base, ranges={"c_nationkey": (0, 3)})
    shutil.rmtree(base)


def test_lakehouse_concurrent_appends_serialize(spark, customer):
    """Two writers appending at once must BOTH land: the commit flock
    serializes the log read→commit window (without it both read head N
    and both commit N+1 — one version silently vanishes)."""
    import threading

    from affinity_propagation_mapreduce_spark.sources import lakehouse as lh

    base = _tmp("conc")
    lh.create_table(customer.limit(10), base, "c_custkey", n_files=1)
    slices = [
        customer.where(F.col("c_custkey") % 6 == i).localCheckpoint(eager=True)
        for i in range(6)
    ]
    errs = []

    def writer(tid):
        try:
            for i in range(3):
                lh.append_table(slices[tid * 3 + i], base, n_files=1)
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    threads = [threading.Thread(target=writer, args=(t,)) for t in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    log = lh._read_log(base)
    assert sum(1 for v in log["versions"] if v["op"] == "append") == 6
    assert log["head"] == 6
    head, _ = lh.read_table(spark, base)
    assert head.count() == customer.count() + 10
    shutil.rmtree(base)


def test_lakehouse_idempotent_append(spark, customer):
    from affinity_propagation_mapreduce_spark.sources import lakehouse as lh

    base = _tmp("idem")
    half_a = customer.where(F.col("c_custkey") % 2 == 0)
    half_b = customer.where(F.col("c_custkey") % 2 == 1)
    lh.create_table(half_a, base, "c_custkey", n_files=2)
    r1 = lh.append_table(half_b, base, dedup_id="epoch-7")
    assert not r1.get("skipped")
    r2 = lh.append_table(half_b, base, dedup_id="epoch-7")  # re-delivery
    assert r2["skipped"] and r2["files_added"] == 0
    head, _ = lh.read_table(spark, base)
    assert head.count() == customer.count()  # no duplication
    shutil.rmtree(base)


@pytest.mark.parametrize(
    "key",
    [
        "table_lifecycle",
        "table_zorder_lifecycle",
        "table_merge_cow",
        "table_retention",
        "table_stream_append",
        "scan_zorder_string_skip",
    ],
)
def test_new_keys_run(spark, key):
    from affinity_propagation_mapreduce_spark import registry

    df = registry.queries()[key](spark, SF_SMALL)
    assert df.count() > 0
