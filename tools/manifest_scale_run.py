"""Manifest scalability drill (r14 verdict "missing" #2 / next-round #2).

The r14 write-once layouts kept ONE driver-side JSON with every file
entry and 16 KiB inline base64 blooms — fine at 16 files, the next
100× bottleneck at the 10⁵–10⁶ files a 100 TB table holds (GBs parsed
per scan).  The lakehouse layer shards the manifest (manifest-list +
SHARD_FILES-entry shards + sidecar blooms); this drill SYNTHESIZES
layout metadata at 10⁴–10⁵ files (plan_scan never touches data, so
entries can point at phantom paths) and measures the driver-side
planning cost of a selective range scan:

* sharded: open the list, prune shards by aggregate range, parse only
  overlapping shard files — cost must stay O(overlapping shards) as
  the file count grows 10×;
* monolithic (the r14 shape, simulated): parse one JSON holding every
  entry with an inline 16 KiB bloom each — cost grows O(files).

Usage: python tools/manifest_scale_run.py [n_files ...]  (default 10000 100000)
Prints one JSON line per (n_files, layout) for BASELINE.md.
"""

from __future__ import annotations

import base64
import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from affinity_propagation_mapreduce_spark.sources import lakehouse as lh

KEY_SPAN = 100          # each phantom file owns a disjoint key range
SCAN_FILES = 16         # the selective scan targets ~16 files' worth of keys
BLOOM_B64 = base64.b64encode(os.urandom(16 * 1024)).decode()  # r14-shaped inline bloom


def synth_sharded(path: str, n_files: int) -> None:
    """A lakehouse meta layout with n_files phantom entries, committed
    exactly as create_table would commit them (shards + list + log)."""
    os.makedirs(lh._meta(path), exist_ok=True)
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    entries = [
        {
            "file": f"file:///phantom/{i:08d}.parquet",
            "rows": 10_000,
            "bytes": 128 << 20,
            "min": i * KEY_SPAN,
            "max": i * KEY_SPAN + KEY_SPAN - 1,
        }
        for i in range(n_files)
    ]
    shards = lh._make_shards(path, entries, None)
    lh._commit_log(path, {"versions": [], "head": -1})
    lst = {"v": 0, "op": "create", "cluster_by": "k", "shards": shards}
    name = lh._write_json(path, "list-v0.json", lst)
    log = {
        "versions": [
            {
                "v": 0,
                "list": name,
                "op": "create",
                "cluster_by": "k",
                "bloom_for": [],
                "rows": sum(s["rows"] for s in shards),
                "files": sum(s["files"] for s in shards),
            }
        ],
        "head": 0,
    }
    lh._commit_log(path, log)


def synth_monolithic(path: str, n_files: int) -> str:
    """The r14 write-once shape: ONE json, every entry inline, a 16 KiB
    base64 bloom per entry (shared string here — parse cost is what's
    measured, not entropy)."""
    os.makedirs(path, exist_ok=True)
    manifest = {
        "cluster_by": "k",
        "bloom_for": ["id"],
        "files": [
            {
                "file": f"file:///phantom/{i:08d}.parquet",
                "rows": 10_000,
                "min": i * KEY_SPAN,
                "max": i * KEY_SPAN + KEY_SPAN - 1,
                "bloom": {"id": BLOOM_B64},
            }
            for i in range(n_files)
        ],
    }
    p = os.path.join(path, "_scan_manifest.json")
    with open(p, "w") as fh:
        json.dump(manifest, fh)
    return p


def plan_monolithic(p: str, lo: int, hi: int) -> dict:
    """The r14 scan_clustered planning step, verbatim shape: parse the
    whole JSON, filter entries."""
    with open(p) as fh:
        manifest = json.load(fh)
    kept = [
        e
        for e in manifest["files"]
        if not (e["min"] > hi or e["max"] < lo)
    ]
    return {"files_kept": len(kept), "files_total": len(manifest["files"])}


def _morton(x: int, y: int) -> int:
    z = 0
    for b in range(16):
        z |= ((x >> b) & 1) << (2 * b + 1) | ((y >> b) & 1) << (2 * b)
    return z


def synth_sharded_z(path: str, n_files: int) -> int:
    """A Z-ORDERED lakehouse meta layout: files tile a √n × √n grid of
    (d1, d2) bounding boxes and are manifest-ordered by the Morton code
    of their tile — exactly the locality io.zorder_frame produces — so
    shard-level bounding boxes stay tight in BOTH dimensions.  Returns
    the grid side."""
    import math

    os.makedirs(lh._meta(path), exist_ok=True)
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    g = int(math.isqrt(n_files))
    tiles = sorted(
        ((gx, gy) for gx in range(g) for gy in range(g)),
        key=lambda t: _morton(*t),
    )
    entries = []
    for i, (gx, gy) in enumerate(tiles):
        d1_lo, d2_lo = gx * KEY_SPAN, gy * KEY_SPAN
        entries.append(
            {
                "file": f"file:///phantom/z{i:08d}.parquet",
                "rows": 10_000,
                "bytes": 128 << 20,
                "min": d1_lo,
                "max": d1_lo + KEY_SPAN - 1,
                "zmin": {"d1": d1_lo, "d2": d2_lo},
                "zmax": {
                    "d1": d1_lo + KEY_SPAN - 1,
                    "d2": d2_lo + KEY_SPAN - 1,
                },
            }
        )
    shards = lh._make_shards(path, entries, None)
    lh._commit_log(path, {"versions": [], "head": -1})
    lst = {"v": 0, "op": "create", "cluster_by": "d1", "shards": shards}
    name = lh._write_json(path, "list-v0.json", lst)
    lh._commit_log(
        path,
        {
            "versions": [
                {
                    "v": 0,
                    "list": name,
                    "op": "create",
                    "cluster_by": "d1",
                    "bloom_for": [],
                    "zorder_by": ["d1", "d2"],
                    "rows": sum(s["rows"] for s in shards),
                    "files": sum(s["files"] for s in shards),
                }
            ],
            "head": 0,
        },
    )
    return g


def z_drill(n_files: int) -> None:
    """2-D planning cost on a z layout: a band on the SECOND dimension
    (the one 1-D clustering cannot prune) must open only the shards
    whose Morton-local bounding boxes overlap."""
    base = f"/tmp/manifest_zdrill_{uuid.uuid4().hex[:8]}"
    g = synth_sharded_z(base, n_files)
    lo = (g // 2) * KEY_SPAN
    hi = lo + 2 * KEY_SPAN - 1  # a 2-tile-wide band on d2
    t0 = time.perf_counter()
    plan = lh.plan_scan(base, ranges={"d2": (lo, hi)})
    t = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "layout": "sharded-zorder",
                "n_files": g * g,
                "predicate": "d2-band (non-cluster dim)",
                "plan_sec": round(t, 4),
                "shards_total": plan["shards_total"],
                "shards_opened": plan["shards_opened"],
                "files_kept": plan["files_kept"],
            }
        )
    )
    shutil.rmtree(base)


def merge_drill() -> None:
    """COW-merge cost ∝ affected bytes, measured on real data: a
    64-file lakehouse table from sf0.1 lineitem (~600k rows, keyed
    l_orderkey), hit with a change feed confined to ~1% of the key
    space.  Prints rewritten-file count and wall — the quantity that
    must stay ∝ change locality, not table size."""
    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.session import get_spark

    spark = get_spark("lakehouse-merge-drill")
    spark.sparkContext.setLogLevel("ERROR")
    base = f"/tmp/lh_merge_drill_{uuid.uuid4().hex[:8]}"
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_returnflag", "l_quantity"
    )
    t0 = time.perf_counter()
    lh.create_table(li, base, "l_orderkey", n_files=64)
    t_create = time.perf_counter() - t0
    lo = li.agg({"l_orderkey": "min"}).first()[0]
    hi = li.agg({"l_orderkey": "max"}).first()[0]
    band_hi = lo + (hi - lo) // 100  # ~1% of the key space
    # ONE change row per key (the CDC contract merge_table enforces);
    # all of the key's lineitems update to the change row's values
    ch = (
        li.where(F.col("l_orderkey") <= band_hi)
        .groupBy("l_orderkey")
        .agg(
            F.min("l_shipdate").alias("l_shipdate"),
            F.min("l_returnflag").alias("l_returnflag"),
        )
        .select(
            "l_orderkey", "l_shipdate", "l_returnflag",
            F.lit(0.0).alias("l_quantity"),
        )
        .withColumn("op", F.lit("U"))
    )
    n_ch = li.where(F.col("l_orderkey") <= band_hi).count()  # rows updated
    t0 = time.perf_counter()
    res = lh.merge_table(spark, base, ch)
    t_merge = time.perf_counter() - t0
    head, _ = lh.read_table(spark, base)
    n_updated = head.where(F.col("l_quantity") == 0.0).count()
    assert n_updated == n_ch, (n_updated, n_ch)
    assert head.count() == li.count()
    print(
        json.dumps(
            {
                "phase": "merge_drill",
                "rows": head.count(),
                "files_total": res["files_total"],
                "files_rewritten": res["files_rewritten"],
                "files_added": res["files_added"],
                "changes": n_ch,
                "create_sec": round(t_create, 1),
                "merge_sec": round(t_merge, 1),
            }
        )
    )
    shutil.rmtree(base)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "merge":
        merge_drill()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "zorder":
        for n in [int(a) for a in sys.argv[2:]] or [10_000, 102_400]:
            z_drill(n)
        return
    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 100_000]
    for n in sizes:
        lo = (n // 2) * KEY_SPAN
        hi = lo + SCAN_FILES * KEY_SPAN - 1

        base = f"/tmp/manifest_drill_{uuid.uuid4().hex[:8]}"
        synth_sharded(base, n)
        t0 = time.perf_counter()
        plan = lh.plan_scan(base, lower=lo, upper=hi)
        t_shard = time.perf_counter() - t0
        meta_bytes = sum(
            os.path.getsize(os.path.join(lh._meta(base), f))
            for f in os.listdir(lh._meta(base))
        )
        print(
            json.dumps(
                {
                    "layout": "sharded",
                    "n_files": n,
                    "plan_sec": round(t_shard, 4),
                    "shards_total": plan["shards_total"],
                    "shards_opened": plan["shards_opened"],
                    "files_kept": plan["files_kept"],
                    "meta_mb": round(meta_bytes / 1e6, 2),
                }
            )
        )
        shutil.rmtree(base)

        mono = f"/tmp/manifest_mono_{uuid.uuid4().hex[:8]}"
        p = synth_monolithic(mono, n)
        t0 = time.perf_counter()
        r = plan_monolithic(p, lo, hi)
        t_mono = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "layout": "monolithic-r14",
                    "n_files": n,
                    "plan_sec": round(t_mono, 4),
                    "files_kept": r["files_kept"],
                    "meta_mb": round(os.path.getsize(p) / 1e6, 2),
                }
            )
        )
        shutil.rmtree(mono)


if __name__ == "__main__":
    main()
