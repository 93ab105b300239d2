"""Sharded-source ANN build at 10M × d=768 — round-12 verdict item #4.

The r11 rung measured d=768 only at 1M; this box cannot hold the 10M
corpus (29 GB), the raw serving store (~34 GB), AND a monolithic build's
cell shuffle (~33 GB) at once (the fs reserves all but ~94 GB for
another uid — `mount | grep resv_strict`).  Instead of shrinking the
measurement, build the index the way a 100 TB ingest actually runs:

  * the corpus arrives as SHARDS (8 files, ~1.3M vectors each);
  * shard 0 trains the quantizers and becomes the base layout, with
    ``n_hint`` sizing nlist for the EVENTUAL 10M corpus (without it the
    coarse quantizer would be sqrt-scaled to one shard and every cell
    would run 8x oversized for the life of the index);
  * shards 1..7 fold in as frozen-quantizer ``append_ann_index``
    batches — the daily-crawl shape, already crash-atomic + idempotent;
  * each source shard is DELETED once its append commits: the raw
    serving store (store_raw) supersedes the source, so peak disk is
    max(corpus-remaining + index-so-far + one shard's shuffle) ≈ 45 GB,
    never corpus+index+shuffle ≈ 96 GB.

Each phase runs in its OWN process (one SparkSession per invocation) so
shuffle scratch dies with the session instead of accumulating across
appends.  The query pool and the exact top-5 oracle are computed DURING
synthesis from the same deterministic (seed=11, chunk-lo) generator the
ladder corpora use — zero extra IO, and they survive the source's
retirement.

  python tools/ann_sharded_build.py synth
  python tools/ann_sharded_build.py check      # Spark brute-force vs exact.npz
  python tools/ann_sharded_build.py base
  python tools/ann_sharded_build.py append 1   # .. 7
  python tools/ann_sharded_build.py warm 10 5
  python tools/ann_sharded_build.py bulk 10000 [auto|throughput|recall]

Prints one JSON line per phase; results recorded in BASELINE.md
§ann-serving (round 12).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 10_000_000
D = 768
K_TRUE = 32
CHUNK = 250_000_000 // D  # 325,520 — same chunk seed grid as _synth_chunked
CHUNKS_PER_SHARD = 4      # 31 chunks -> 8 shards (last one has 3)
Q_POOL = 10_240           # vec_id < Q_POOL, all inside chunk 0
TOP_K = 5

BASE = "/tmp/above_gate/sharded-10m-768"
INDEX = os.path.join(BASE, "index-raw")


def _shard_path(s: int) -> str:
    return os.path.join(BASE, f"shard-{s:02d}.parquet")


def synth() -> dict:
    """Generate the 8 shard files + queries.npz + exact.npz in one pass.

    Chunk [lo, lo+CHUNK) is a pure function of (11, lo) — identical
    values to the monolithic _synth_chunked corpus, just routed to
    shard files at 4-chunk boundaries."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(BASE, exist_ok=True)
    base_rng = np.random.default_rng(11)
    centers = base_rng.normal(size=(K_TRUE, D)).astype("f4")
    rows_per_group = max(1024, 25_000_000 // D)

    q_pool = None  # (Q_POOL, D) f8, from chunk 0
    # running exact top-5 for queries 0..9: (cos, neighbor_id) heaps
    best_cos = np.full((10, 0), 0.0)
    best_ids = np.full((10, 0), 0, dtype="i8")
    writer = None
    cur_shard = -1
    t0 = time.monotonic()
    for ci, lo in enumerate(range(0, N, CHUNK)):
        hi = min(N, lo + CHUNK)
        m = hi - lo
        crng = np.random.default_rng((11, lo))
        lab = crng.integers(0, K_TRUE, size=m)
        pts = centers[lab] + 0.6 * crng.standard_normal((m, D), dtype="f4")
        shard = ci // CHUNKS_PER_SHARD
        if shard != cur_shard:
            if writer is not None:
                writer.close()
            cur_shard = shard
            writer = None
        offsets = np.arange(0, (m + 1) * D, D, dtype="i4")
        emb = pa.ListArray.from_arrays(pa.array(offsets), pa.array(pts.reshape(-1)))
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(lo, hi, dtype="i8")),
                "embedding": emb,
                "label": pa.array(lab.astype("i4")),
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(_shard_path(cur_shard), tbl.schema)
        writer.write_table(tbl, row_group_size=rows_per_group)

        # oracle bookkeeping, all f8 (matches Spark's double cosine over
        # the f4-stored values)
        x = pts.astype("f8")
        if lo == 0:
            q_pool = x[:Q_POOL].copy()
        q10 = q_pool[:10]
        qn = np.sqrt((q10 * q10).sum(axis=1))
        xn = np.sqrt((x * x).sum(axis=1))
        cos = (q10 @ x.T) / (qn[:, None] * xn[None, :])
        ids = np.arange(lo, hi, dtype="i8")
        # merge with the running top-5, excluding self (the ADC kernel
        # and q_knn_cosine_topk both exclude the query row)
        best_cos = np.concatenate([best_cos, cos], axis=1)
        best_ids = np.concatenate(
            [best_ids, np.broadcast_to(ids, (10, m))], axis=1
        )
        keep_cos = np.empty((10, TOP_K + 1))
        keep_ids = np.empty((10, TOP_K + 1), dtype="i8")
        for q in range(10):
            mask = best_ids[q] != q
            c, i = best_cos[q][mask], best_ids[q][mask]
            order = np.lexsort((i, -c))[: TOP_K + 1]
            pad = TOP_K + 1 - len(order)
            keep_cos[q] = np.pad(c[order], (0, pad), constant_values=-2.0)
            keep_ids[q] = np.pad(i[order], (0, pad), constant_values=-1)
        best_cos, best_ids = keep_cos, keep_ids
    if writer is not None:
        writer.close()

    qn_pool = np.sqrt((q_pool * q_pool).sum(axis=1))
    np.savez_compressed(
        os.path.join(BASE, "queries.npz"),
        qids=np.arange(Q_POOL, dtype="i8"),
        qmat=q_pool,
        qnrm=qn_pool,
    )
    exact = {}
    for q in range(10):
        valid = best_ids[q] >= 0
        order = np.lexsort((best_ids[q][valid], -best_cos[q][valid]))[:TOP_K]
        exact[str(q)] = best_ids[q][valid][order]
    np.savez_compressed(os.path.join(BASE, "exact.npz"), **exact)
    return {
        "phase": "synth",
        "wall_sec": round(time.monotonic() - t0, 1),
        "shards": cur_shard + 1,
        "bytes": sum(
            os.path.getsize(_shard_path(s)) for s in range(cur_shard + 1)
        ),
    }


def check() -> dict:
    """Verify exact.npz against a Spark brute-force top-5 over the shard
    corpus — runs BEFORE the shards retire, so the recall denominator
    used after retirement is itself machine-checked."""
    from pyspark.sql import functions as F

    spark = _spark("ann-sharded-check")
    z = np.load(os.path.join(BASE, "queries.npz"))
    q10 = [
        (int(i), [float(v) for v in e], float(n))
        for i, e, n in zip(z["qids"][:10], z["qmat"][:10], z["qnrm"][:10])
    ]
    qdf = spark.createDataFrame(
        q10, "query_id long, q_emb array<double>, q_nrm double"
    )
    corpus = spark.read.parquet(
        *[_shard_path(s) for s in range(8) if os.path.exists(_shard_path(s))]
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("n_emb"),
    )
    dot = F.aggregate(
        F.zip_with("q_emb", "n_emb", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n_nrm = F.sqrt(
        F.aggregate(
            F.transform("n_emb", lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    from pyspark.sql import Window

    t0 = time.monotonic()
    scored = (
        corpus.join(F.broadcast(qdf), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot / (F.col("q_nrm") * n_nrm)).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    rows = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .collect()
    )
    wall = round(time.monotonic() - t0, 1)
    spark_sets = {}
    for r in rows:
        spark_sets.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
    exact = np.load(os.path.join(BASE, "exact.npz"))
    mismatches = {
        q: sorted(spark_sets[q] ^ {int(v) for v in exact[str(q)]})
        for q in range(10)
        if spark_sets[q] != {int(v) for v in exact[str(q)]}
    }
    return {
        "phase": "check",
        "wall_sec": wall,
        "oracle_matches_spark": not mismatches,
        "mismatches": {str(k): v for k, v in mismatches.items()},
    }


def _spark(name: str):
    from affinity_propagation_mapreduce_spark.session import get_spark

    spark = get_spark(name)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def base() -> dict:
    from affinity_propagation_mapreduce_spark.operators import ann_index as ai

    spark = _spark("ann-sharded-base")
    df = spark.read.parquet(_shard_path(0)).select("vec_id", "embedding")
    t0 = time.monotonic()
    ai.build_ann_index(
        spark, BASE, path=INDEX, emb_raw=df, store_raw=True, n_hint=N
    )
    wall = round(time.monotonic() - t0, 1)
    meta = ai._read_meta(INDEX)
    os.remove(_shard_path(0))  # the raw store supersedes the source shard
    return {
        "phase": "base",
        "wall_sec": wall,
        "n": meta["n"],
        "nlist": meta["nlist"],
        "pq_m": meta["m"],
    }


def append(s: int) -> dict:
    from affinity_propagation_mapreduce_spark.operators import ann_index as ai

    spark = _spark(f"ann-sharded-append-{s}")
    df = spark.read.parquet(_shard_path(s)).select("vec_id", "embedding")
    t0 = time.monotonic()
    n_new = ai.append_ann_index(spark, INDEX, df, f"shard-{s:02d}")
    wall = round(time.monotonic() - t0, 1)
    os.remove(_shard_path(s))
    return {
        "phase": "append",
        "shard": s,
        "wall_sec": wall,
        "n_appended": n_new,
        "n_total": ai._read_meta(INDEX)["n"],
        "disk_avail_gb": round(shutil.disk_usage("/").free / 2**30, 1),
    }


def _queries(n_q: int, offset: int = 0):
    z = np.load(os.path.join(BASE, "queries.npz"))
    sel = slice(offset, offset + n_q)
    return z["qids"][sel], z["qmat"][sel], z["qnrm"][sel]


def warm(n_q: int, n_batches: int) -> dict:
    from affinity_propagation_mapreduce_spark.operators import ann_index as ai

    spark = _spark("ann-sharded-warm")
    walls, rows = [], 0
    for b in range(n_batches):
        qids, qmat, qnrm = _queries(n_q, offset=b * n_q)
        t0 = time.monotonic()
        res = ai.serve_topk(spark, INDEX, qids, qmat, qnrm).localCheckpoint(
            eager=True
        )
        rows = res.count()
        walls.append(round(time.monotonic() - t0, 1))
    meta = ai._read_meta(INDEX)
    w = ai.plan_n_probe(meta["nlist"], meta["n"], n_q)
    return {
        "phase": "warm",
        "n_queries": n_q,
        "batch_walls_sec": walls,
        "cold_sec": walls[0],
        "steady_sec": min(walls[1:]) if len(walls) > 1 else walls[0],
        "planned_n_probe": w,
        "serve_mode": ai.choose_search_mode(meta["nlist"], w),
        "rows_last": rows,
    }


def bulk(n_q: int, pmode: str = "auto") -> dict:
    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.operators import ann_index as ai

    spark = _spark("ann-sharded-bulk")
    qids, qmat, qnrm = _queries(n_q)
    meta = ai._read_meta(INDEX)
    t0 = time.monotonic()
    res = ai.serve_topk(
        spark, INDEX, qids, qmat, qnrm, mode=pmode
    ).localCheckpoint(eager=True)
    rows = res.count()
    wall = round(time.monotonic() - t0, 1)
    served: dict[int, set[int]] = {}
    for r in res.where(F.col("query_id") < 10).collect():
        served.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
    exact = np.load(os.path.join(BASE, "exact.npz"))
    hits = sum(
        len(served.get(q, set()) & set(int(v) for v in exact[str(q)]))
        for q in range(10)
    )
    return {
        "phase": "bulk",
        "probe_mode": pmode,
        "n_queries": n_q,
        "wall_sec": wall,
        "rows": rows,
        "planned_n_probe": ai.plan_n_probe(
            meta["nlist"], meta["n"], n_q, mode=pmode
        ),
        "recall_at5_first10": round(hits / (10 * TOP_K), 3),
    }


def delete_drill() -> dict:
    """Tombstone a 5% slice of the 10M raw layout, then serve |Q|=10 with
    the tombstones PENDING and assert no dead neighbor is returned — the
    maintenance cost at this scale without the fold.  The fold itself is
    NOT run here: compacting a ~34 GB raw tree needs old tree + new tree
    + the cell shuffle resident at once (~100 GB), over this box's
    ~94 GB usable quota — at 10M×768 compaction is a fleet-sized job by
    construction, and the pending-tombstone serve below is the shape
    that carries the layout between folds."""
    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.operators import ann_index as ai

    spark = _spark("ann-sharded-delete")
    victims = (
        spark.range(N)
        .select(F.col("id").alias("vec_id"))
        .where(F.col("vec_id") % 20 == 11)
    )
    t0 = time.monotonic()
    n_del = ai.delete_ann_index(spark, INDEX, victims, "drill-del-20-11")
    del_sec = round(time.monotonic() - t0, 1)
    qids, qmat, qnrm = _queries(10)
    t0 = time.monotonic()
    res = ai.serve_topk(spark, INDEX, qids, qmat, qnrm).localCheckpoint(
        eager=True
    )
    rows = res.count()
    bad = res.where(F.col("neighbor_id") % 20 == 11).count()
    serve_sec = round(time.monotonic() - t0, 1)
    if bad:
        raise AssertionError(f"{bad} tombstoned neighbors served")
    return {
        "phase": "delete",
        "n_deleted": n_del,
        "delete_sec": del_sec,
        "serve_with_pending_tombstones_sec": serve_sec,
        "tombstoned_neighbors_served": bad,
        "rows": rows,
    }


def pfold(budget_gb: float = 3.0) -> dict:
    """Fold the pending 5%-delete tombstones of the 10M×768 layout ON
    THIS BOX via budgeted per-cell partial compaction (r12 verdict #1:
    the monolithic fold needs old tree + new tree + the cell shuffle
    resident — measured over the quota; the budgeted loop bounds peak
    scratch per round at ~budget bytes of rewrites, with every
    unfolded cell hard-linked forward at zero bytes).  A uniform 5%
    delete is the WORST case for cost-∝-garbage (every cell qualifies),
    so total I/O here is corpus-sized — what the budget buys is that
    the job fits the box at all, round by round, serves staying online
    between rounds.  Measures per-round wall + disk floor, then the
    post-fold steady serve (the r12 pending-tombstone anchor is
    34.4 s/batch vs 20.2 s clean) and recall vs the survivor-restricted
    exact oracle."""
    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.operators import ann_index as ai

    spark = _spark("ann-sharded-pfold")
    budget = int(budget_gb * (1 << 30))
    qids, qmat, qnrm = _queries(10)

    # pre-fold anchor: one pending-tombstone serve (r12: 34.4 s steady)
    t0 = time.monotonic()
    res = ai.serve_topk(spark, INDEX, qids, qmat, qnrm).localCheckpoint(
        eager=True
    )
    res.count()
    pre_serve = round(time.monotonic() - t0, 1)

    rounds = []
    disk_floor = None
    t_loop = time.monotonic()
    while True:
        t0 = time.monotonic()
        r = ai.compact_ann_index(spark, INDEX, scratch_budget_bytes=budget)
        wall = round(time.monotonic() - t0, 1)
        free_gb = round(shutil.disk_usage("/tmp").free / (1 << 30), 1)
        disk_floor = free_gb if disk_floor is None else min(disk_floor, free_gb)
        rounds.append(
            {
                "cells": r["cells_folded"],
                "rows_tombstoned": r["rows_tombstoned"],
                "wall_sec": wall,
                "disk_free_gb": free_gb,
            }
        )
        print(json.dumps({"round": len(rounds), **rounds[-1]}), flush=True)
        if not r["cells_folded"]:
            break
        if r["garbage_cleared"] and not ai._tombstone_dirs(INDEX):
            break
    loop_sec = round(time.monotonic() - t_loop, 1)

    if ai._tombstone_dirs(INDEX):
        raise AssertionError("tombstones survived the budgeted fold")
    meta = ai._read_meta(INDEX)
    n_live = spark.read.parquet(ai.codes_root(INDEX)).count()
    if n_live != meta["n"]:
        raise AssertionError(f"live {n_live} != meta n {meta['n']}")

    # post-fold steady serve + survivor recall
    walls = []
    served: dict[int, set[int]] = {}
    for b in range(5):
        qids, qmat, qnrm = _queries(10, offset=b * 10)
        t0 = time.monotonic()
        res = ai.serve_topk(spark, INDEX, qids, qmat, qnrm).localCheckpoint(
            eager=True
        )
        if res.where(F.col("neighbor_id") % 20 == 11).count():
            raise AssertionError("folded layout served a deleted neighbor")
        if b == 0:
            for r_ in res.collect():
                served.setdefault(int(r_.query_id), set()).add(
                    int(r_.neighbor_id)
                )
        walls.append(round(time.monotonic() - t0, 1))
    exact = np.load(os.path.join(BASE, "exact.npz"))
    n_surv = hits = 0
    for q in range(10):
        surv = {int(v) for v in exact[str(q)] if int(v) % 20 != 11}
        n_surv += len(surv)
        hits += len(served.get(q, set()) & surv)
    return {
        "phase": "pfold",
        "budget_gb": budget_gb,
        "pre_fold_pending_serve_sec": pre_serve,
        "rounds": len(rounds),
        "cells_folded": sum(r["cells"] for r in rounds),
        "rows_tombstoned": sum(r["rows_tombstoned"] for r in rounds),
        "fold_loop_sec": loop_sec,
        "round_walls_sec": [r["wall_sec"] for r in rounds],
        "disk_floor_gb": disk_floor,
        "n_live": int(n_live),
        "post_fold_serve_walls_sec": walls,
        "post_fold_steady_sec": min(walls[1:]),
        "recall_at5_survivors_first10": round(hits / max(1, n_surv), 3),
    }


def main():
    mode = sys.argv[1]
    if mode == "synth":
        out = synth()
    elif mode == "check":
        out = check()
    elif mode == "base":
        out = base()
    elif mode == "append":
        out = append(int(sys.argv[2]))
    elif mode == "warm":
        out = warm(int(sys.argv[2]), int(sys.argv[3]) if len(sys.argv) > 3 else 5)
    elif mode == "bulk":
        out = bulk(
            int(sys.argv[2]), sys.argv[3] if len(sys.argv) > 3 else "auto"
        )
    elif mode == "delete":
        out = delete_drill()
    elif mode == "pfold":
        out = pfold(float(sys.argv[2]) if len(sys.argv) > 2 else 3.0)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
