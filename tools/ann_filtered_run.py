"""Round-14 measured runs: filtered-serving pushdown A/B + the 10M×768
on-box migration (r13 verdict "next" #2/#3/#6).

Sub-commands (each prints one JSON line; results go to BASELINE.md
§ann-serving):

  python tools/ann_filtered_run.py m1          # 1M×16: build meta_cols
      layout, semi-join vs pushdown A/B (pre @ low sel, post @ high sel)
  python tools/ann_filtered_run.py migrate10m  # migrate the r12/r13
      10M×768 layout ON THIS BOX, backfilling label via add_meta, with
      a concurrent serving thread and a disk-floor tracker
  python tools/ann_filtered_run.py filtered10m # post-migration filtered
      A/B at 10M×768 + the tombstone-pending filtered leg + budgeted
      partial fold + filtered serve again (the big-rung composition)

The 10M runs mutate /tmp/above_gate/sharded-10m-768/index-raw in place
(scratch artifact of rounds 12-13); m1 builds its layout beside the 1M
synth corpus.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE10 = "/tmp/above_gate/sharded-10m-768"
INDEX10 = os.path.join(BASE10, "index-raw")
BASE1 = "/tmp/above_gate/n1000000"
INDEX1 = os.path.join(BASE1, "index-meta")
TOP_K = 5
# the r13 drift drill deleted vec_id % 20 == 11 (folded away at r13);
# this round's pending-tombstone leg uses a disjoint slice
FDEL10_MOD, FDEL10_RESIDUE, FDEL10_TAG = 25, 3, "fdel-25-3"


def _spark(name: str):
    from affinity_propagation_mapreduce_spark.session import get_spark

    spark = get_spark(name)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _queries10(n_q: int, offset: int = 0):
    z = np.load(os.path.join(BASE10, "queries.npz"))
    sel = slice(offset, offset + n_q)
    return z["qids"][sel], z["qmat"][sel], z["qnrm"][sel]


class _DiskFloor(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.floor = shutil.disk_usage("/").free
        self._stop = threading.Event()

    def run(self):
        while not self._stop.is_set():
            self.floor = min(self.floor, shutil.disk_usage("/").free)
            time.sleep(2.0)

    def stop(self) -> float:
        self._stop.set()
        return round(self.floor / 2**30, 1)


def _timed_filtered(spark, path, qids, qmat, qnrm, n_reps=2, **kw):
    walls = []
    rows = 0
    used = None
    res = None
    for _ in range(n_reps):
        from affinity_propagation_mapreduce_spark.operators import (
            ann_index as ai,
        )

        t0 = time.monotonic()
        res, used = ai.serve_topk_filtered(spark, path, qids, qmat, qnrm, **kw)
        res = res.localCheckpoint(eager=True)
        rows = res.count()
        walls.append(round(time.monotonic() - t0, 1))
    return res, {
        "mode_used": used,
        "walls_sec": walls,
        "steady_sec": min(walls),
        "rows": rows,
    }


def m1() -> None:
    """1M×16 A/B: the SAME predicate served through (a) the id-relation
    semi-join fallback and (b) the pushed parquet filter — pre-mode at
    a low-selectivity predicate, post-mode at a high-selectivity one.
    Recall is reported for the pre arms vs the exact filtered top-5
    (numpy, exactly computable at 1M×16)."""
    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.operators import ann_index as ai

    spark = _spark("ann-filtered-1m")
    src = spark.read.parquet(os.path.join(BASE1, "embeddings.parquet"))
    labels = sorted(
        r.label for r in src.select("label").distinct().collect()
    )
    out = {"phase": "m1", "n": 1_000_000, "d": 16, "labels": len(labels)}
    t0 = time.monotonic()
    ai.build_ann_index(
        spark, BASE1, path=INDEX1, emb_raw=src, store_raw=True,
        meta_cols=("label",),
    )
    out["build_sec"] = round(time.monotonic() - t0, 1)
    # low-selectivity predicate: one label residue class (geometry-
    # correlated, the r13 measurement's shape); high-selectivity: its
    # complement's majority
    lo_expr = "label % 3 = 0"
    hi_expr = "label % 3 != 0"
    pdf = src.select("vec_id", "label").toPandas()
    lab = pdf.set_index("vec_id")["label"]
    lo_sel = float((lab % 3 == 0).mean())
    hi_sel = 1.0 - lo_sel
    out["lo_sel"] = round(lo_sel, 3)
    out["hi_sel"] = round(hi_sel, 3)
    est = ai.estimate_selectivity(spark, INDEX1, lo_expr)
    out["lo_sel_estimate"] = round(est, 3)
    qn = 10
    z = spark.read.parquet(os.path.join(BASE1, "embeddings.parquet"))
    qrows = (
        z.where(F.col("vec_id") < qn)
        .select("vec_id", "embedding")
        .collect()
    )
    qrows.sort(key=lambda r: r.vec_id)
    qids = np.array([r.vec_id for r in qrows], dtype="i8")
    qmat = np.array([list(r.embedding) for r in qrows], dtype="f8")
    qnrm = np.sqrt((qmat * qmat).sum(axis=1))
    # exact filtered top-5 for the low-sel predicate (numpy)
    emb_pdf = src.select("vec_id", "embedding").toPandas()
    ids = emb_pdf["vec_id"].to_numpy()
    X = np.array([list(e) for e in emb_pdf["embedding"]], dtype="f8")
    nrm = np.sqrt((X * X).sum(axis=1))
    qual = (lab.loc[ids].to_numpy() % 3) == 0
    exact_lo = {}
    for qi in range(qn):
        cos = (X @ qmat[qi]) / (nrm * qnrm[qi] + 1e-300)
        cand = np.flatnonzero(qual)
        order = cand[np.lexsort((ids[cand], -cos[cand]))]
        exact_lo[int(qids[qi])] = [int(ids[j]) for j in order[:TOP_K]]

    def recall(res):
        served = {}
        for r in res.select("query_id", "neighbor_id").collect():
            served.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
        hits = sum(
            len(served.get(q, set()) & set(v)) for q, v in exact_lo.items()
        )
        return round(hits / (qn * TOP_K), 3)

    fids_lo = src.where(F.expr(lo_expr)).select("vec_id")
    fids_hi = src.where(F.expr(hi_expr)).select("vec_id")
    res, row = _timed_filtered(
        spark, INDEX1, qids, qmat, qnrm, filter_expr=lo_expr, mode="pre",
        selectivity=lo_sel,
    )
    row["recall_at5"] = recall(res)
    out["pre_pushdown"] = row
    res, row = _timed_filtered(
        spark, INDEX1, qids, qmat, qnrm, filter_ids=fids_lo, mode="pre",
        selectivity=lo_sel,
    )
    row["recall_at5"] = recall(res)
    out["pre_semijoin"] = row
    _res, row = _timed_filtered(
        spark, INDEX1, qids, qmat, qnrm, filter_expr=hi_expr, mode="post",
        selectivity=hi_sel,
    )
    out["post_pushdown"] = row
    _res, row = _timed_filtered(
        spark, INDEX1, qids, qmat, qnrm, filter_ids=fids_hi, mode="post",
        selectivity=hi_sel,
    )
    out["post_semijoin"] = row
    print(json.dumps(out))


def migrate10m() -> None:
    """Task 6: migrate the 10M×768 layout on this box (E12 was measured
    at 1M) — retrain + batch-by-batch re-encode + atomic flip — while a
    serving thread keeps completing interactive batches, backfilling
    `label = pmod(vec_id, 100)` for the filtered A/B.  Prints wall,
    serves completed mid-migration, recall vs the build-time exact
    oracle (restricted to live ids), steady post-migration serve, and
    the disk floor."""
    from affinity_propagation_mapreduce_spark.operators import ann_index as ai

    spark = _spark("ann-migrate-10m")
    meta0 = ai._read_meta(INDEX10)
    out = {
        "phase": "migrate10m",
        "n": meta0["n"],
        "gen_before": ai._gen_of(meta0),
    }
    floor = _DiskFloor()
    floor.start()
    serves = {"done": 0, "errors": 0}
    stop_serving = threading.Event()

    def serve_loop():
        qids, qmat, qnrm = _queries10(10)
        while not stop_serving.is_set():
            try:
                r = ai.serve_topk(spark, INDEX10, qids, qmat, qnrm)
                r.count()
                serves["done"] += 1
            except Exception:
                serves["errors"] += 1

    th = threading.Thread(target=serve_loop, daemon=True)
    th.start()
    t0 = time.monotonic()
    res = ai.migrate_ann_index(
        spark, INDEX10, add_meta={"label": "pmod(vec_id, 100)"}
    )
    out["migrate_sec"] = round(time.monotonic() - t0, 1)
    stop_serving.set()
    th.join(timeout=600)
    out["serves_during_migration"] = serves["done"]
    out["serve_errors"] = serves["errors"]
    out["migrate_result"] = res
    # post-migration recall vs the cross-checked build oracle, restricted
    # to live ids (the r13 drift slice vec_id%20==11 was deleted+folded)
    qids, qmat, qnrm = _queries10(10)
    t0 = time.monotonic()
    served = ai.serve_topk(spark, INDEX10, qids, qmat, qnrm)
    got = {}
    for r in served.select("query_id", "neighbor_id").collect():
        got.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
    out["post_serve_sec"] = round(time.monotonic() - t0, 1)
    exact = np.load(os.path.join(BASE10, "exact.npz"))
    hits = tot = 0
    for q in range(10):
        live = [int(v) for v in exact[str(q)] if int(v) % 20 != 11]
        hits += len(got.get(int(qids[q]), set()) & set(live))
        tot += len(live)
    out["recall_at5_vs_live_oracle"] = round(hits / max(1, tot), 3)
    t0 = time.monotonic()
    ai.serve_topk(spark, INDEX10, qids, qmat, qnrm).count()
    out["steady_serve_sec"] = round(time.monotonic() - t0, 1)
    # reclaim the superseded generation now that serving is quiesced
    old_grace = ai._REAP_GRACE_SEC
    ai._REAP_GRACE_SEC = -1
    try:
        ai._reap_layout_scratch(INDEX10)
    finally:
        ai._REAP_GRACE_SEC = old_grace
    out["disk_floor_gb"] = floor.stop()
    out["disk_after_reap_gb"] = round(shutil.disk_usage("/").free / 2**30, 1)
    print(json.dumps(out))


def _emit(obj) -> None:
    print(json.dumps(obj), flush=True)


def filtered10m() -> None:
    """Tasks 2+3 at the big rung, CRASH-ORDERED (each step prints its
    own JSON line immediately — the first attempt lost every number to
    an end-of-run print when the fold filled the disk):

      1. filtered serve (pushdown, pre) WITH pending tombstones — the
         lifecycle leg; asserts no deleted / non-qualifying neighbor;
      2. budgeted fold to a clean layout — budget gbytes//10 and
         REAP GRACE 0 between rounds (the 900 s production grace
         retained 3 superseded 8 GB generations on a 44 GB-free box:
         the measured reason the first attempt died; a sequential
         drill has no concurrent reader to protect);
      3. filtered serve post-fold (lifecycle leg 2);
      4. the pushdown-vs-semijoin A/B on the clean folded layout."""
    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.operators import ann_index as ai

    spark = _spark("ann-filtered-10m")
    meta = ai._read_meta(INDEX10)
    if "label" not in meta.get("meta_cols", []):
        raise SystemExit("run migrate10m first (label backfill)")
    _emit({"phase": "filtered10m", "n": meta["n"], "gen": ai._gen_of(meta)})
    floor = _DiskFloor()
    floor.start()
    qids, qmat, qnrm = _queries10(10)
    lo_expr, lo_sel = "label < 10", 0.10
    hi_expr, hi_sel = "label < 50", 0.50
    est = ai.estimate_selectivity(spark, INDEX10, lo_expr)
    _emit({"step": "estimate", "lo_sel_estimate": round(est, 4)})

    def assert_clean(res, stage, deletes_applied=True):
        rows = res.select("query_id", "neighbor_id").collect()
        for r in rows:
            if (
                deletes_applied
                and r.neighbor_id % FDEL10_MOD == FDEL10_RESIDUE
            ):
                raise AssertionError(
                    f"{stage}: DELETED neighbor {r.neighbor_id} served"
                )
            if r.neighbor_id % 100 >= 10:
                raise AssertionError(
                    f"{stage}: non-qualifying neighbor {r.neighbor_id}"
                )
        return len(rows)

    # step 1: ensure the delete slice is applied (idempotent by tag),
    # then the pending-tombstone filtered serve
    croot = ai._codes_root_gen(INDEX10, ai._gen_of(meta))
    del_pred = F.pmod(F.col("vec_id"), F.lit(FDEL10_MOD)) == FDEL10_RESIDUE
    t0 = time.monotonic()
    n_del = ai.delete_ann_index(
        spark, INDEX10,
        spark.read.parquet(croot).where(del_pred).select("vec_id"),
        FDEL10_TAG,
    )
    _emit({"step": "delete", "sec": round(time.monotonic() - t0, 1),
           "n_deleted": n_del})
    pending = bool(ai._tombstone_dirs(INDEX10))
    res, row = _timed_filtered(
        spark, INDEX10, qids, qmat, qnrm, filter_expr=lo_expr, mode="pre",
        selectivity=lo_sel, n_reps=1,
    )
    row["rows_checked"] = assert_clean(res, "tombstones-pending")
    row["tombstones_were_pending"] = pending
    _emit({"step": "pre_pushdown_tombstones_pending", **row})
    # step 2: budgeted fold, drill-grade reaping
    stats = ai.ann_cell_stats(spark, INDEX10)
    gbytes = sum(s["bytes"] for s in stats.values() if s["dead"] > 0)
    budget = max(1, gbytes // 10)
    old_grace = ai._REAP_GRACE_SEC
    ai._REAP_GRACE_SEC = 0
    t0 = time.monotonic()
    try:
        agg = ai.compact_ann_index_incremental(spark, INDEX10, budget)
    finally:
        ai._REAP_GRACE_SEC = old_grace
    _emit({"step": "fold", "sec": round(time.monotonic() - t0, 1),
           "budget_gb": round(budget / 2**30, 2), "rounds": agg["rounds"],
           "rows_tombstoned": agg["rows_tombstoned"], "rows": agg["rows"]})
    # step 3: post-fold filtered serve
    res, row = _timed_filtered(
        spark, INDEX10, qids, qmat, qnrm, filter_expr=lo_expr, mode="pre",
        selectivity=lo_sel, n_reps=1,
    )
    row["rows_checked"] = assert_clean(res, "post-fold")
    _emit({"step": "pre_pushdown_post_fold", **row})
    # step 4: the A/B on the clean layout
    meta = ai._read_meta(INDEX10)
    croot = ai._codes_root_gen(INDEX10, ai._gen_of(meta))
    ids_scan = spark.read.parquet(croot)
    res, row = _timed_filtered(
        spark, INDEX10, qids, qmat, qnrm, filter_expr=lo_expr, mode="pre",
        selectivity=lo_sel,
    )
    row["rows_checked"] = assert_clean(res, "ab-pre-pushdown")
    _emit({"step": "pre_pushdown", **row})
    _res, row = _timed_filtered(
        spark, INDEX10, qids, qmat, qnrm,
        filter_ids=ids_scan.where(F.expr(lo_expr)).select("vec_id"),
        mode="pre", selectivity=lo_sel,
    )
    _emit({"step": "pre_semijoin", **row})
    _res, row = _timed_filtered(
        spark, INDEX10, qids, qmat, qnrm, filter_expr=hi_expr, mode="post",
        selectivity=hi_sel,
    )
    _emit({"step": "post_pushdown", **row})
    _res, row = _timed_filtered(
        spark, INDEX10, qids, qmat, qnrm,
        filter_ids=ids_scan.where(F.expr(hi_expr)).select("vec_id"),
        mode="post", selectivity=hi_sel,
    )
    _emit({"step": "post_semijoin", **row})
    _emit({"step": "done", "disk_floor_gb": floor.stop()})


def compound1m() -> None:
    """Round-15 drill (r14 verdict "next" #5): COMPOUND predicates over
    TWO metadata columns at 1M×16 — tenant equality AND a date band —
    measuring what every prior leg measured for single equalities:
    sample-estimator accuracy on the conjunction/disjunction (whole-row
    sample ⇒ cross-column correlation captured), mode-rule stability,
    recall@5 of the pre arm vs the exact compound answer, and walls."""
    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.operators import ann_index as ai

    spark = _spark("ann-compound-1m")
    index = os.path.join(BASE1, "index-meta2")
    src = spark.read.parquet(os.path.join(BASE1, "embeddings.parquet")).withColumn(
        "day", F.pmod(F.col("vec_id"), F.lit(7))
    )
    out = {"phase": "compound1m", "n": 1_000_000, "d": 16}
    t0 = time.monotonic()
    ai.build_ann_index(
        spark, BASE1, path=index, emb_raw=src, store_raw=True,
        meta_cols=("label", "day"),
    )
    out["build_sec"] = round(time.monotonic() - t0, 1)
    lo_expr = "label % 3 = 0 AND day < 3"
    hi_expr = "label % 3 != 0 OR day < 3"
    n = src.count()
    lo_true = src.where(F.expr(lo_expr)).count() / n
    hi_true = src.where(F.expr(hi_expr)).count() / n
    out["lo_true"] = round(lo_true, 4)
    out["hi_true"] = round(hi_true, 4)
    out["lo_est"] = round(ai.estimate_selectivity(spark, index, lo_expr), 4)
    out["hi_est"] = round(ai.estimate_selectivity(spark, index, hi_expr), 4)
    out["lo_mode"] = ai.choose_filter_mode(out["lo_est"])
    out["hi_mode"] = ai.choose_filter_mode(out["hi_est"])
    qrows = (
        src.where(F.col("vec_id") < 10)
        .select("vec_id", "embedding")
        .collect()
    )
    qrows.sort(key=lambda r: r.vec_id)
    qids = np.array([r.vec_id for r in qrows], dtype="i8")
    qmat = np.array([list(r.embedding) for r in qrows], dtype="f8")
    qnrm = np.sqrt((qmat * qmat).sum(axis=1))
    # exact compound top-5 for the lo predicate (numpy at 1M×16)
    pdf = src.select("vec_id", "embedding", "label", "day").toPandas()
    order0 = np.argsort(pdf["vec_id"].to_numpy())
    ids = pdf["vec_id"].to_numpy()[order0]
    X = np.array([list(e) for e in pdf["embedding"]], dtype="f8")[order0]
    lab = pdf["label"].to_numpy()[order0]
    day = pdf["day"].to_numpy()[order0]
    nrm = np.sqrt((X * X).sum(axis=1))
    qual_lo = (lab % 3 == 0) & (day < 3)
    exact_lo = {}
    for qi in range(len(qids)):
        cos = (X @ qmat[qi]) / (nrm * qnrm[qi] + 1e-300)
        cand = np.flatnonzero(qual_lo)
        order = cand[np.lexsort((ids[cand], -cos[cand]))]
        exact_lo[int(qids[qi])] = [int(ids[j]) for j in order[:TOP_K]]
    res, row = _timed_filtered(
        spark, index, qids, qmat, qnrm, filter_expr=lo_expr, mode="auto"
    )
    served = {}
    for r in res.select("query_id", "neighbor_id").collect():
        served.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
    bad = [
        nb
        for q, nbs in served.items()
        for nb in nbs
        if not (lab[np.searchsorted(ids, nb)] % 3 == 0 and nb % 7 < 3)
    ]
    if bad:
        raise AssertionError(f"non-qualifying compound neighbors: {bad[:3]}")
    hits = sum(
        len(served.get(q, set()) & set(v)) for q, v in exact_lo.items()
    )
    row["recall_at5"] = round(hits / (len(qids) * TOP_K), 3)
    out["pre_auto_lo"] = row
    _res, row = _timed_filtered(
        spark, index, qids, qmat, qnrm, filter_expr=hi_expr, mode="auto"
    )
    out["post_auto_hi"] = row
    print(json.dumps(out))


def compound10m() -> None:
    """The 10M×768 compound leg: the layout's sample and codes both
    carry (vec_id, label), so a two-COLUMN compound — tenant equality
    on label AND a band on pmod(vec_id, 7) (the date stand-in; a
    physical scan column, no second 47-min backfill migration) —
    exercises estimator, mode rule, and both serve arms at the big
    rung.  Deleted slice (vec_id%25==3, folded in r14) must never
    surface."""
    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.operators import ann_index as ai

    spark = _spark("ann-compound-10m")
    meta = ai._read_meta(INDEX10)
    if "label" not in meta.get("meta_cols", []):
        raise SystemExit("run migrate10m first (label backfill)")
    out = {"phase": "compound10m", "n": meta["n"], "gen": ai._gen_of(meta)}
    lo_expr = "label % 10 = 3 AND pmod(vec_id, 7) < 3"
    hi_expr = "label % 10 != 3 OR pmod(vec_id, 7) < 3"
    croot = ai._codes_root_gen(INDEX10, ai._gen_of(meta))
    codes = spark.read.parquet(croot)
    n_live = meta["n"]
    lo_true = codes.where(F.expr(lo_expr)).count() / n_live
    hi_true = codes.where(F.expr(hi_expr)).count() / n_live
    out["lo_true"] = round(lo_true, 4)
    out["hi_true"] = round(hi_true, 4)
    out["lo_est"] = round(ai.estimate_selectivity(spark, INDEX10, lo_expr), 4)
    out["hi_est"] = round(ai.estimate_selectivity(spark, INDEX10, hi_expr), 4)
    out["lo_mode"] = ai.choose_filter_mode(out["lo_est"])
    out["hi_mode"] = ai.choose_filter_mode(out["hi_est"])
    _emit(out)
    qids, qmat, qnrm = _queries10(10)

    def assert_clean(res, stage):
        rows = res.select("query_id", "neighbor_id").collect()
        for r in rows:
            nb = int(r.neighbor_id)
            if nb % 25 == FDEL10_RESIDUE:
                raise AssertionError(f"{stage}: DELETED neighbor {nb}")
            if not (nb % 100 % 10 == 3 and nb % 7 < 3):
                raise AssertionError(f"{stage}: non-qualifying {nb}")
        return len(rows)

    res, row = _timed_filtered(
        spark, INDEX10, qids, qmat, qnrm, filter_expr=lo_expr, mode="auto"
    )
    row["rows_checked"] = assert_clean(res, "compound-pre")
    _emit({"step": "compound_pre_pushdown", **row})
    _res, row = _timed_filtered(
        spark, INDEX10, qids, qmat, qnrm, filter_expr=hi_expr, mode="auto"
    )
    _emit({"step": "compound_post_pushdown", **row})


if __name__ == "__main__":
    {
        "m1": m1,
        "migrate10m": migrate10m,
        "filtered10m": filtered10m,
        "compound1m": compound1m,
        "compound10m": compound10m,
    }[sys.argv[1]]()
