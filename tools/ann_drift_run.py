"""Frozen-quantizer drift drill — round-10 verdict item #6.

``append_ann_index`` encodes new batches against the BASE distribution's
centroids/codebooks; its docstring warns that under distribution shift
cell occupancy skews and recall decays, with ``centroid_drift_frames``
as the monitor and a full rebuild as the remedy.  This drill makes each
of those three claims a MEASURED number:

  python tools/ann_drift_run.py 1000000          # shift = 1.5
  python tools/ann_drift_run.py 1000000 0.0      # null control

Protocol (clustered synth corpus, same generator as the serving ladder):
1. split 90/10 by md5 bucket (the incremental gate's split);
2. SHIFT the delta by a fixed random unit direction × ``shift`` (a
   mean-offset of every cluster — the "new crawl came from a different
   encoder/state" shape; within-cluster sigma is 0.6, so shift=1.5 is a
   2.5-sigma displacement);
3. build the base index, append the shifted delta with FROZEN
   quantizers, and measure recall@5 for queries drawn from the DELTA
   (where decay concentrates) and from the base (control) against a
   numpy exact top-5 over the post-append corpus;
4. run the in-engine base-vs-batch drift monitor
   (vector.centroid_drift_frames) and report its max per-label reading
   — the number a pipeline alerts on (the null run calibrates it);
5. REBUILD from the full drifted corpus and re-measure the delta-query
   recall — the remedy's restoration, and its cost next to the append.

Prints one JSON line; results recorded in BASELINE.md §ann-serving.
"""
from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from above_gate_run import synth_dir  # noqa: E402

N_DRILL_QUERIES = 100
TOP_K = 5


def _exact_top5(qmat, qids, corpus, ids):
    """numpy exact cosine top-5 (measurement reference only — the drill
    corpus is synthesized in-process, so the oracle is computed on the
    same doubles the engine reads)."""
    qn = np.linalg.norm(qmat, axis=1)
    cn = np.linalg.norm(corpus, axis=1)
    out = {}
    for i, qid in enumerate(qids):
        cos = (corpus @ qmat[i]) / (cn * qn[i])
        cos[ids == qid] = -np.inf  # self-match excluded, as in the engine
        keep = np.lexsort((ids, -cos))[:TOP_K]
        out[int(qid)] = set(int(v) for v in ids[keep])
    return out


def _recall(res_df, exact):
    got: dict[int, set] = {}
    for r in res_df.collect():
        got.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
    hits = sum(len(got.get(q, set()) & e) for q, e in exact.items())
    return round(hits / (len(exact) * TOP_K), 4)


def _fresh(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)
    try:
        os.remove(f"{path}.lock")
    except OSError:
        pass


def main():
    n = int(sys.argv[1])
    shift = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
    sf_dir = synth_dir(n)

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.operators import ann_index as ai
    from affinity_propagation_mapreduce_spark.operators import vector as V
    from affinity_propagation_mapreduce_spark.session import get_spark

    spark = get_spark(f"ann-drift-{n}")
    spark.sparkContext.setLogLevel("ERROR")

    # --- synthesize the drifted corpus as its own testdata-shaped dir ---
    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = tbl["vec_id"].to_numpy()
    lab = tbl["label"].to_numpy()
    x = np.array([list(e) for e in tbl["embedding"].to_pylist()], dtype="f8")
    # the engine's split device, mirrored: md5(vec_id as string)[:8] % 10
    bucket = np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10 for i in ids]
    )
    is_delta = bucket == 0
    rng = np.random.default_rng(7)
    u = rng.normal(size=x.shape[1])
    u /= np.linalg.norm(u)
    x_drift = x.copy()
    x_drift[is_delta] += shift * u

    drift_dir = os.path.join("/tmp/above_gate", f"n{n}-drift{shift:g}")
    os.makedirs(drift_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids.astype("i8")),
                "embedding": pa.array(
                    [row.astype("f4") for row in x_drift],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array(lab.astype("i4")),
            }
        ),
        os.path.join(drift_dir, "embeddings.parquet"),
    )
    # the oracle must see the f4 round trip the engine reads back
    x_served = x_drift.astype("f4").astype("f8")

    raw = ai.table(spark, drift_dir, "embeddings").select("vec_id", "embedding")
    b = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10
    )
    base_df, delta_df = raw.where(b != 0), raw.where(b == 0)

    # query sets: first N delta ids (decay concentrates there) + control
    id_row = {int(v): i for i, v in enumerate(ids)}

    def qpack(qids_):
        qs = np.array(sorted(int(q) for q in qids_), dtype="i8")
        qm = x_served[[id_row[int(q)] for q in qs]]
        return qs, qm

    packs = {
        "delta": qpack(ids[is_delta][:N_DRILL_QUERIES]),
        "base": qpack(ids[~is_delta][:N_DRILL_QUERIES]),
    }
    exact = {t: _exact_top5(qm, qs, x_served, ids) for t, (qs, qm) in packs.items()}

    out = {"n": n, "shift": shift}

    # --- base build + frozen-quantizer append ---------------------------
    path = os.path.join("/tmp/spark_graft_ann/v2", f"drift-n{n}-s{shift:g}")
    _fresh(path)
    _fresh(f"{path}-rebuilt")
    t0 = time.monotonic()
    ai.build_ann_index(spark, drift_dir, path=path, emb_raw=base_df)
    out["base_build_sec"] = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    out["n_appended"] = ai.append_ann_index(spark, path, delta_df, "drifted")
    out["append_sec"] = round(time.monotonic() - t0, 1)

    norms = ai._norms(spark, drift_dir)

    def serve(index_path, qs, qm):
        qn = np.linalg.norm(qm, axis=1)
        sl, mode = ai.search_auto(spark, index_path, qs, qm, qn)
        out["serve_mode"] = mode
        return ai._exact_rerank(spark, norms, sl, qs, qm, qn)

    for tag, (qs, qm) in packs.items():
        out[f"recall_{tag}_appended"] = _recall(serve(path, qs, qm), exact[tag])

    # --- the monitor: base-vs-batch centroid drift (in-engine) ----------
    def with_emb(df):
        return ai.table(spark, drift_dir, "embeddings").join(
            df.select("vec_id"), "vec_id"
        ).select(
            "label", F.col("embedding").cast("array<double>").alias("emb")
        )

    agg = (
        V.centroid_drift_frames(with_emb(base_df), with_emb(delta_df))
        .agg(
            F.max("centroid_drift").alias("mx"),
            F.avg("centroid_drift").alias("av"),
        )
        .first()
    )
    out["drift_monitor_max"] = float(agg.mx)
    out["drift_monitor_avg"] = round(float(agg.av), 4)

    # --- remedy A (r13): IN-PLACE quantizer migration under LIVE serves -
    # migrate_ann_index retrains on the current (drifted) distribution
    # and re-encodes batch-by-batch into the next generation while the
    # old generation keeps serving — the zero-downtime remedy.  A
    # churn-style concurrent reader serves throughout; the drill raises
    # if any serve errors, and the migrated recall must match the
    # rebuild's (same training data → near-identical quantizers).
    import threading

    mig_serves: list[float] = []
    mig_errors: list[str] = []
    stop = threading.Event()
    qs_d, qm_d = packs["delta"]

    def reader():
        while not stop.is_set():
            try:
                t1 = time.monotonic()
                serve(path, qs_d, qm_d).count()
                mig_serves.append(round(time.monotonic() - t1, 1))
            except Exception as e:  # noqa: BLE001 — drill assertion path
                mig_errors.append(repr(e))
                break

    th = threading.Thread(target=reader)
    th.start()
    t0 = time.monotonic()
    ai.migrate_ann_index(spark, path, emb_source=raw)
    out["migrate_sec"] = round(time.monotonic() - t0, 1)
    stop.set()
    th.join()
    if mig_errors:
        raise AssertionError(
            f"concurrent serve failed during migration: {mig_errors[:1]}"
        )
    out["serves_during_migration"] = len(mig_serves)
    for tag, (qs, qm) in packs.items():
        out[f"recall_{tag}_migrated"] = _recall(serve(path, qs, qm), exact[tag])

    # --- remedy B: full rebuild, recall restored ------------------------
    t0 = time.monotonic()
    ai.build_ann_index(spark, drift_dir, path=f"{path}-rebuilt")
    out["rebuild_sec"] = round(time.monotonic() - t0, 1)
    for tag, (qs, qm) in packs.items():
        out[f"recall_{tag}_rebuilt"] = _recall(
            serve(f"{path}-rebuilt", qs, qm), exact[tag]
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
