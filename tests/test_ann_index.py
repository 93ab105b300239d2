"""Persisted ANN index (operators/ann_index.py): build/serve split.

The serving claim is structural — search must not retrain or re-encode —
so these tests pin (a) layout integrity and idempotent builds, (b) the
serving result's quality vs the exact reference, (c) that the flat-PQ
and IVF serving paths share one persisted artifact, and (d) that the
probed scan actually prunes partitions (the physical IVF claim)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from affinity_propagation_mapreduce_spark.operators import ann_index as ai
from affinity_propagation_mapreduce_spark.operators.vector import (
    N_QUERIES,
    TOP_K,
    q_knn_cosine_topk,
)

from .conftest import SF_SMALL, SF_T2


def _recall(exact_rows, approx_rows) -> float:
    exact = {(r.query_id, r.neighbor_id) for r in exact_rows}
    approx = {(r.query_id, r.neighbor_id) for r in approx_rows}
    return len(exact & approx) / len(exact)


def test_build_idempotent_and_complete(spark):
    p1 = ai.build_ann_index(spark, SF_SMALL)
    p2 = ai.build_ann_index(spark, SF_SMALL)
    assert p1 == p2
    for part in ("_SUCCESS", "meta.json",
                 "centroids.parquet", "codebooks.parquet"):
        assert os.path.exists(os.path.join(p1, part)), part
    # the codes tree resolves through the generation pointer (v3)
    assert os.path.isdir(ai.codes_root(p1))


def test_index_path_is_content_addressed():
    assert ai.ann_index_path(SF_SMALL) != ai.ann_index_path(SF_T2)


def test_index_stats_gate_green(spark):
    row = ai.q_ann_index_stats(spark, SF_SMALL).first()
    assert row.n_vectors == 500
    assert row.bytes_per_vector == row.pq_m + 8
    assert 0 < row.n_cells_used <= row.nlist


def test_served_schema_and_recall(spark):
    res = ai.q_knn_cosine_served(spark, SF_SMALL)
    assert res.columns == ["query_id", "neighbor_id", "cosine", "rn"]
    rows = res.collect()
    assert len(rows) == N_QUERIES * TOP_K
    exact = q_knn_cosine_topk(spark, SF_SMALL).collect()
    # in-query floor is 0.3 (structural); the measured value on this
    # corpus should be comfortably above it
    assert _recall(exact, rows) >= 0.5


def test_flat_pq_shares_artifact_and_beats_floor(spark):
    path = ai.build_ann_index(spark, SF_SMALL)
    qids, qmat, qnrm = ai._query_rows(spark, SF_SMALL)
    shortlist = ai.search_flat_pq(spark, path, qids, qmat, qnrm)
    res = ai._exact_rerank(
        spark, ai._norms(spark, SF_SMALL), shortlist, qids, qmat, qnrm
    ).collect()
    exact = q_knn_cosine_topk(spark, SF_SMALL).collect()
    # flat scan prunes nothing, so its recall dominates the IVF path's
    assert _recall(exact, res) >= 0.5
    assert len(res) == N_QUERIES * TOP_K


def test_served_scan_is_partition_pruned(spark):
    """The physical IVF claim: the serving scan must carry the probed
    cells as PartitionFilters — unprobed cell directories are never
    read.  Asserted on the plan of the pruned codes scan itself."""
    path = ai.build_ann_index(spark, SF_T2)
    qids, qmat, qnrm = ai._query_rows(spark, SF_T2)
    meta, cent_mat, _books = ai.load_ann_model(spark, path)
    cell_to_q = ai._probe_map(cent_mat, qmat, ai.IVFPQ_QUERY_PROBE)
    from pyspark.sql import functions as F

    codes = spark.read.parquet(ai.codes_root(path)).where(
        F.col("cell").isin([int(c) for c in cell_to_q])
    )
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # probing 10 queries x 8 cells can touch at most 80 distinct cells
    n_cells = codes.select("cell").distinct().count()
    assert n_cells <= min(len(cell_to_q), meta["nlist"])
    assert len(cell_to_q) <= N_QUERIES * ai.IVFPQ_QUERY_PROBE


def test_incremental_append_roundtrip(spark):
    """Build-on-base + append-delta must hold every corpus vector
    exactly once, be idempotent per batch tag, and clear the recall
    floor — all enforced inside the declared query (raises otherwise)."""
    row = ai.q_ann_index_incremental(spark, SF_SMALL).first()
    assert row.n_base + row.n_delta == 500
    assert row.n_delta > 0
    # r10: the gate also runs the deletion round trip (tombstone + fold
    # + one re-insert-after-delete, hence the +1)
    assert row.n_live == 500 - row.n_deleted + 1 and row.n_deleted > 0
    # run it twice: second pass must hit the idempotence path cleanly
    row2 = ai.q_ann_index_incremental(spark, SF_SMALL).first()
    assert row2 == row


def test_append_rejects_duplicate_batch_tag(spark):
    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.sources import table

    path = ai.build_ann_index(spark, SF_SMALL)
    delta = table(spark, SF_SMALL, "embeddings").where(F.col("vec_id") < 0)
    # empty frame: applying any tag twice must return 0 the second time
    assert ai.append_ann_index(spark, path, delta, "t-empty") == 0
    assert ai.append_ann_index(spark, path, delta, "t-empty") == 0


def test_compaction_folds_batches_and_keeps_ledger(spark):
    """After compaction the per-batch dirs are gone, rows survive
    exactly, and the replayed batch stays a no-op via the meta ledger."""
    import json

    row = ai.q_ann_index_incremental(spark, SF_SMALL).first()  # built+appended+deleted
    path = ai.ann_index_path(SF_SMALL) + "-incr"
    comp = ai.compact_ann_index(spark, path)
    assert comp["rows"] == row.n_live  # the r10 gate already folded its takedown slice
    assert comp["rows_tombstoned"] == 0
    batch_dirs = [
        n
        for n in os.listdir(ai.codes_root(path))
        if n.startswith("batch=") and n != "batch=base"
    ]
    assert batch_dirs == []
    with open(os.path.join(path, "meta.json")) as fh:
        assert "delta-bucket-0" in json.load(fh)["batches"]


def test_reap_superseded_indexes(tmp_path):
    """Same-corpus layouts with a different fingerprint are removed;
    the current layout and a flock-held sibling survive."""
    import fcntl

    import time

    parent = tmp_path / "v2"
    parent.mkdir()
    # r10: names must match the layout structure (16-hex fingerprint)
    # and victims must have quiesced past the read grace window
    current = parent / ("corpus-" + "a" * 16)
    stale = parent / ("corpus-" + "b" * 16)
    held = parent / ("corpus-" + "c" * 16)
    other = parent / ("other-" + "d" * 16)
    for d in (current, stale, held, other):
        d.mkdir()
        old = time.time() - ai._REAP_GRACE_SEC - 60
        os.utime(d, (old, old))
    fd = os.open(f"{held}.lock", os.O_CREAT | os.O_WRONLY, 0o644)
    fcntl.flock(fd, fcntl.LOCK_EX)
    try:
        ai._reap_superseded_indexes(str(current))
    finally:
        os.close(fd)
    assert current.is_dir()
    assert not stale.exists()
    assert held.is_dir()  # live writer held the flock
    assert other.is_dir()  # different corpus prefix untouched


def test_direct_path_read_equals_root_scan(spark):
    """The direct-path probed-cell read (listing O(probed) dirs instead
    of all nlist — the 26→15 s serve win at 10M) must return exactly
    the shortlist the root-scan + partition-filter formulation does."""
    from pyspark.sql import functions as F

    path = ai.build_ann_index(spark, SF_T2)
    qids, qmat, qnrm = ai._query_rows(spark, SF_T2)
    direct = ai.search_ann_index(spark, path, qids, qmat, qnrm)
    meta, cent_mat, books = ai.load_ann_model(spark, path)
    shortlist = max(ai.PQ_SHORTLIST, meta["n"] // ai.PQ_SHORTLIST_FRAC)
    # the reference probe map must mirror the serve default (r10: auto)
    cell_to_q = ai._probe_map(cent_mat, qmat, ai.auto_n_probe(meta["nlist"]))
    root = spark.read.parquet(ai.codes_root(path)).where(
        F.col("cell").isin([int(c) for c in cell_to_q])
    )
    ref = ai._adc_scan(
        spark, root, meta, books, qids, qmat, qnrm, shortlist, cell_to_q
    )
    assert direct.exceptAll(ref).count() == 0
    assert ref.exceptAll(direct).count() == 0


def test_probe_map_covers_every_query():
    rng = np.random.default_rng(3)
    cent = rng.normal(size=(16, 4))
    q = rng.normal(size=(7, 4))
    c2q = ai._probe_map(cent, q, 3)
    seen = sorted({p for lst in c2q.values() for p in lst})
    assert seen == list(range(7))
    counts = {}
    for lst in c2q.values():
        for p in lst:
            counts[p] = counts.get(p, 0) + 1
    assert all(v == 3 for v in counts.values())
