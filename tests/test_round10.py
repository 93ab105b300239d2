"""Round-10 verdict items: adaptive serving probe width (#2), ANN index
tombstone deletions (#3), the coded flat-vs-IVF selection rule (#4), and
the advice-r9 layout-maintenance fixes (crashed-compaction repair,
structural sibling matching, age-gated scratch reaping)."""

from __future__ import annotations

import json
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from affinity_propagation_mapreduce_spark.operators import ann_index as ai

from .conftest import SF_SMALL


class TestAdaptiveProbeWidth:
    """r9 verdict #2: the fixed default n_probe=8 measured 0.54 recall
    at N=10M while 32 read 0.92 at flat wall — the default must scale
    with the index geometry, floored at the measured-good 32."""

    def test_floor_is_the_measured_32(self):
        # every nlist from the measured ladder (1M/2M) resolves to >= 32
        for nlist in (283, 894, 2828, 4000):
            assert ai.auto_n_probe(nlist) == 32

    def test_grows_with_nlist_past_the_10m_regime(self):
        # 10M (nlist=8944) must not sit at the floor forever: the probed
        # CELL fraction stops shrinking once nlist/256 passes 32
        assert ai.auto_n_probe(8944) == 34
        assert ai.auto_n_probe(12649) == 49  # 20M
        assert ai.auto_n_probe(28284) == 110  # ~100M
        # the probed-cell fraction is bounded below past the crossover
        for nlist in (8944, 12649, 28284, 100000):
            assert ai.auto_n_probe(nlist) >= nlist // ai.AUTO_PROBE_NLIST_FRAC

    def test_never_exceeds_nlist(self):
        assert ai.auto_n_probe(5) == 5
        assert ai.auto_n_probe(31) == 31

    def test_search_default_resolves_to_auto(self, spark):
        # n_probe=None through the serving path must behave as the auto
        # width: identical shortlist to the explicit auto value
        path = ai.build_ann_index(spark, SF_SMALL)
        with open(os.path.join(path, "meta.json")) as fh:
            nlist = json.load(fh)["nlist"]
        qids, qmat, qnrm = ai._query_rows(spark, SF_SMALL)
        a = ai.search_ann_index(spark, path, qids, qmat, qnrm)
        b = ai.search_ann_index(
            spark, path, qids, qmat, qnrm, n_probe=ai.auto_n_probe(nlist)
        )
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestSelectionRule:
    """r9 verdict #4: the BASELINE.md prose rule is now code, and the
    auto choice must match the measured winner."""

    def test_auto_matches_measured_winner_at_1m_geometry(self):
        # measured 1M index: nlist=2828; the IVF-pruned serve won BOTH
        # the |Q|=10 cell (15.8 vs 19.3 s flat) and the |Q|=10k cell
        # (37.3 s vs >3000 s) — the rule is |Q|-independent since the
        # r9 adaptive-probe measurement bought flat's recall back
        n_probe = ai.auto_n_probe(2828)
        for _q in (10, 10_000):
            assert ai.choose_search_mode(2828, n_probe) == "ivf"
        # same winner at the 10M geometry (nlist=8944, measured r9)
        assert ai.choose_search_mode(8944, ai.auto_n_probe(8944)) == "ivf"

    def test_flat_only_when_pruning_cannot_engage(self):
        # probing >= half the cells prunes (less than) half the scan —
        # the probe map is pure overhead and flat's recall is free
        assert ai.choose_search_mode(50, ai.auto_n_probe(50)) == "flat"
        assert ai.choose_search_mode(64, 32) == "flat"
        assert ai.choose_search_mode(65, 32) == "ivf"

    def test_search_auto_serves_and_reports_mode(self, spark):
        path = ai.build_ann_index(spark, SF_SMALL)
        with open(os.path.join(path, "meta.json")) as fh:
            nlist = json.load(fh)["nlist"]
        qids, qmat, qnrm = ai._query_rows(spark, SF_SMALL)
        df, mode = ai.search_auto(spark, path, qids, qmat, qnrm)
        assert mode == ai.choose_search_mode(nlist, ai.auto_n_probe(nlist))
        assert df.count() > 0


class TestTombstoneDeletes:
    """r9 "What's missing" #1: deletions without a rebuild.  The e2e
    ledger/fold/recall round trip is the declared driver gate
    (q_ann_index_incremental); these tests pin the pre-compaction
    serving semantics the gate's post-fold checks can't see."""

    @pytest.fixture()
    def dpath(self, spark, tmp_path):
        # a private layout so deletions never touch the shared index
        path = str(tmp_path / "idx")
        raw = ai.table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
        ai.build_ann_index(spark, SF_SMALL, path=path, emb_raw=raw)
        return path

    def test_pending_tombstones_filter_the_serve(self, spark, dpath):
        qids, qmat, qnrm = ai._query_rows(spark, SF_SMALL)
        before = ai.search_ann_index(spark, dpath, qids, qmat, qnrm)
        victims = before.select(
            F.col("neighbor_id").alias("vec_id")
        ).distinct().limit(5)
        victim_ids = {r.vec_id for r in victims.collect()}
        raw = ai.table(spark, SF_SMALL, "embeddings")
        n_del = ai.delete_ann_index(
            spark, dpath, raw.where(F.col("vec_id").isin(victim_ids)), "t1"
        )
        assert n_del == len(victim_ids)
        # BEFORE any compaction the tombstones must already be invisible
        after = ai.search_ann_index(spark, dpath, qids, qmat, qnrm)
        got = {r.neighbor_id for r in after.collect()}
        assert not (got & victim_ids)
        # deleted rows cannot displace live candidates: the filter runs
        # below the kernel, so the shortlist refills with survivors
        assert after.groupBy("query_id").count().agg(
            F.min("count")
        ).first()[0] > 0

    def test_delete_is_idempotent_and_ledgered(self, spark, dpath):
        raw = ai.table(spark, SF_SMALL, "embeddings")
        sel = raw.where(F.col("vec_id") < 7)
        assert ai.delete_ann_index(spark, dpath, sel, "t2") == 7
        assert ai.delete_ann_index(spark, dpath, sel, "t2") == 0
        comp = ai.compact_ann_index(spark, dpath)
        assert comp["rows_tombstoned"] == 7
        assert not ai._tombstone_dirs(dpath)
        # the ledger survives the fold — a replayed feed stays a no-op
        assert ai.delete_ann_index(spark, dpath, sel, "t2") == 0
        with open(os.path.join(dpath, "meta.json")) as fh:
            assert "t2" in json.load(fh)["deletes"]

    def test_incremental_gate_roundtrip(self, spark):
        # the declared driver gate end-to-end (append + delete + fold)
        row = ai.q_ann_index_incremental(spark, SF_SMALL).first()
        assert row.n_deleted > 0
        # +1: the gate re-inserts one tombstoned vector as a fresh batch
        assert row.n_live == row.n_base + row.n_delta - row.n_deleted + 1

    def test_tombstone_antijoin_enters_plan_only_when_pending(self, spark, dpath):
        # no tombstones → the serving scan is untouched (no join node);
        # pending tombstones → one left-anti join BELOW the ADC kernel
        raw = ai.table(spark, SF_SMALL, "embeddings")
        clean = ai._live_codes(
            spark, dpath, spark.read.parquet(ai.codes_root(dpath))
        )
        assert "Join" not in clean._jdf.queryExecution().executedPlan().toString()
        ai.delete_ann_index(spark, dpath, raw.where(F.col("vec_id") < 3), "t3")
        dirty = ai._live_codes(
            spark, dpath, spark.read.parquet(ai.codes_root(dpath))
        )
        plan = dirty._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in plan and "BroadcastHashJoin" in plan


class TestCentroidDriftFrames:
    """The base-vs-batch drift monitor (the md5-half split of
    q_embedding_drift cannot see an append batch by construction)."""

    def test_reads_an_injected_shift(self, spark):
        import numpy as np

        rng = np.random.default_rng(5)
        a_rows = [(int(i % 3), [float(v) for v in rng.normal(size=4)])
                  for i in range(300)]
        shift = np.array([2.0, 0.0, 0.0, 0.0])
        b_rows = [(int(i % 3), [float(v) for v in rng.normal(size=4) + shift])
                  for i in range(150)]
        from affinity_propagation_mapreduce_spark.operators import vector as V

        schema = "label long, emb array<double>"
        out = {
            r.label: r
            for r in V.centroid_drift_frames(
                spark.createDataFrame(a_rows, schema),
                spark.createDataFrame(b_rows, schema),
            ).collect()
        }
        assert set(out) == {0, 1, 2}
        for r in out.values():
            assert r.n_a == 100 and r.n_b == 50
            # injected drift 2.0 along dim 0; sampling noise ~ 1/sqrt(50)
            assert 1.5 < r.centroid_drift < 2.5

    def test_null_reads_near_zero(self, spark):
        import numpy as np

        rng = np.random.default_rng(6)
        rows = [(int(i % 2), [float(v) for v in rng.normal(size=4)])
                for i in range(2000)]
        from affinity_propagation_mapreduce_spark.operators import vector as V

        schema = "label long, emb array<double>"
        a = spark.createDataFrame(rows[:1000], schema)
        b = spark.createDataFrame(rows[1000:], schema)
        drifts = [r.centroid_drift
                  for r in V.centroid_drift_frames(a, b).collect()]
        assert all(d < 0.5 for d in drifts)


class TestLayoutMaintenance:
    """Layout maintenance invariants: v3 generation-pointer commits
    (r11), structural sibling match, age-gated scratch reap."""

    def _mini_layout(self, spark, tmp_path, name="idx"):
        path = str(tmp_path / name)
        raw = ai.table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
        ai.build_ann_index(spark, SF_SMALL, path=path, emb_raw=raw)
        return path

    def test_crashed_compaction_is_invisible_to_readers(self, spark, tmp_path):
        # v3 (advice r10 #1): a compaction that dies AFTER renaming its
        # new tree in but BEFORE the meta flip leaves an unreferenced
        # orphan — the pointer still reads gen G, so serving is
        # untouched, and the next compaction replaces the orphan and
        # commits cleanly.  No repair path exists or is needed.
        path = self._mini_layout(spark, tmp_path)
        gen = ai._gen_of(ai._read_meta(path))
        orphan = ai._codes_root_gen(path, gen + 1)
        os.makedirs(os.path.join(orphan, "batch=bogus"))  # simulated crash
        qids, qmat, qnrm = ai._query_rows(spark, SF_SMALL)
        before = ai.search_ann_index(spark, path, qids, qmat, qnrm).count()
        assert before > 0  # served gen G, orphan never consulted
        comp = ai.compact_ann_index(spark, path)
        assert comp["rows"] == 500
        assert ai._gen_of(ai._read_meta(path)) == gen + 1
        # the orphan's bogus content was replaced by the real fold
        assert not os.path.isdir(os.path.join(orphan, "batch=bogus"))
        assert ai.search_ann_index(spark, path, qids, qmat, qnrm).count() > 0

    def test_compaction_commit_is_one_meta_flip(self, spark, tmp_path):
        # the commit point is the atomic meta replace: generation bump,
        # ledger merge, cover clear, and advisory-n resync land together
        path = self._mini_layout(spark, tmp_path)
        raw = ai.table(spark, SF_SMALL, "embeddings")
        ai.delete_ann_index(spark, path, raw.where(F.col("vec_id") < 5), "tg")
        meta0 = ai._read_meta(path)
        assert meta0["delete_cover"]["tg"] and meta0["n"] == 495
        comp = ai.compact_ann_index(spark, path)
        meta1 = ai._read_meta(path)
        assert meta1["generation"] == meta0.get("generation", 0) + 1
        assert meta1["delete_cover"] == {}
        assert "tg" in meta1["deletes"]
        assert meta1["n"] == comp["rows"] == 495
        # the superseded gen tree is stamped for the age-gated reap, not
        # deleted inline (in-flight gen-G readers keep their files)
        old_root = ai._codes_root_gen(path, meta0.get("generation", 0))
        assert os.path.isdir(old_root)
        assert time.time() - os.path.getmtime(old_root) < 60

    def test_scratch_reap_collects_superseded_generations(self, spark, tmp_path):
        path = self._mini_layout(spark, tmp_path)
        ai.compact_ann_index(spark, path)  # gen 0 -> 1
        old_root = ai._codes_root_gen(path, 0)
        new_root = ai._codes_root_gen(path, 1)
        stale = time.time() - ai._REAP_GRACE_SEC - 60
        os.utime(old_root, (stale, stale))
        os.utime(new_root, (stale, stale))  # quiesced but CURRENT
        orphan = ai._codes_root_gen(path, 7)
        os.makedirs(orphan)
        os.utime(orphan, (stale, stale))
        ai._reap_layout_scratch(path)
        assert not os.path.isdir(old_root)  # superseded + quiesced: reaped
        assert not os.path.isdir(orphan)  # unreferenced orphan: reaped
        assert os.path.isdir(new_root)  # the pointed-at tree: never touched

    def test_scratch_reap_is_age_gated(self, tmp_path):
        path = str(tmp_path / "layout")
        os.makedirs(path)
        old = os.path.join(path, ".batch-tmp-old")
        fresh = os.path.join(path, ".compact-tmp-fresh")
        os.makedirs(old)
        os.makedirs(fresh)
        stale = time.time() - ai._REAP_GRACE_SEC - 60
        os.utime(old, (stale, stale))
        ai._reap_layout_scratch(path)
        assert not os.path.isdir(old)  # aged orphan reaped (advice #4)
        assert os.path.isdir(fresh)  # in-grace scratch kept (advice #3)

    def test_sibling_match_is_structural(self, tmp_path):
        # advice r9 #2: /data/x's reaper must not eat /data/x-y's index
        parent = tmp_path / "v2"
        parent.mkdir()
        mine = parent / ("data_x-" + "0" * 16)
        other_corpus = parent / ("data_x-y-" + "1" * 16)
        superseded = parent / ("data_x-" + "2" * 16)
        incr_kind = parent / ("data_x-" + "3" * 16 + "-incr")
        for d in (mine, other_corpus, superseded, incr_kind):
            d.mkdir()
            stale = time.time() - ai._REAP_GRACE_SEC - 60
            os.utime(d, (stale, stale))
        ai._reap_superseded_indexes(str(mine))
        assert mine.is_dir()
        assert other_corpus.is_dir()  # different corpus — untouched
        assert incr_kind.is_dir()  # different kind — untouched
        assert not superseded.is_dir()  # same corpus, old fingerprint

    def test_reap_respects_read_recency(self, tmp_path):
        parent = tmp_path / "v2"
        parent.mkdir()
        mine = parent / ("data_x-" + "0" * 16)
        recent = parent / ("data_x-" + "4" * 16)
        mine.mkdir()
        recent.mkdir()
        ai._touch_last_read(str(recent))  # a reader just resolved it
        ai._reap_superseded_indexes(str(mine))
        assert recent.is_dir()
