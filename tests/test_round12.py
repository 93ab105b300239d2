"""Round-12 verdict items: the bulk-serving recall floor (#2), one meta
snapshot threaded through the serve path (#3), the odd-d PQ degeneracy
guard (#6), and the advice-r11 fixes (pre-commit mtime stamp, tombstone
byte fallback, store_raw short-circuit mismatch)."""

from __future__ import annotations

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from affinity_propagation_mapreduce_spark.operators import ann_index as ai
from affinity_propagation_mapreduce_spark.operators import vector as V

from .conftest import SF_SMALL


class TestRecallFloor:
    """r11 verdict "What's missing" #1: the throughput narrowing served
    0.54 recall at 10M bulk with no gate on it.  The floor makes the
    measured width→recall curve a contract: mode="auto" never narrows
    below the BULK_RECALL_FLOOR-satisfying width; the probe-8 wall is
    now an explicit opt-in (mode="throughput" / min_recall=None)."""

    def test_default_schedule_never_serves_below_the_floor(self):
        # the law the verdict asked to pin: for ANY geometry and ANY
        # batch size, the default schedule resolves at or above the
        # floor-satisfying width — no silent half-recall serves
        for nlist in (5, 64, 2828, 8944, 12649, 100_000):
            lo = ai.min_width_for_recall(nlist, ai.BULK_RECALL_FLOOR)
            for n in (1_000, 1_000_000, 10_000_000, 1_000_000_000):
                for q in (1, 10, 1_000, 10_000, 10_000_000):
                    assert ai.plan_n_probe(nlist, n, q) >= lo

    def test_bulk_calibration_point_resolves_to_the_floor_width(self):
        # 10M (nlist=8944, auto=34): budget arithmetic alone would give
        # probe-8 (0.54 recall measured); the default stops at the
        # half-auto floor width instead (recall ≥ the 0.8 floor —
        # BASELINE §round-12 bulk sweep)
        assert ai.plan_n_probe(8944, 10_000_000, 10_000) == 17
        assert ai.plan_n_probe(8944, 10_000_000, 10_000, mode="throughput") == 8

    def test_min_recall_none_matches_throughput_mode(self):
        for q in (10, 10_000, 1_000_000):
            assert ai.plan_n_probe(
                8944, 10_000_000, q, min_recall=None
            ) == ai.plan_n_probe(8944, 10_000_000, q, mode="throughput")

    def test_high_floor_pins_the_recall_width(self):
        # above the measured half-width band only the full auto width
        # has evidence (0.88-0.96 across the ladder)
        assert (
            ai.min_width_for_recall(8944, 0.9) == ai.auto_n_probe(8944)
        )
        assert ai.plan_n_probe(
            8944, 10_000_000, 10_000, min_recall=0.9
        ) == ai.auto_n_probe(8944)

    def test_low_floor_allows_the_throughput_width(self):
        # a request at/below the measured probe-8 recall band may
        # legitimately narrow all the way down
        assert ai.min_width_for_recall(8944, 0.5) == ai.PROBE_THROUGHPUT_MIN
        assert ai.plan_n_probe(8944, 10_000_000, 10_000, min_recall=0.5) == 8

    def test_floor_width_bounded_by_auto_width(self):
        for nlist in (5, 64, 2828, 8944, 100_000):
            w = ai.auto_n_probe(nlist)
            for mr in (None, 0.3, 0.54, 0.8, 0.9, 0.99):
                assert 1 <= ai.min_width_for_recall(nlist, mr) <= w


class TestSnapshotThreading:
    """r11 verdict "What's missing" #2: a serve used to read meta up to
    3×; a concurrent compaction flipping the generation mid-serve was
    value-safe only by invariant argument.  serve_topk now loads ONE
    model snapshot and threads it through shortlist, tombstone
    anti-join, and rerank."""

    @pytest.fixture()
    def rpath(self, spark, tmp_path):
        path = str(tmp_path / "raw-idx")
        raw = ai.table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
        ai.build_ann_index(spark, SF_SMALL, path=path, emb_raw=raw, store_raw=True)
        return path

    def test_serve_loads_the_model_exactly_once(self, spark, rpath, monkeypatch):
        qids, qmat, qnrm = ai._query_rows(spark, SF_SMALL)
        calls = {"load": 0}
        real_load = ai.load_ann_model

        def counting_load(spark_, path_):
            calls["load"] += 1
            return real_load(spark_, path_)

        monkeypatch.setattr(ai, "load_ann_model", counting_load)
        # _read_meta must not run at all inside a serve: every consumer
        # gets the threaded snapshot
        monkeypatch.setattr(
            ai, "_read_meta",
            lambda p: (_ for _ in ()).throw(
                AssertionError("serve path re-read meta.json")
            ),
        )
        res = ai.serve_topk(spark, rpath, qids, qmat, qnrm)
        assert res.count() > 0
        assert calls["load"] == 1

    def test_generation_flip_mid_serve_reads_one_snapshot(
        self, spark, rpath, monkeypatch
    ):
        qids, qmat, qnrm = ai._query_rows(spark, SF_SMALL)
        baseline = sorted(
            tuple(r) for r in ai.serve_topk(spark, rpath, qids, qmat, qnrm)
            .select("query_id", "neighbor_id").collect()
        )
        # tombstone ids that actually sit in the served top-k (skipping
        # the query ids themselves) so the flip below rewrites results
        dead_ids = sorted(
            {nb for _q, nb in baseline if nb >= len(qids)}
        )[:20]
        dead = spark.createDataFrame(
            [(int(v),) for v in dead_ids], "vec_id long"
        )
        ai.delete_ann_index(spark, rpath, dead, "flip-drill")
        after_delete = sorted(
            tuple(r) for r in ai.serve_topk(spark, rpath, qids, qmat, qnrm)
            .select("query_id", "neighbor_id").collect()
        )
        gen_before = ai._gen_of(ai._read_meta(rpath))

        real_load = ai.load_ann_model
        state = {"loads": 0}

        def load_then_compact(spark_, path_):
            model = real_load(spark_, path_)
            if state["loads"] == 0:
                # the race: compaction commits (generation flips) AFTER
                # the serve took its snapshot but BEFORE the scan runs
                ai.compact_ann_index(spark_, path_)
                assert ai._gen_of(ai._read_meta(path_)) == gen_before + 1
            state["loads"] += 1
            return model

        monkeypatch.setattr(ai, "load_ann_model", load_then_compact)
        raced = sorted(
            tuple(r) for r in ai.serve_topk(spark, rpath, qids, qmat, qnrm)
            .select("query_id", "neighbor_id").collect()
        )
        assert state["loads"] == 1  # one snapshot — the mechanism itself
        # the raced serve reads gen-G end to end: same result as the
        # undisturbed post-delete serve (the live set is unchanged by
        # compaction, and no file of the snapshot generation vanished)
        assert raced == after_delete
        assert baseline != after_delete  # the delete actually bit


class TestRerankJoinShape:
    def test_interactive_rerank_broadcasts_the_shortlist(self, spark):
        # at 10M×d=768 the sort-merge formulation shuffled the 29 GB
        # corpus against a 40k-row shortlist and filled the disk; the
        # interactive path must broadcast the shortlist side
        path = ai.build_ann_index(spark, SF_SMALL)
        qids, qmat, qnrm = ai._query_rows(spark, SF_SMALL)
        res = ai.serve_topk(
            spark, path, qids, qmat, qnrm, norms_df=ai._norms(spark, SF_SMALL)
        )
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # the corpus side must not be exchanged for the rerank join:
        # the only sort-merge joins allowed are none at this |Q|
        assert "SortMergeJoin" not in plan

    def test_bulk_rerank_scores_the_store_in_place(self, spark):
        # a bulk shortlist must neither be force-broadcast as a JOIN
        # side (40M-row hash relation = executor OOM) nor trigger the
        # keyed shuffle of the full-precision store (~60 GB of f8 bytes
        # per 10M×d=768 batch — measured to fill the disk quota): the
        # pair-broadcast band scores the store IN PLACE via mapInPandas
        from affinity_propagation_mapreduce_spark.operators.vector import (
            _exact_rerank,
        )

        path = ai.build_ann_index(spark, SF_SMALL)
        qids, qmat, qnrm = ai._query_rows(spark, SF_SMALL)
        sl = ai.search_ann_index(spark, path, qids, qmat, qnrm)
        res = _exact_rerank(
            spark, ai._norms(spark, SF_SMALL), sl, qids, qmat, qnrm,
            shortlist_rows=50_000_000, store_rows=10**12,
        )
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan
        assert "SortMergeJoin" not in plan and "Join" not in plan

    def test_pair_rerank_matches_the_join_formulation(self, spark):
        # same shortlist through both bands: identical (query, neighbor,
        # rn) rows, cosine equal to fold arithmetic within float noise
        from affinity_propagation_mapreduce_spark.operators.vector import (
            _exact_rerank,
        )

        path = ai.build_ann_index(spark, SF_SMALL)
        qids, qmat, qnrm = ai._query_rows(spark, SF_SMALL)
        sl = ai.search_ann_index(
            spark, path, qids, qmat, qnrm
        ).localCheckpoint(eager=True)
        norms = ai._norms(spark, SF_SMALL)
        via_join = _exact_rerank(
            spark, norms, sl, qids, qmat, qnrm, shortlist_rows=10
        )
        via_pairs = _exact_rerank(
            spark, norms, sl, qids, qmat, qnrm, shortlist_rows=50_000_000,
            store_rows=10**12,
        )
        a = {(r.query_id, r.neighbor_id, r.rn): r.cosine
             for r in via_join.collect()}
        b = {(r.query_id, r.neighbor_id, r.rn): r.cosine
             for r in via_pairs.collect()}
        assert a.keys() == b.keys() and len(a) > 0
        for k in a:
            assert abs(a[k] - b[k]) < 1e-9

    def test_giant_shortlist_falls_back_to_the_keyed_shuffle(self, spark):
        # above the pair-broadcast cap the shuffle is the honest cost;
        # the shortlist side must not carry a forced broadcast hint
        from affinity_propagation_mapreduce_spark.operators.vector import (
            _PAIR_RERANK_MAX_PAIRS,
            _exact_rerank,
        )

        path = ai.build_ann_index(spark, SF_SMALL)
        qids, qmat, qnrm = ai._query_rows(spark, SF_SMALL)
        sl = ai.search_ann_index(spark, path, qids, qmat, qnrm)
        res = _exact_rerank(
            spark, ai._norms(spark, SF_SMALL), sl, qids, qmat, qnrm,
            shortlist_rows=_PAIR_RERANK_MAX_PAIRS + 1, store_rows=10**12,
        )
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "ResolvedHint" not in plan


class TestAdviceR11:
    def test_store_raw_mismatch_on_complete_layout_raises(self, spark, tmp_path):
        path = str(tmp_path / "nonraw-idx")
        raw = ai.table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
        ai.build_ann_index(spark, SF_SMALL, path=path, emb_raw=raw)
        # same path, raw requested: the short-circuit must refuse, not
        # silently hand back a raw=false layout
        with pytest.raises(ValueError, match="store_raw"):
            ai.build_ann_index(
                spark, SF_SMALL, path=path, emb_raw=raw, store_raw=True
            )
        # re-requesting the matching flavor still short-circuits fine
        assert ai.build_ann_index(spark, SF_SMALL, path=path, emb_raw=raw) == path

    def test_tombstone_rows_estimates_unreadable_files_by_bytes(self, tmp_path):
        d = tmp_path / "tombstones.g0.parquet" / "del=broken"
        d.mkdir(parents=True)
        (d / "part-00000.parquet").write_bytes(b"\x00" * 8000)  # not parquet
        rows = ai._tombstone_rows([str(d)])
        # 8000 bytes / 8 B-per-row lower bound → 1000 estimated rows:
        # an unreadable footer OVERcounts toward the shuffle path, never
        # undercounts toward a broadcast OOM
        assert rows["broken"] == 1000

    def test_compaction_stamps_old_trees_before_the_commit(
        self, spark, tmp_path, monkeypatch
    ):
        path = str(tmp_path / "stamp-idx")
        raw = ai.table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
        ai.build_ann_index(spark, SF_SMALL, path=path, emb_raw=raw)
        gen = ai._gen_of(ai._read_meta(path))
        old_root = ai._codes_root_gen(path, gen)
        stale = time.time() - 10_000
        os.utime(old_root, (stale, stale))

        real_replace = os.replace

        def dying_replace(src, dst):
            if dst.endswith("meta.json"):
                raise OSError("crash between stamp and commit")
            return real_replace(src, dst)

        monkeypatch.setattr(ai.os, "replace", dying_replace)
        with pytest.raises(OSError, match="crash between"):
            ai.compact_ann_index(spark, path)
        monkeypatch.undo()
        # the stamp landed BEFORE the (failed) commit: even though the
        # meta flip never happened, the still-live tree has a fresh
        # mtime — and in the crash-after-commit window the reaper now
        # sees a fresh superseded tree instead of a 10ks-stale one
        assert os.path.getmtime(old_root) > stale + 5_000


class TestStreamIngestTwin:
    """r11 verdict "What's missing" #3: the index append path was
    batch-only; the production crawl shape is a stream of embedding
    batches folding into the served index."""

    def test_stream_ingest_serves_the_batch_twin_topk(self, spark):
        # the gate itself raises on <2 micro-batches, layout divergence,
        # served top-k inequality, or a recall collapse — reaching the
        # summary row IS the equality proof; re-assert the headline
        # numbers here so the test documents them
        row = ai.q_ann_index_stream_ingest(spark, SF_SMALL).first()
        assert row.n_stream_batches >= 2
        assert row.n_del_batches >= 1  # the r13 streaming-delete leg ran
        # live = everything minus the deleted slice plus its re-adds
        # (delta parts 2,3 land after the delete; exact re-add count is
        # data-dependent, so bound it)
        assert (
            row.n_base + row.n_delta - row.n_deleted
            <= row.n_live
            < row.n_base + row.n_delta
        )
        assert row.n_topk_rows > 0

    def test_stream_ingest_gate_is_idempotent(self, spark):
        # second run against the persisted layouts: every append
        # no-ops (tags), the feed and checkpoint are reused, and the
        # gate still passes with identical numbers
        a = ai.q_ann_index_stream_ingest(spark, SF_SMALL).first()
        b = ai.q_ann_index_stream_ingest(spark, SF_SMALL).first()
        assert tuple(a) == tuple(b)


class TestPerceptualHash:
    """r11 verdict #8: dedup on decoded CONTENT — the block-mean hash
    must be invariant to the planted uniform-brightness shift while the
    payload bytes differ, and the real BMP codec sits in the hot path."""

    def test_group_members_share_hash_with_different_bytes(self, spark):
        from affinity_propagation_mapreduce_spark.operators import (
            multimodal as mm,
        )

        df = mm.q_media_phash_neardup(spark, SF_SMALL)
        rows = {
            r.asset_id: r
            for r in df.where(F.col("asset_id").isin(1, 51, 101, 2)).collect()
        }
        # 1, 51, 101 share group 1 but differ in brightness offset
        # (1 % 7, 51 % 7, 101 % 7 = 1, 2, 3 — genuinely different bytes)
        assert rows[1].phash == rows[51].phash == rows[101].phash
        assert rows[1].canonical_id == rows[51].canonical_id
        assert rows[1].is_dup == 0 or rows[1].canonical_id < 1
        assert rows[51].is_dup == 1
        # a different group hashes differently (pattern 37·g separates
        # block structure)
        assert rows[2].phash != rows[1].phash

    def test_hash_reads_the_decoded_pixels(self):
        # the fingerprint must be computed from what the codec DECODES:
        # a content change (one block blown to 255) flips the hash, and
        # the round trip through real BMP bytes is in the path
        from affinity_propagation_mapreduce_spark.operators import (
            multimodal as mm,
        )

        def phash_of(img):
            dec = mm.decode_image(mm.encode_bmp(img))
            gray = dec.astype("i8").sum(axis=2)
            bsum = gray.reshape(8, 2, 8, 2).sum(axis=(1, 3))
            bits = (64 * bsum > int(gray.sum())).reshape(64)
            return "".join("1" if b else "0" for b in bits)

        i = np.arange(16 * 16 * 3, dtype="i8")
        img = (((37 + i) * 11) % 249).reshape(16, 16, 3).astype(np.uint8)
        base = phash_of(img)
        # uniform brightness shift → invariant (the planted-dup law)
        assert phash_of((img.astype("i8") + 5).astype(np.uint8)) == base
        # local content change → the hash moves: blow up a block whose
        # bit is currently 0 (first such block in the base hash)
        b0 = base.index("0")
        by, bx = b0 // 8, b0 % 8
        hot = img.copy()
        hot[2 * by : 2 * by + 2, 2 * bx : 2 * bx + 2, :] = 255
        assert phash_of(hot) != base


class TestOddDimensionGuard:
    """r11 verdict "What's wrong" #3: an odd/prime d > 64 collapsed the
    m_eff halving loop to one d-wide subspace — recall death by
    construction.  The rule now refuses loudly."""

    def test_odd_d_above_64_raises(self, spark):
        for d in (127, 65, 75):
            emb = spark.range(40).select(
                F.col("id").alias("vec_id"),
                F.array(*[F.rand(seed=int(i)) for i in range(d)]).alias(
                    "embedding"
                ),
            )
            with pytest.raises(ValueError, match="degenerates"):
                V._pq_train_codebooks(spark, None, emb=emb)

    def test_even_d_above_64_keeps_two_dim_subspaces(self, spark):
        for d, m_expected in ((66, 33), (98, 49)):
            emb = spark.range(40).select(
                F.col("id").alias("vec_id"),
                F.array(*[F.rand(seed=int(i)) for i in range(d)]).alias(
                    "embedding"
                ),
            )
            books = V._pq_train_codebooks(spark, None, emb=emb)
            assert books.shape[0] == m_expected
            assert books.shape[2] == 2


class TestShardedBuildGeometry:
    """Sharded-source build (the 10M×768 rung's shape): shard 0 trains
    the quantizers but ``n_hint`` must size the coarse geometry for the
    EVENTUAL corpus — without it nlist is sqrt-scaled to one shard and
    every cell runs S× oversized for the life of the layout."""

    def test_n_hint_sizes_nlist_for_the_eventual_corpus(self, spark, tmp_path):
        raw = ai.table(spark, SF_SMALL, "embeddings").select(
            "vec_id", "embedding"
        )
        n = raw.count()
        hinted = ai.build_ann_index(
            spark, SF_SMALL, path=str(tmp_path / "hinted"), emb_raw=raw,
            n_hint=100 * n,
        )
        plain = ai.build_ann_index(
            spark, SF_SMALL, path=str(tmp_path / "plain"), emb_raw=raw
        )
        m_hint = ai._read_meta(hinted)
        m_plain = ai._read_meta(plain)
        # the hint flows into cost_balanced_nlist (clamped to the training
        # sample, which here is the whole tiny corpus); meta n stays the
        # count actually encoded in both layouts
        from affinity_propagation_mapreduce_spark.operators.ivf import (
            cost_balanced_nlist,
        )
        from affinity_propagation_mapreduce_spark.operators.vector import (
            IVFPQ_QUERY_PROBE,
        )

        want = min(n, cost_balanced_nlist(100 * n, IVFPQ_QUERY_PROBE))
        assert m_hint["nlist"] == want
        assert m_hint["nlist"] > m_plain["nlist"]
        assert m_hint["n"] == m_plain["n"] == n

    def test_hint_smaller_than_corpus_is_ignored(self, spark, tmp_path):
        # max(n, hint): a stale low hint can never shrink the geometry
        # below what the actual input justifies
        raw = ai.table(spark, SF_SMALL, "embeddings").select(
            "vec_id", "embedding"
        )
        p = ai.build_ann_index(
            spark, SF_SMALL, path=str(tmp_path / "low-hint"), emb_raw=raw,
            n_hint=1,
        )
        q = ai.build_ann_index(
            spark, SF_SMALL, path=str(tmp_path / "no-hint"), emb_raw=raw
        )
        assert ai._read_meta(p)["nlist"] == ai._read_meta(q)["nlist"]


class TestPngCodec:
    """Real PNG decode (round-12 codec extension): the format's only
    external dependency — DEFLATE — ships in stdlib zlib, so unlike
    JPEG it does NOT need an external codec.  The decoder must get the
    chunk walk, per-chunk CRC, IDAT reassembly, and all five scanline
    unfilter predictors right; the encoder cycles every filter type so
    a partial unfilter implementation cannot round-trip."""

    def _img(self, h, w, seed=7):
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    def test_round_trip_exercises_all_five_filters(self):
        from affinity_propagation_mapreduce_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        for h, w in ((5, 1), (6, 3), (7, 16), (11, 9)):
            img = self._img(h, w, seed=h * 100 + w)
            assert h >= 5  # the encoder's y % 5 cycle covers every filter
            got = decode_png(encode_png(img))
            assert got.shape == (h, w, 3)
            assert (got == img).all()

    def test_gradient_and_constant_content(self):
        # Sub/Average/Paeth predictors are exact on gradients — the
        # filtered bytes go near-zero; constants stress Up
        from affinity_propagation_mapreduce_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        grad = (
            np.arange(9 * 7 * 3, dtype=np.int64) % 256
        ).astype(np.uint8).reshape(9, 7, 3)
        const = np.full((8, 4, 3), 129, dtype=np.uint8)
        assert (decode_png(encode_png(grad)) == grad).all()
        assert (decode_png(encode_png(const)) == const).all()

    def test_idat_split_across_chunks(self):
        # the IDAT stream may span any number of chunks; decoders that
        # inflate per-chunk instead of reassembling first break here
        from affinity_propagation_mapreduce_spark.operators.multimodal import (
            _png_chunk,
            _PNG_SIG,
            decode_png,
            encode_png,
        )

        img = self._img(6, 5, seed=3)
        payload = encode_png(img)
        pos = 8
        chunks = []
        while pos + 12 <= len(payload):
            ln = int.from_bytes(payload[pos : pos + 4], "big")
            typ = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + ln]
            chunks.append((typ, data))
            pos += 12 + ln
        rebuilt = _PNG_SIG
        for typ, data in chunks:
            if typ == b"IDAT":
                mid = len(data) // 2
                rebuilt += _png_chunk(b"IDAT", data[:mid])
                rebuilt += _png_chunk(b"IDAT", data[mid:])
            else:
                rebuilt += _png_chunk(typ, data)
        assert (decode_png(rebuilt) == img).all()

    def test_corrupt_crc_raises(self):
        from affinity_propagation_mapreduce_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        payload = bytearray(encode_png(self._img(5, 5)))
        payload[40] ^= 0xFF  # inside IHDR data or its CRC region
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(payload))

    def test_decode_image_dispatches_png(self):
        from affinity_propagation_mapreduce_spark.operators.multimodal import (
            decode_image,
            encode_png,
        )

        img = self._img(5, 6, seed=11)
        assert (decode_image(encode_png(img)) == img).all()

    def test_non_png_still_raises_declared_seam(self):
        from affinity_propagation_mapreduce_spark.operators.multimodal import (
            decode_image,
        )

        # JPEG decodes for real since round 14 — truncated JPEG bytes
        # fail as a corrupt stream, not as a missing codec; the
        # remaining container seam is video
        with pytest.raises((ValueError, IndexError)):
            decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)  # truncated
        with pytest.raises(NotImplementedError):
            decode_image(b"\x00\x00\x00\x18ftypmp42")


class TestAdcDirectPath:
    """Wide-d bulk ADC (found at 10M×768/|Q|=10k): the LUT working set
    (~8 GB) thrashed the 512 MB FIFO cache at 0% hit — every (cell,
    block) re-paid the 50 MFLOP einsum and the scan pinned 32 cores for
    the better part of an hour.  Past cache capacity, small cells now
    score by direct reconstruct+matmul; the two formulations compute
    the same sum-of-subspace dot products, so the served shortlist must
    be IDENTICAL either way."""

    def test_direct_path_serves_the_same_topk(self, spark, monkeypatch):
        # the direct branch engages only for a MULTI-block batch past
        # the cache budget (advice r12 #1: with |Q|=10 there is one
        # block, max(1, 1//chunk_bytes)=1 keeps lut_always True, and
        # the old version of this test compared the LUT path to
        # itself).  Tile the real queries past 256 so the batch spans
        # two LUT blocks, and assert via branch accumulators that each
        # serve actually ran the branch it claims to.
        path = ai.build_ann_index(spark, SF_SMALL)
        _qids, qmat0, qnrm0 = ai._query_rows(spark, SF_SMALL)
        reps = -(-260 // len(_qids))
        qmat = np.tile(qmat0, (reps, 1))[:260]
        qnrm = np.tile(qnrm0, reps)[:260]
        # fresh ids outside the corpus: self-exclusion never fires, so
        # duplicated query vectors still get identical neighbor lists
        qids = np.arange(1_000_000, 1_000_260, dtype="i8")
        norms = ai._norms(spark, SF_SMALL)

        def run():
            lut = spark.sparkContext.accumulator(0)
            direct = spark.sparkContext.accumulator(0)
            monkeypatch.setattr(ai, "_BRANCH_COUNTERS", (lut, direct))
            rows = sorted(
                (r.query_id, r.neighbor_id, r.rn)
                for r in ai.serve_topk(
                    spark, path, qids, qmat, qnrm, norms_df=norms
                ).collect()
            )
            return rows, lut.value, direct.value

        via_lut, n_lut, n_direct = run()
        assert n_lut > 0 and n_direct == 0  # default budget: pure LUT
        monkeypatch.setattr(ai, "_LUT_CACHE_BYTES", 1)
        via_direct, _n_lut2, n_direct2 = run()
        assert n_direct2 > 0  # the direct branch ACTUALLY ran this time
        assert via_lut == via_direct and len(via_lut) > 0

    def test_narrow_store_keeps_the_join_even_for_bulk(self, spark):
        # the in-place band exists to avoid shuffling a WIDE store; a
        # narrow store (measured: 20M x d=16 = 2.6 GB shuffle, join
        # 128 s vs pair band 207 s) must stay on the join path
        from affinity_propagation_mapreduce_spark.operators.vector import (
            _exact_rerank,
        )

        path = ai.build_ann_index(spark, SF_SMALL)
        qids, qmat, qnrm = ai._query_rows(spark, SF_SMALL)
        sl = ai.search_ann_index(spark, path, qids, qmat, qnrm)
        # bulk-sized estimate, but a store whose shuffle is cheaper
        # than collecting+broadcasting the pair set
        res = _exact_rerank(
            spark, ai._norms(spark, SF_SMALL), sl, qids, qmat, qnrm,
            shortlist_rows=50_000_000, store_rows=500,
        )
        plan = res._jdf.queryExecution().executedPlan().toString()
        # the join path joins; the in-place band has no join at all
        # (its plan's only MapInPandas-visible python is the shortlist
        # subplan, which both paths share)
        assert "Join" in plan
