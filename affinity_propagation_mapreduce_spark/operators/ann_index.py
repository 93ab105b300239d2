"""Persisted, reusable ANN index — the build/serve split (r8 verdict
"What's missing" #1).

Every ``knn_cosine_*`` query re-trains centroids/codebooks and re-encodes
the corpus in-query; in production, index BUILD and SEARCH are separate
jobs — the index is built once (or incrementally maintained) and served
by many query batches.  This module persists the engine's two quantizers
as a reusable on-disk layout and adds a search-only serving path:

* ``build_ann_index`` — trains the sampled-Lloyd IVF coarse quantizer
  (operators/ivf.py) and the per-subspace PQ codebooks
  (vector._pq_train_codebooks), encodes the WHOLE corpus in one
  mapInPandas pass (home cell + PQ byte codes + true norm), and lands a
  crash-safe layout (events._layout_write_once: flock'd write-once,
  temp-dir/rename swap):

      <path>/meta.json                 build params + corpus size + the
                                       GENERATION pointer (v3)
      <path>/centroids.parquet         (cell, c_emb)      ~sqrt(N)·d rows
      <path>/codebooks.parquet         (m, code, vec)     M·KSUB rows
      <path>/codes.g<G>.parquet/batch=*/cell=*/   (vec_id, code, nrm)
      <path>/tombstones.g<G>.parquet/del=*/       pending delete id-lists
      <path>/_SUCCESS                  written LAST — readers gate on it

  The codes table is directory-partitioned by coarse cell: a serving
  query probing ``p`` of ``nlist`` cells scans only those directories
  (PartitionFilters — the scan never lists the rest), which at 100 TB is
  the IVF pruning realized as PHYSICAL layout, not a runtime filter.
  Each vector stores M code bytes + one float64 norm (M=16, d=64 →
  24 B vs 512 B raw: the ~21× PQ memory cut, now on disk).

* ``search_ann_index`` — search-ONLY: loads the two tiny model tables
  driver-side (O(sqrt(N)·d) bytes), computes per-query probe cells and
  ADC lookup tables, scans the probed partitions with a broadcast-LUT
  Arrow kernel (per-batch per-cell per-query top-shortlist truncation —
  survivor-safe under the global (score DESC, id ASC) window, the same
  argument as vector.knn_cosine_ivfpq), and exact-reranks the shortlist
  against the full-precision corpus.  No training, no corpus encode, no
  O(N) full scan.

* ``search_flat_pq`` — same persisted codes, NO cell pruning: the flat
  ADC scan for the large-|Q| crossover measurement (r8 verdict
  "What's missing" #2; numbers in BASELINE.md §ann-serving).

* ``search_auto`` — the measured selection rule AS CODE (r9 verdict
  #4): resolves the probe width from the index geometry
  (``auto_n_probe``) and picks flat-ADC vs IVF-pruned serving per the
  BASELINE.md §ann-serving crossover.  With the build amortized and the
  probe width adaptive, the IVF-pruned path won EVERY measured cell of
  the |Q| × N grid (|Q|=10: 15.8 vs 19.3 s flat at 1M; |Q|=10k: 37.3 s
  vs >3000 s) — flat remains only for indexes so small that pruning
  cannot engage (probe width ≥ half the cells), where the probe map is
  pure overhead and flat's no-pruning recall is free.

* ``delete_ann_index`` — tombstone batches (r9 verdict "What's
  missing" #1): deletions land as gen-scoped ``tombstones.g<G>.parquet/del=<tag>/``
  id-lists via the same write-to-temp + one-rename protocol as appends,
  are anti-joined out of every serving scan BEFORE the per-cell
  shortlist truncation (so the result is the exact top-k over the
  SURVIVORS, not a post-hoc filter of a stale top-k), and are folded
  into the codes tree at compaction with the tag recorded in the
  ledger so a replayed feed stays a no-op.

Build is once-per-(application × corpus fingerprint) under /tmp, shared
across processes via the flock'd layout protocol; the driver regenerates
testdata between rounds, which changes the fingerprint and forces a
rebuild — the same invalidation scheme as ivf.corpus_rows.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources import table
from .events import _layout_write_once
from .ivf import (
    TWO_LEVEL_MIN,
    _dir_fingerprint,
    build_two_level,
    corpus_rows,
    cost_balanced_nlist,
    train_centroids,
    two_level_cells,
)
from .vector import (
    _PQ_GATE_MAX_N,
    IVFPQ_QUERY_PROBE,
    N_QUERIES,
    PQ_SHORTLIST,
    PQ_SHORTLIST_FRAC,
    RECALL_FLOORS,
    _emb,
    _exact_rerank,
    _fold_sum,
    _pq_train_codebooks,
    q_knn_cosine_topk,
)

# bumped whenever the on-disk layout or the quantizer parameters change:
# the version is part of the path, so stale indexes are never read.
# v2: codes live under codes.parquet/batch=<tag>/cell=*/ — each batch
# (base build or incremental append) is its OWN directory, landed by a
# single atomic rename, which makes appends crash-atomic (review r9 #1).
# v3 (advice r10 #1 + verdict r10 #3): the codes tree AND the tombstone
# tree are GENERATION-scoped (codes.g<G>.parquet, tombstones.g<G>.parquet)
# and readers resolve both through meta.json's `generation` pointer — one
# meta read is one consistent snapshot, and compaction commits by a
# single atomic os.replace of meta (gen bump + ledger merge + cover clear
# in ONE write).  The v2 crash window — codes swapped but cover/tombstones
# not yet retired, so a stale cover re-suppressed a re-inserted vector in
# the freshly folded tree — cannot exist: a gen-G cover is never applied
# to a gen-G+1 tree, and the repair machinery (_repair_codes_root) is gone
# because no crash point leaves the pointer dangling.
# v4: quantizer-parameter change only (layout identical to v3) — PQ
# subspace width is pinned to 2 dims above d=64 (the r11 offline sweep:
# dsub=4 reads 0.30 recall at d=128 where dsub=2 reads 0.96), and the
# format bump keeps any pre-rule high-d index from being served.
ANN_INDEX_FORMAT = 4

_INDEX_BASE = "/tmp/spark_graft_ann"


def ann_index_path(sf_dir: str) -> str:
    """Deterministic index location for a corpus: content-addressed by
    the embeddings parquet fingerprint (mtime+size per file), so a
    regenerated corpus gets a fresh index and concurrent processes on
    the same corpus share one build."""
    fp = hashlib.md5(
        repr((ANN_INDEX_FORMAT, _dir_fingerprint(sf_dir, "embeddings"))).encode()
    ).hexdigest()[:16]
    safe = sf_dir.strip("/").replace("/", "_")
    return f"{_INDEX_BASE}/v{ANN_INDEX_FORMAT}/{safe}-{fp}"


def _read_meta(path: str) -> dict:
    """One meta.json read = one consistent layout snapshot (meta is only
    ever replaced atomically via os.replace)."""
    with open(os.path.join(path, "meta.json")) as fh:
        return json.load(fh)


def _gen_of(meta: dict) -> int:
    return int(meta.get("generation", 0))


def _codes_root_gen(path: str, gen: int) -> str:
    return os.path.join(path, f"codes.g{gen}.parquet")


def _tomb_root_gen(path: str, gen: int) -> str:
    return os.path.join(path, f"tombstones.g{gen}.parquet")


def codes_root(path: str) -> str:
    """Resolve the CURRENT codes tree through the generation pointer.
    Raises if the pointed-at tree is missing — with the v3 commit
    protocol (tree renamed in before the meta flip, dead trees reaped
    age-gated) that can only mean external tampering or a scan that
    outlived the reap grace window."""
    root = _codes_root_gen(path, _gen_of(_read_meta(path)))
    if not os.path.isdir(root):
        raise FileNotFoundError(f"ANN layout has no codes tree: {root}")
    return root


# matches a generation-scoped codes/tombstones tree — or a
# generation-scoped MODEL table (centroids/codebooks, written by
# quantizer migration); used by the scratch reaper to collect
# superseded (gen != pointer) trees once quiesced
_GEN_DIR_RE = re.compile(
    r"^(?:codes|tombstones|centroids|codebooks)\.g(?P<gen>\d+)\.parquet$"
)


def _model_table_path(path: str, name: str, meta: dict) -> str:
    """Resolve a model table (centroids/codebooks) for a meta snapshot:
    ``meta["model_gen"]`` names the generation whose migration wrote
    the quantizers currently in force (``<name>.g<MG>.parquet``);
    absent, the layout-level file every pre-migration generation
    shares.  Model tables are IMMUTABLE once written and the pointer
    flip is one meta replace, so this resolution plus the one-meta-read
    snapshot gives migration its atomic cutover: a reader holding gen G
    reads G's quantizers even while gen G+1 (new quantizers, re-encoded
    codes) is being written beside it.  Generation bumps that do NOT
    retrain (compaction, partial folds) carry ``model_gen`` forward
    untouched, so they keep resolving the migrated model."""
    mg = meta.get("model_gen")
    if mg is not None:
        return os.path.join(path, f"{name}.g{int(mg)}.parquet")
    return os.path.join(path, f"{name}.parquet")


def _norms(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return emb.select(
        "vec_id",
        "emb",
        F.sqrt(_fold_sum(F.transform("emb", lambda x: x * x))).alias("nrm"),
    )


def _encode_codes(
    spark, emb, cent_mat, sup_ch, books, with_raw: bool = False,
    meta_cols: tuple = (),
):
    """Encode (vec_id, emb) rows against FIXED quantizers: home cell via
    the (two-level) coarse assignment, PQ byte codes per subspace, true
    norm computed in the kernel (numpy — NOT the interpreted JVM fold:
    feeding a fold-computed nrm column would evaluate it per corpus row
    and the kernel ignored it anyway).  ``with_raw`` carries the
    full-precision vector through as one more column — parquet is
    columnar, so the ADC scan's column pruning never touches those
    bytes, while the exact rerank can read them from the PROBED
    partitions instead of rescanning the whole corpus (the d=768 warm
    serve was corpus-scan-bound at 50 s; see serve_topk).  Returns
    (encoded_df, broadcast); the caller destroys the broadcast after
    the consuming action.

    ``meta_cols`` names FILTERABLE metadata columns of the input frame
    (tenant/language/label/date) carried verbatim into the codes rows —
    the physical substrate of predicate-pushdown filtered serving
    (r13 verdict "missing" #2): with the predicate columns resident in
    the codes layout, `serve_topk_filtered(filter_expr=...)` evaluates
    the predicate scan-side as a pushed parquet filter instead of
    producing and semi-joining a qualifying-id relation per serve."""
    m_, _ksub, dsub = books.shape
    meta_cols = tuple(meta_cols)
    meta_types = [
        (c, emb.schema[c].dataType.simpleString()) for c in meta_cols
    ]
    bc = spark.sparkContext.broadcast((cent_mat, sup_ch, books))

    def encode(batches):
        import pandas as pd

        c_mat, sc, bks = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array([list(e) for e in pdf["emb"]], dtype="f8")
            ids = pdf["vec_id"].to_numpy(dtype="i8")
            nrm = np.sqrt((x * x).sum(axis=1))
            if sc is not None:
                order, _d2, _ = two_level_cells(x, c_mat, sc[0], sc[1], 1)
                home = order[:, 0]
            else:
                d2 = (
                    (x * x).sum(axis=1, keepdims=True)
                    - 2.0 * x @ c_mat.T
                    + (c_mat * c_mat).sum(axis=1)[None, :]
                )
                home = d2.argmin(axis=1)
            xs = x.reshape(len(x), m_, dsub)
            codes = np.empty((len(x), m_), dtype="u1")
            for m in range(m_):
                d2c = (
                    (xs[:, m] * xs[:, m]).sum(axis=1, keepdims=True)
                    - 2.0 * xs[:, m] @ bks[m].T
                    + (bks[m] * bks[m]).sum(axis=1)[None, :]
                )
                codes[:, m] = d2c.argmin(axis=1)
            out = {
                "vec_id": ids,
                "cell": home.astype("i8"),
                "code": [row.tobytes() for row in codes],
                "nrm": nrm,
            }
            if with_raw:
                # float32, matching the corpus's own storage precision
                # (every corpus here lands f4; f8->f4 of an f4 source is
                # lossless, and storing f8 would double the raw bytes)
                out["emb"] = list(x.astype("f4"))
            frame = pd.DataFrame(out)
            for c in meta_cols:
                # verbatim pass-through, same Arrow batch row order
                frame[c] = pdf[c].to_numpy()
            yield frame

    schema = "vec_id long, cell long, code binary, nrm double"
    if with_raw:
        schema += ", emb array<float>"
    for c, t in meta_types:
        schema += f", {c} {t}"
    encoded = emb.mapInPandas(encode, schema)
    return encoded, bc


def build_ann_index(
    spark, sf_dir: str, path: str | None = None, emb_raw=None,
    store_raw: bool = False, n_hint: int | None = None,
    meta_cols: tuple = (),
) -> str:
    """Train + encode + persist; returns the layout path.  Idempotent and
    crash-safe (flock'd write-once); a complete layout short-circuits.
    ``emb_raw`` (vec_id, embedding) overrides the corpus — the
    incremental path builds its base index from a subset.
    ``store_raw`` keeps the full-precision vector as one more column of
    the codes tree (columnar: the ADC scan never reads those bytes) so
    ``serve_topk`` reranks from the probed partitions instead of
    rescanning the corpus — the serving-store shape for wide embeddings.
    ``n_hint`` sizes the coarse quantizer for the EVENTUAL corpus when
    the base build sees only its first shard (the sharded-source build:
    shard 0 trains the quantizers, shards 1..S-1 arrive as frozen-
    quantizer appends and the source shards retire as they fold in —
    without the hint nlist would be sqrt-scaled to one shard and every
    cell would run S× oversized for the life of the layout).  The hint
    affects geometry only; meta ``n`` stays the count actually encoded
    (appends advance it).

    ALL expensive work (training collects AND the corpus encode) runs
    inside write_fn, i.e. under the layout flock AFTER the _SUCCESS
    re-check — so when several processes race on a fresh corpus, the
    losers skip the compute, not just the write (review r9 #7)."""
    path = path or ann_index_path(sf_dir)
    if os.path.isfile(os.path.join(path, "_SUCCESS")):
        # the short-circuit must honour the request: a store_raw=True
        # build against a previously-built NON-raw layout would silently
        # hand back a raw=false index whose mismatch only surfaces later
        # as serve_topk's "non-raw layout needs norms_df" (advice r11 #3)
        existing_raw = bool(_read_meta(path).get("raw", False))
        if store_raw and not existing_raw:
            raise ValueError(
                f"layout at {path} is complete but was built without "
                "store_raw; build the raw serving store at a distinct "
                "path (e.g. suffix '-raw') or remove the old layout"
            )
        return path

    def write_fn(tmp: str) -> None:
        if emb_raw is None:
            n = corpus_rows(spark, sf_dir)
            src = table(spark, sf_dir, "embeddings")
        else:
            src = emb_raw
            n = src.count()
        raw = src.select("vec_id", "embedding", *meta_cols)
        nlist = cost_balanced_nlist(max(n, n_hint or 0), IVFPQ_QUERY_PROBE)
        cent_mat = train_centroids(
            raw.select("vec_id", "embedding"), nlist
        )
        sup_ch = (
            build_two_level(cent_mat) if len(cent_mat) >= TWO_LEVEL_MIN else None
        )
        books = _pq_train_codebooks(
            spark, sf_dir, raw.select("vec_id", "embedding")
        )  # (m, ksub, dsub)
        emb = raw.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("emb"),
            *meta_cols,
        )
        encoded, bc = _encode_codes(
            spark, emb, cent_mat, sup_ch, books, with_raw=store_raw,
            meta_cols=meta_cols,
        )
        m_, ksub, _dsub = books.shape
        os.makedirs(tmp, exist_ok=True)
        # the base codes land as generation 0's own batch=base directory
        # (v3 layout: every batch — build or append — is one directory,
        # so appends can rename in atomically; the whole tree is
        # generation-scoped so compaction can commit by flipping the
        # meta pointer).  Sort within cell partitions by vec_id: tight
        # row-group min/max stats.
        (
            encoded.repartition("cell")
            .sortWithinPartitions("vec_id")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(os.path.join(tmp, "codes.g0.parquet", "batch=base"))
        )
        spark.createDataFrame(
            [(i, [float(v) for v in c]) for i, c in enumerate(cent_mat)],
            "cell long, c_emb array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, "centroids.parquet")
        )
        spark.createDataFrame(
            [
                (m, c, [float(v) for v in books[m, c]])
                for m in range(m_)
                for c in range(ksub)
            ],
            "m long, code long, vec array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, "codebooks.parquet")
        )
        if meta_cols:
            _write_selectivity_sample(
                raw.select("vec_id", *meta_cols), n,
                os.path.join(tmp, "sample.parquet", "batch=base"),
            )
        with open(os.path.join(tmp, "meta.json"), "w") as fh:
            json.dump(
                {
                    "format": ANN_INDEX_FORMAT,
                    "generation": 0,
                    "n": n,
                    "nlist": int(len(cent_mat)),
                    "m": int(m_),
                    "ksub": int(ksub),
                    "dsub": int(books.shape[2]),
                    "raw": bool(store_raw),
                    "meta_cols": list(meta_cols),
                },
                fh,
            )
        # root _SUCCESS LAST: readers gate on the complete multi-part
        # layout, not on any single Spark writer's own marker
        with open(os.path.join(tmp, "_SUCCESS"), "w"):
            pass
        bc.destroy(blocking=False)

    _layout_write_once(path, write_fn)
    _reap_superseded_indexes(path)
    return path


# reap grace windows: a superseded layout (or a compaction's dead codes
# tree) is deleted only once it has sat unread/untouched this long, so
# an in-flight Spark job — which resolves paths driver-side but opens
# files lazily at TASK time (advice r9 #3) — finishes before its files
# disappear.  Scans longer than the grace window remain the documented
# /tmp-scratch seam; a shared read lock is the production closure.
_REAP_GRACE_SEC = 900

# a layout basename is "<safe sf_dir>-<16-hex fingerprint>" with an
# optional "-incr" kind suffix; matching siblings STRUCTURALLY (advice
# r9 #2) keeps /data/x's reaper from eating /data/x-y's live index,
# which a raw startswith prefix match did.
_LAYOUT_NAME_RE = re.compile(r"^(?P<safe>.+)-(?P<fp>[0-9a-f]{16})(?P<kind>-incr)?$")


def _touch_last_read(path: str) -> None:
    """Readers stamp the layout at model-load time; the reapers treat a
    recent stamp as 'possibly mid-scan' and leave the layout alone."""
    try:
        with open(os.path.join(path, ".last-read"), "w"):
            pass
    except OSError:
        pass


def _layout_quiesced(path: str) -> bool:
    """True when the layout has not been opened for reading (or
    created) within the grace window."""
    import time

    newest = 0.0
    for probe in (os.path.join(path, ".last-read"), os.path.join(path, "_SUCCESS"), path):
        try:
            newest = max(newest, os.path.getmtime(probe))
        except OSError:
            continue
    return time.time() - newest > _REAP_GRACE_SEC


def _reap_superseded_indexes(current_path: str) -> None:
    """GC for content-addressed layouts (review r9 #8): the driver
    regenerates a corpus IN PLACE, so sibling layouts of the same
    sf_dir + same kind with a DIFFERENT fingerprint are superseded for
    certain.  Each victim is removed only if (a) its name matches the
    layout structure exactly, (b) it has quiesced past the read grace
    window, and (c) a NON-blocking flock on its lock file succeeds (a
    live writer holds it → skipped)."""
    import fcntl
    import shutil

    parent = os.path.dirname(current_path)
    base = os.path.basename(current_path)
    m = _LAYOUT_NAME_RE.match(base)
    if m is None:  # explicitly-pathed layout — nothing content-addressed to GC
        return
    sibling_re = re.compile(
        "^"
        + re.escape(m.group("safe"))
        + r"-[0-9a-f]{16}"
        + re.escape(m.group("kind") or "")
        + "$"
    )
    try:
        names = os.listdir(parent)
    except OSError:
        return
    for name in names:
        if name == base or sibling_re.match(name) is None:
            continue
        victim = os.path.join(parent, name)
        if not os.path.isdir(victim) or not _layout_quiesced(victim):
            continue
        try:
            fd = os.open(f"{victim}.lock", os.O_CREAT | os.O_WRONLY, 0o644)
        except OSError:
            continue
        try:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                continue  # live writer — leave it
            shutil.rmtree(victim, ignore_errors=True)
            try:
                os.remove(f"{victim}.lock")
            except OSError:
                pass
        finally:
            os.close(fd)


# scratch dirs a crashed writer can leave INSIDE a layout.  All are
# dot-prefixed (invisible to parquet readers of the gen trees);
# `.compact-dead-` / `.dead-tombs-` are legacy v2 names, still reaped.
_SCRATCH_PREFIXES = (".batch-tmp-", ".compact-tmp-", ".compact-dead-",
                     ".del-tmp-", ".dead-tombs-")


def _reap_layout_scratch(path: str) -> None:
    """MUST hold the layout flock.  Remove aged scratch dirs inside the
    layout (crashed appends/compactions leave .batch-tmp-*/.compact-tmp-*
    behind) AND superseded generation trees: after a compaction commits
    gen G+1, the gen-G codes/tombstone trees are unreferenced — they are
    utime-stamped at commit time and collected here once quiesced past
    the read grace window, so an in-flight scan that resolved the gen-G
    snapshot keeps its files.  An ORPHAN gen tree (gen > pointer: its
    compaction died between the tree rename and the meta flip) is
    equally unreferenced — readers only ever resolve through the
    pointer — and is collected the same way."""
    import shutil
    import time

    now = time.time()
    try:
        names = os.listdir(path)
    except OSError:
        return
    try:
        meta = _read_meta(path)
        current_gen = _gen_of(meta)
        model_gen = meta.get("model_gen")
    except OSError:
        current_gen = model_gen = None
    for name in names:
        m = _GEN_DIR_RE.match(name)
        if name.startswith(_SCRATCH_PREFIXES):
            pass
        elif m is not None and current_gen is not None:
            if int(m.group("gen")) == current_gen:
                continue  # the live tree — never touched
            if (
                model_gen is not None
                and int(m.group("gen")) == int(model_gen)
                and name.startswith(("centroids.", "codebooks."))
            ):
                continue  # the quantizers in force — survive gen bumps
        else:
            continue
        victim = os.path.join(path, name)
        try:
            if now - os.path.getmtime(victim) <= _REAP_GRACE_SEC:
                continue
            shutil.rmtree(victim, ignore_errors=True)
        except OSError:
            continue


# In-process model memo: a serving process keeps its index model
# resident instead of re-collecting the centroid/codebook tables per
# serve (two small Spark jobs, ~1 s warm at sf0.1 — r15 guide §1).  The
# key is meta.json's CONTENT (r16, advice r15 #2: a stat fingerprint
# rides the coarse mtime clock, so two same-size rewrites within one
# tick could serve a stale model; the file is tiny, so the bytes ARE
# the fingerprint): model tables are generation-addressed through meta
# (immutable once written), and every mutation that changes the model
# (build/compact/migrate/fold) rewrites meta.json atomically — so a
# stale hit is impossible.  Batches and tombstones are NOT part of the
# model; serves read those relations fresh every time.  This memoizes
# the SERVING MODEL, not any query result: every serve still scans
# codes/tombstones and reranks from the parquet inputs.
_model_memo: dict[str, tuple[bytes, tuple]] = {}
_MODEL_MEMO_MAX = 32  # retired layout paths must not accumulate (advice r15 #4)


def _read_model_arrays_arrow(path: str, meta: dict):
    """Driver-side pyarrow read of the two tiny model tables — the same
    doubles the Spark orderBy+collect produced (they are plain
    array<double> parquet columns), without the two Spark jobs the cold
    load paid (~1.1 s at sf0.1 — r16, guide §5: model load is
    driver/planning work; the tables are O(sqrt(N)) bytes).  Returns
    None when the tables are not locally readable parquet (the caller
    falls back to the Spark collect path)."""
    import glob as _glob

    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        def _read(table_path: str):
            if os.path.isfile(table_path):
                return pq.read_table(table_path)
            files = sorted(
                _glob.glob(
                    os.path.join(table_path, "**", "*.parquet"), recursive=True
                )
            )
            if not files:
                return None
            return pa.concat_tables(pq.read_table(f) for f in files)

        ct = _read(_model_table_path(path, "centroids", meta))
        bt = _read(_model_table_path(path, "codebooks", meta))
        if ct is None or bt is None:
            return None
        cells = ct.column("cell").to_numpy()
        cvals = ct.column("c_emb").combine_chunks()
        cflat = cvals.values.to_numpy(zero_copy_only=False).astype(
            "f8", copy=False
        )
        if len(cells) == 0 or cflat.size % len(cells) != 0:
            return None
        cent = cflat.reshape(len(cells), cflat.size // len(cells))
        cent_mat = np.ascontiguousarray(cent[np.argsort(cells)])
        ms = bt.column("m").to_numpy()
        codes = bt.column("code").to_numpy()
        bvals = bt.column("vec").combine_chunks()
        bflat = bvals.values.to_numpy(zero_copy_only=False).astype(
            "f8", copy=False
        )
        if len(ms) == 0 or bflat.size % len(ms) != 0:
            return None
        rows = bflat.reshape(len(ms), bflat.size // len(ms))
        order = np.lexsort((codes, ms))  # == orderBy("m", "code")
        books = np.ascontiguousarray(rows[order]).reshape(
            meta["m"], meta["ksub"], meta["dsub"]
        )
        return cent_mat, books
    except Exception:
        return None


def load_ann_model(spark, path: str):
    """Driver-side model load: meta + centroid matrix + codebooks.
    O(nlist·d + M·KSUB·dsub) doubles = O(sqrt(N)) bytes — tiny at any
    corpus size (1e9 points × 64 dims → ~32 MB of centroids).  Memoized
    per meta.json content (see _model_memo)."""
    _touch_last_read(path)  # readers stamp the layout: reap grace window
    meta_path = os.path.join(path, "meta.json")
    with open(meta_path, "rb") as fh:
        meta_bytes = fh.read()
    hit = _model_memo.get(path)
    if hit is not None and hit[0] == meta_bytes:
        _mb, cent_mat, books = hit[1]
        # fresh meta dict per caller — INCLUDING nested mutables (advice
        # r15 #1: the shallow dict() shared delete_cover/batches between
        # the memo and every caller): re-parse from the memoized bytes
        return json.loads(meta_bytes), cent_mat, books
    meta = json.loads(meta_bytes)
    arrays = _read_model_arrays_arrow(path, meta)
    if arrays is not None:
        cent_mat, books = arrays
    else:
        crows = (
            spark.read.parquet(_model_table_path(path, "centroids", meta))
            .orderBy("cell")
            .collect()
        )
        cent_mat = np.array([list(r.c_emb) for r in crows], dtype="f8")
        brows = (
            spark.read.parquet(_model_table_path(path, "codebooks", meta))
            .orderBy("m", "code")
            .collect()
        )
        books = np.array([list(r.vec) for r in brows], dtype="f8").reshape(
            meta["m"], meta["ksub"], meta["dsub"]
        )
    # cheap defense: a future in-place edit of the arrays must fail loud
    # rather than silently poison the process-wide cache (advice r15 #1)
    cent_mat.setflags(write=False)
    books.setflags(write=False)
    while len(_model_memo) >= _MODEL_MEMO_MAX:  # advice r15 #4
        _model_memo.pop(next(iter(_model_memo)))
    _model_memo[path] = (meta_bytes, (meta_bytes, cent_mat, books))
    return meta, cent_mat, books


# per-worker LUT cache budget (bytes).  Module-level so tests can force
# the past-capacity regime at small |Q| and pin LUT ≡ direct equality.
_LUT_CACHE_BYTES = 512_000_000

# emission-cap engagement threshold (estimated emitted rows).  The
# per-(batch,cell,query) cap exists for the bulk-shuffle failure mode
# (measured: 2.92e9 emitted rows / ~45 GB shuffle at 10M×768 |Q|=10k);
# an interactive |Q|=10 serve emits a few hundred thousand rows and the
# cap would silently trade recall for nothing — on clustered data a
# query's true top-shortlist concentrates in its hottest probed cells
# (advice r12 #2).  Below this estimate the scan emits lossless
# (cap=None); above it the 2×-even-spread cap engages.  200M rows
# ≈ 3 GB of (query_id, neighbor_id, score) shuffle — comfortably inside
# the budget the window stage handles, two orders of magnitude under
# the measured disaster.
_CAP_ENGAGE_ROWS = 200_000_000

# test hook: a (lut_acc, direct_acc) accumulator pair snapshot into the
# ADC kernel closure so tests can assert WHICH scoring branch actually
# ran (advice r12 #1: the LUT≡direct equality test passed trivially with
# both serves on the LUT path).  None in production — zero overhead.
_BRANCH_COUNTERS = None


def _per_cell_cap(
    n_queries: int, width: int, shortlist: int, n_fragments: int = 1
) -> int | None:
    """Resolve the per-(batch,cell,query) emission cap for a serve.
    Lossless (None) when the worst-case emission — every query emitting
    its full per-cell truncation (``shortlist`` rows) from each of its
    probed cells — stays under _CAP_ENGAGE_ROWS; the 2× even-spread
    share otherwise.  The bound deliberately ignores mean occupancy:
    probed cells are the HOT cells on clustered data (the measured 10M
    disaster ran ~15× mean occupancy in its probed mass), so a
    mean-occupancy estimate under-engages exactly where the cap
    matters.

    ``n_fragments`` scales the estimate by the layout's batch-directory
    count: the kernel truncates per (batch dir, cell, query), so a hot
    cell fragmented across many ``batch=`` dirs emits up to shortlist
    rows PER FRAGMENT — an estimate that ignores fragmentation silently
    fails to engage on exactly the fragmented-hot-cell shapes the cap
    exists for (advice r13 #2)."""
    est = n_queries * width * shortlist * max(1, int(n_fragments))
    if est <= _CAP_ENGAGE_ROWS:
        return None
    return max(PQ_SHORTLIST, -(-2 * shortlist // max(1, int(width))))


def _adc_scan(
    spark, codes_df, meta, books, qids, qmat, qnrm, shortlist, cell_to_q,
    per_cell_cap: int | None = None,
):
    """Shared ADC kernel over a (possibly cell-pruned) codes scan.

    LUT chunks are computed LAZILY per 256-query block from the
    broadcast query matrix (|Q|·d doubles — ~5 MB at |Q|=10k) and
    cached for the task's lifetime: a task only ever materializes LUT
    rows for query blocks that actually probe one of ITS cells, so the
    pruned serving path never holds the full |Q|×M×KSUB table (~327 MB
    float64 at |Q|=10k — review r9 #4; the flat scan still converges to
    the full table, inherently, because every query probes every cell).
    Per batch, rows group by cell and only the queries probing that
    cell score it; emission is the per-(batch, cell, query)
    top-``shortlist`` — survivor-safe for the global
    (pq_cosine DESC, neighbor_id ASC) shortlist window.

    WIDE-d BULK ESCAPE HATCH (measured this round): at d=768 the full
    LUT working set for a 10k-query batch is ~8 GB (40 blocks × 200 MB)
    — far past the 512 MB cache, and the ascending cell-by-cell revisit
    order makes FIFO eviction a 0%-hit sequential-scan thrash: every
    (cell, block) pair re-paid the 50 MFLOP einsum and the 10M×768 bulk
    scan ran 32 cores at 100% for the better part of an hour.  When the
    batch's block count exceeds the cache capacity, small cells switch
    to DIRECT reconstruct+matmul: decode the cell's codes once
    (one fancy-index gather → rows×d) and score `qm @ recon.T` — per
    (cell, block) that is |probing|·rows·d flop vs the LUT's
    256·m·ksub·dsub rebuild, which a ~140-row cell can never amortize
    (crossover: rows·|probing|·(dsub−1) vs 256·ksub·dsub).  Same
    arithmetic, same scores (modulo f8 association), no cache needed —
    the LUT path remains the winner whenever the working set fits
    (interactive batches, d ≤ 64 at any |Q|).

    ``per_cell_cap`` bounds the per-(batch, cell, query) EMISSION.  The
    global window keeps only top-``shortlist`` per query, but a probed
    batch-cell under that cap emits ALL its scored rows — and probed
    cells are the HOT cells on clustered data (measured at 10M×768
    |Q|=10k width 17: 2,055 probed cells at 83 queries/cell mean →
    2.92 BILLION emitted rows, ~45 GB of shuffle, disk-full before the
    window ran).  A query's global top-``shortlist`` could in theory
    all come from one cell, so the cap is a measured-recall trade, not
    a lossless bound — callers size it ≥ 2·shortlist/width (double the
    even-spread share) and the recall floors re-verify it; None keeps
    the old emit-everything behavior."""
    m_, dsub = meta["m"], meta["dsub"]
    emit_cap = int(per_cell_cap) if per_cell_cap else int(shortlist)
    lut_budget = _LUT_CACHE_BYTES  # snapshot: ships inside the closure
    counters = _BRANCH_COUNTERS  # snapshot: (lut, direct) accs or None
    bc = spark.sparkContext.broadcast((books, qids, qmat, qnrm, cell_to_q))

    def kernel(batches):
        import pandas as pd

        bks, qi_, qm_, qn_, c2q = bc.value
        qm3 = qm_.reshape(len(qi_), m_, dsub)
        lut_chunks: dict[int, np.ndarray] = {}
        # bound the per-worker LUT cache: a chunk is 256·m·ksub doubles
        # — 4 MB at d=16 but ~200 MB at d=768, and 32 workers each
        # caching every block of a 10k-query batch OOM-killed the JVM
        # at 5M×768 (kernel global OOM, not heap).  FIFO-evict past a
        # ~512 MB budget; blocks are revisited cell-by-cell in
        # ascending order, so recency keeps the hit rate high.
        ksub = bks.shape[1]
        chunk_bytes = 256 * m_ * ksub * 8
        max_chunks = max(1, lut_budget // chunk_bytes)
        # when every block of this batch fits the cache, the LUT is
        # strictly cheaper after its one-time build; past capacity the
        # sequential revisit order thrashes FIFO to a 0% hit rate and
        # small cells must not pay the rebuild (see docstring)
        lut_always = (len(qi_) + 255) // 256 <= max_chunks
        marange = np.arange(m_)[None, :]

        def lut_for(lo: int) -> np.ndarray:
            got = lut_chunks.get(lo)
            if got is None:
                got = np.einsum("qmd,mcd->qmc", qm3[lo : lo + 256], bks)
                if len(lut_chunks) >= max_chunks:
                    lut_chunks.pop(next(iter(lut_chunks)))
                lut_chunks[lo] = got
            return got

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype="i8")
            nrm = pdf["nrm"].to_numpy(dtype="f8")
            codes = np.frombuffer(
                b"".join(pdf["code"].tolist()), dtype="u1"
            ).reshape(len(ids), m_)
            home = pdf["cell"].to_numpy(dtype="i8")
            out_q, out_n, out_s = [], [], []
            for c in np.unique(home):
                probing = c2q.get(int(c))
                if probing is None or not len(probing):
                    continue
                sel = home == c
                c_ids, c_codes, c_nrm = ids[sel], codes[sel], nrm[sel]
                # adc[p, j] = sum_m lut[p, m, codes[j, m]] — chunk the
                # probing queries so the score matrix stays ~MBs.
                # Probing lists are built in ascending query order, so
                # grouping by 256-aligned block keeps chunk reuse high.
                by_block: dict[int, list[int]] = {}
                for p in probing:
                    by_block.setdefault(p // 256 * 256, []).append(p)
                recon = None
                for lo, plist in by_block.items():
                    pr = np.asarray(plist, dtype="i8")
                    use_lut = (
                        lut_always
                        or lo in lut_chunks
                        or len(c_ids) * len(pr) * (dsub - 1)
                        > 256 * ksub * dsub
                    )
                    if counters is not None:
                        counters[0 if use_lut else 1].add(1)
                    if use_lut:
                        lut_lo = lut_for(lo)
                        lut_pr = lut_lo[pr - lo]  # one fancy-index copy
                        adc = np.zeros((len(pr), len(c_ids)), dtype="f8")
                        for m in range(m_):
                            adc += lut_pr[:, m, c_codes[:, m]]
                    else:
                        # direct reconstruct+matmul: decode the cell
                        # once, share it across this cell's blocks
                        if recon is None:
                            recon = bks[marange, c_codes].reshape(
                                len(c_ids), m_ * dsub
                            )
                        adc = qm_[pr] @ recon.T
                    adc /= qn_[pr][:, None] * c_nrm[None, :]
                    for row, p in enumerate(pr):
                        mask = c_ids != qi_[p]
                        cand_ids, cand = c_ids[mask], adc[row][mask]
                        keep = np.lexsort((cand_ids, -cand))[:emit_cap]
                        out_q.append(np.full(len(keep), qi_[p], dtype="i8"))
                        out_n.append(cand_ids[keep])
                        out_s.append(cand[keep])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "pq_cosine": np.concatenate(out_s),
                }
            )

    scored = codes_df.select("vec_id", "cell", "code", "nrm").mapInPandas(
        kernel, "query_id long, neighbor_id long, pq_cosine double"
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("pq_cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("prn", F.row_number().over(w_adc))
        .where(F.col("prn") <= shortlist)
        .select("query_id", "neighbor_id")
    )


def _probe_map(cent_mat, qmat, n_probe):
    """Per-query probe cells (L2, stable ties) → {cell: [query rows]}."""
    d2 = (
        (qmat * qmat).sum(axis=1, keepdims=True)
        - 2.0 * qmat @ cent_mat.T
        + (cent_mat * cent_mat).sum(axis=1)[None, :]
    )
    p = min(n_probe, cent_mat.shape[0])
    order = np.argsort(d2, axis=1, kind="stable")[:, :p]
    cell_to_q: dict[int, list[int]] = {}
    for qrow in range(len(qmat)):
        for c in order[qrow]:
            cell_to_q.setdefault(int(c), []).append(qrow)
    return cell_to_q


# --- probe-width + mode selection: the measured knobs as defaults ------------

# auto probe width (r9 verdict #2): the fixed default 8 measured 0.54
# recall@5 at N=10M while n_probe=32 read 0.92 at FLAT small-|Q| wall
# (BASELINE.md §ann-serving: wall is listing/session-dominated at small
# |Q|, and large-|Q| ladder rows were already measured at 32).  32 is
# therefore the floor; past nlist≈8k (N≈8M at the cost-balanced sizing)
# the width grows ∝ nlist so the probed CELL fraction — and with it the
# corpus-mass fraction each query sees — stops shrinking as N grows,
# which is exactly the failure mode the 10M measurement exposed.
AUTO_PROBE_MIN = 32
AUTO_PROBE_NLIST_FRAC = 256

# mode crossover: with build amortized and the probe width adaptive,
# the IVF-pruned scan won every measured (|Q|, N) cell — flat remains
# only where pruning cannot engage: once a query probes ≥ half the
# cells, the probe map + per-cell bookkeeping prune (less than) half
# the scan while flat's single pass has no recall loss at all.
FLAT_MODE_PROBE_FRAC = 0.5


def auto_n_probe(nlist: int) -> int:
    """Default serving probe width for an index with ``nlist`` cells."""
    return min(int(nlist), max(AUTO_PROBE_MIN, int(nlist) // AUTO_PROBE_NLIST_FRAC))


# |Q|-aware probe schedule (r10 verdict "What's missing" #1): the
# recall-first width is the right default for interactive batches, but a
# bulk re-scoring job pays ADC work ∝ |Q| · n_probe · N/nlist — at
# N=10M/|Q|=10k the auto-34 width measured 187.8 s where probe-8 read
# 77.9 s.  SCAN_BUDGET_ROWS is the per-serve scored-row budget past
# which the width narrows (calibrated on that 10M ladder: 10k queries ×
# 8 cells × ~1.1k occupancy ≈ 9e7 scored rows ≈ the 77.9 s wall);
# PROBE_THROUGHPUT_MIN floors the narrowing at the old explicit-override
# width so recall degrades no further than the measured probe-8 row.
SCAN_BUDGET_ROWS = 100_000_000
PROBE_THROUGHPUT_MIN = 8

# Bulk-serving recall floor (r11 verdict "What's missing" #1): the
# throughput narrowing above serves measured recall 0.54/0.74 at
# 10M/20M bulk — a DECLARED trade, but until r12 nothing enforced it,
# so a bulk caller got half-recall silently.  The floor below turns the
# measured width→recall curve into a contract: mode="auto" narrows only
# to the floor-satisfying width; the probe-8 wall now requires the
# explicit mode="throughput" (or min_recall=None / an explicit n_probe).
# Calibration (tools/ann_serve_run.py width sweeps, BASELINE §round-12):
# 10M (auto=34): w=8→0.54, 12→0.78, 17→0.84, 24→0.90, 34→0.94;
# 1M (auto=32): w=8→0.80, 16→0.90, 32→0.92 (r9 knob curve).  The
# HALF-auto width clears the 0.8 floor at every measured rung while
# probe-8 falls below it from 10M up — hence FLOOR_WIDTH_FRAC=0.5.
# Recall ≥0.9 is only reliably measured at ~0.7·auto and above, so
# requests above the floor band pin the full auto width (0.88-0.96
# measured across 1M-50M).
BULK_RECALL_FLOOR = 0.8
FLOOR_WIDTH_FRAC = 0.5  # width fraction of auto_n_probe that meets the floor
# recall band measured at the PROBE_THROUGHPUT_MIN width (the old
# schedule's silent bulk recall): requests at/below this band may
# legitimately narrow all the way down
THROUGHPUT_WIDTH_RECALL = 0.54


def min_width_for_recall(nlist: int, min_recall: float | None) -> int:
    """Narrowest probe width the measured curve supports for a recall
    floor — the schedule may never narrow below this in mode="auto".
    None waives the floor (the explicit-throughput stance)."""
    w = auto_n_probe(nlist)
    if min_recall is None or min_recall <= THROUGHPUT_WIDTH_RECALL:
        return min(PROBE_THROUGHPUT_MIN, w)
    if min_recall <= BULK_RECALL_FLOOR:
        return max(
            min(PROBE_THROUGHPUT_MIN, w), int(np.ceil(w * FLOOR_WIDTH_FRAC))
        )
    # above the measured half-width floor only the full recall-first
    # width has measured evidence (0.88-0.96 at auto across the ladder)
    return w


def plan_n_probe(
    nlist: int, n: int, n_queries: int, mode: str = "auto",
    min_recall: float | None = BULK_RECALL_FLOOR,
) -> int:
    """Resolve the serving probe width from index geometry AND query
    batch size.  ``mode="recall"`` pins the recall-first auto width
    regardless of |Q| (the pre-r11 behavior); ``mode="auto"`` narrows
    once |Q| · width · occupancy crosses SCAN_BUDGET_ROWS, but never
    below ``min_width_for_recall(nlist, min_recall)`` — the bulk recall
    floor is a CONTRACT (default ≥0.8), not a footnote;
    ``mode="throughput"`` waives the floor and narrows to the measured
    probe-8 wall (recall 0.54-0.74 at 10M/20M bulk — the caller opts
    into that band explicitly)."""
    w = auto_n_probe(nlist)
    if mode == "recall" or n_queries <= 0:
        return w
    if mode == "throughput":
        min_recall = None
    elif mode != "auto":
        raise ValueError(f"unknown probe mode {mode!r}")
    occupancy = max(1.0, float(n) / max(1, int(nlist)))
    budget_w = int(SCAN_BUDGET_ROWS / (n_queries * occupancy))
    if budget_w < w:
        w = max(min_width_for_recall(nlist, min_recall), budget_w)
    return max(1, min(w, int(nlist)))


def choose_search_mode(nlist: int, n_probe: int) -> str:
    """'ivf' (cell-pruned) or 'flat' (full ADC scan) — the BASELINE.md
    §ann-serving selection rule as code (r9 verdict #4)."""
    return "flat" if n_probe >= nlist * FLAT_MODE_PROBE_FRAC else "ivf"


def _probed_cell_dirs(croot: str, cells) -> list[str]:
    """Direct paths of the probed cell directories across every batch —
    file listing touches O(batches · probed) dirs, never all nlist."""
    batches = [
        os.path.join(croot, b)
        for b in os.listdir(croot)
        if b.startswith("batch=")
    ]
    return [
        d
        for b in batches
        for c in cells
        if os.path.isdir(d := os.path.join(b, f"cell={int(c)}"))
    ]


# Per-process scan-relation memo (r16, guide §6/§7.3): creating the
# DataFrame for a probed-cells read is DRIVER work — file listing over
# O(probed · batches) directories plus parquet schema inference —
# measured ~0.9 s per `spark.read.parquet(*126 dirs)` at sf0.1, and a
# filtered serve paid it TWICE (codes scan + raw-rerank store scan).
# The codes tree is IMMUTABLE per (generation root, batch-dir set):
# appends only ADD batch dirs (changing the key), every fold/compaction
# bumps the generation (changing croot), and files inside a committed
# batch dir are never rewritten — so a memoized relation can never see
# stale files.  This memoizes the SCAN RELATION (unresolved rows), not
# any result: tombstone suppression, predicates and reranks all apply
# per serve on top.
_scan_memo: dict[tuple, DataFrame] = {}
_SCAN_MEMO_MAX = 64


def _codes_scan(spark, croot: str, dirs: list[str]) -> DataFrame:
    """Memoized `spark.read.option("basePath", croot).parquet(*dirs)`
    (pass dirs=[croot] for a whole-tree read).  One listing + schema
    inference per (application, croot, dir set) instead of per serve."""
    key = (spark.sparkContext.applicationId, croot, tuple(sorted(dirs)))
    hit = _scan_memo.get(key)
    if hit is not None:
        return hit
    df = spark.read.option("basePath", croot).parquet(*dirs)
    while len(_scan_memo) >= _SCAN_MEMO_MAX:
        _scan_memo.pop(next(iter(_scan_memo)))
    _scan_memo[key] = df
    return df


def _apply_id_filter(codes, filter_ids, filter_count: int | None):
    """Semi-join a serving scan down to the QUALIFYING ids (the
    pre-filter leg of filtered ANN search).  Runs BELOW the per-cell
    shortlist truncation — exactly like the tombstone anti-join — so
    the shortlist is the exact top-shortlist over qualifying survivors,
    not a post-hoc filter of an unfiltered shortlist.  Broadcasts the
    id set when its hash-table expansion fits the shared gate."""
    fi = filter_ids.select(F.col("vec_id").cast("long").alias("vec_id"))
    if (
        filter_count is not None
        and filter_count * _TOMBSTONE_ROW_BYTES
        <= _TOMBSTONE_BROADCAST_MAX_BYTES
    ):
        fi = F.broadcast(fi)
    return codes.join(fi, "vec_id", "left_semi")


def search_ann_index(
    spark, path: str, qids, qmat, qnrm, n_probe: int | None = None,
    model=None, cell_to_q=None, filter_ids=None, filter_count=None,
    filter_expr: str | None = None,
):
    """Search-only IVF-PQ over a persisted index: probe-cell pruning →
    broadcast-LUT ADC scan → per-query shortlist.  Returns the shortlist
    (query_id, neighbor_id) — callers exact-rerank against whatever
    full-precision store they serve from.  ``n_probe=None`` resolves to
    ``auto_n_probe(nlist)`` (the measured default; explicit values
    override).

    Pruning is DIRECT-PATH, not filter-based: the probed
    batch=*/cell=C directories are enumerated driver-side and handed to
    the reader explicitly, so file listing touches only
    O(batches · probed) directories.  Reading the layout root instead
    makes Spark's parallel partition discovery list ALL nlist
    directories first (one listing task per directory — ~9k tasks at
    N=10M before a single byte of codes is read).  The `cell` filter
    stays on as a semantic guard; it prunes nothing the path list
    hasn't already.

    ``model`` (the ``load_ann_model`` triple) and ``cell_to_q`` (the
    driver-side probe map) let a caller that already resolved them —
    ``serve_topk`` — thread ONE meta snapshot and ONE probe map through
    the whole serve instead of re-reading/recomputing here (r11 verdict
    "missing" #2: three meta reads per serve left generation atomicity
    resting on an invariant argument, not a mechanism)."""
    if model is None:
        model = load_ann_model(spark, path)
    meta, cent_mat, books = model
    if n_probe is None:
        n_probe = auto_n_probe(meta["nlist"])
    shortlist = max(PQ_SHORTLIST, meta["n"] // PQ_SHORTLIST_FRAC)
    if cell_to_q is None:
        cell_to_q = _probe_map(cent_mat, qmat, n_probe)
    # the whole serve resolves ONE meta snapshot: codes tree, tombstone
    # tree, and delete cover all come from the generation this load saw
    croot = _codes_root_gen(path, _gen_of(meta))
    if not os.path.isdir(croot):
        raise FileNotFoundError(f"ANN layout has no codes tree: {croot}")
    probed_dirs = _probed_cell_dirs(croot, cell_to_q)
    if not probed_dirs:  # every probed cell empty in every batch
        return spark.createDataFrame([], "query_id long, neighbor_id long")
    codes = _codes_scan(spark, croot, probed_dirs).where(
        F.col("cell").isin([int(c) for c in cell_to_q])
    )
    codes = _live_codes(spark, path, codes, meta)
    if filter_expr is not None:
        # predicate pushdown: the metadata columns live IN the codes
        # layout (meta_cols builds), so the predicate evaluates
        # scan-side as a pushed parquet filter — below the shortlist
        # truncation, exactly where the id semi-join sits (r13 verdict
        # "missing" #2).  No qualifying-id relation is produced/joined.
        codes = codes.where(F.expr(filter_expr))
    if filter_ids is not None:
        codes = _apply_id_filter(codes, filter_ids, filter_count)
    # emission cap: 2x the even-spread share of the global shortlist
    # across the probe width — engaged only when the estimated emission
    # is bulk-sized; interactive serves stay lossless (advice r12 #2).
    # The estimate scales by the batch-dir count: truncation is per
    # (batch dir, cell, query), so fragmentation multiplies emission.
    n_frag = sum(1 for b in os.listdir(croot) if b.startswith("batch="))
    cap = _per_cell_cap(len(qids), int(n_probe), shortlist, n_frag)
    return _adc_scan(
        spark, codes, meta, books, qids, qmat, qnrm, shortlist, cell_to_q,
        per_cell_cap=cap,
    )


def search_flat_pq(
    spark, path: str, qids, qmat, qnrm, model=None,
    filter_ids=None, filter_count=None, filter_expr: str | None = None,
):
    """Flat ADC over the same persisted codes — NO cell pruning (every
    query scores every code).  The |Q|-crossover counterpart of
    search_ann_index: flat pays O(|Q|·N) ADC but no recall loss from
    pruning; IVF pays O(|Q|·nprobe·N/nlist).  Measured curve in
    BASELINE.md §ann-serving.  ``model`` threads a caller's one meta
    snapshot (see search_ann_index)."""
    if model is None:
        model = load_ann_model(spark, path)
    meta, _cent, books = model
    shortlist = max(PQ_SHORTLIST, meta["n"] // PQ_SHORTLIST_FRAC)
    croot = _codes_root_gen(path, _gen_of(meta))
    if not os.path.isdir(croot):
        raise FileNotFoundError(f"ANN layout has no codes tree: {croot}")
    codes = _live_codes(spark, path, _codes_scan(spark, croot, [croot]), meta)
    if filter_expr is not None:
        codes = codes.where(F.expr(filter_expr))  # pushed parquet filter
    if filter_ids is not None:
        codes = _apply_id_filter(codes, filter_ids, filter_count)
    all_q = list(range(len(qids)))
    cell_to_q = {c: all_q for c in range(meta["nlist"])}
    n_frag = sum(1 for b in os.listdir(croot) if b.startswith("batch="))
    cap = _per_cell_cap(len(qids), int(meta["nlist"]), shortlist, n_frag)
    return _adc_scan(
        spark, codes, meta, books, qids, qmat, qnrm, shortlist, cell_to_q,
        per_cell_cap=cap,
    )


def search_auto(
    spark, path: str, qids, qmat, qnrm,
    n_probe: int | None = None, mode: str = "auto",
    min_recall: float | None = BULK_RECALL_FLOOR, model=None,
):
    """Apply the measured selection rule and serve: resolves the probe
    width from the index geometry AND the query batch size
    (``plan_n_probe`` — ``mode="recall"`` pins the recall-first width,
    ``mode="throughput"`` waives the bulk recall floor, an explicit
    ``n_probe`` overrides everything), picks flat vs IVF-pruned via
    ``choose_search_mode``, and returns ``(shortlist_df, mode)`` so
    callers/gates can see which path served the batch.  The whole
    search resolves ONE model snapshot (loaded here unless the caller
    threads its own)."""
    if model is None:
        model = load_ann_model(spark, path)
    meta = model[0]
    if n_probe is None:
        n_probe = plan_n_probe(
            meta["nlist"], meta["n"], len(qids), mode, min_recall=min_recall
        )
    smode = choose_search_mode(meta["nlist"], n_probe)
    if smode == "flat":
        return search_flat_pq(spark, path, qids, qmat, qnrm, model=model), smode
    return (
        search_ann_index(
            spark, path, qids, qmat, qnrm, n_probe=n_probe, model=model
        ),
        smode,
    )


def raw_rerank_frame(spark, path: str, meta: dict, cells, filter_expr=None):
    """(vec_id, emb, nrm) for the probed cells, read from the layout's
    own raw column (store_raw builds) — live rows only, direct-path
    dirs.  Per-serve read cost ∝ probed mass, never corpus size.
    ``filter_expr`` prunes the store scan by a metadata predicate the
    same pushed-filter way the codes scan is pruned (meta_cols
    builds)."""
    croot = _codes_root_gen(path, _gen_of(meta))
    dirs = _probed_cell_dirs(croot, cells)
    if not dirs:
        return spark.createDataFrame(
            [], "vec_id long, emb array<double>, nrm double"
        )
    df = _codes_scan(spark, croot, dirs).where(
        F.col("cell").isin([int(c) for c in cells])
    )
    if filter_expr is not None:
        df = df.where(F.expr(filter_expr))
    df = _live_codes(spark, path, df, meta)
    return df.select(
        "vec_id", F.col("emb").cast("array<double>").alias("emb"), "nrm"
    )


def serve_topk(
    spark, path: str, qids, qmat, qnrm,
    n_probe: int | None = None, mode: str = "auto", norms_df=None,
    min_recall: float | None = BULK_RECALL_FLOOR,
):
    """The full serving pipeline: |Q|-aware shortlist (``search_auto``
    semantics) + exact rerank.  A ``store_raw`` layout reranks from the
    PROBED partitions of its own codes tree — the serving-store shape:
    at 1M × d=768 the corpus-rescan rerank held the warm serve at ~50 s
    (a 3 GB scan per batch) while the probed partitions are ~1/100th of
    that.  Non-raw layouts rerank against ``norms_df`` (vec_id, emb,
    nrm) — the caller's full-precision store.

    GENERATION-ATOMIC BY CONSTRUCTION (r11 verdict "missing" #2): the
    model — and with it meta.json — is read exactly ONCE here; the
    shortlist scan, tombstone anti-join, and raw rerank all resolve
    from this single snapshot, so a compaction flipping the generation
    mid-serve cannot split the serve across two trees.  The probe map
    is likewise computed once and shared between the ADC scan and the
    rerank's partition list.

    Recall stance: ``mode="auto"`` may narrow the probe width for bulk
    batches but never below the BULK_RECALL_FLOOR-satisfying width;
    ``mode="throughput"`` (or ``min_recall=None``) opts into the
    probe-8 wall at its measured 0.54-0.74 bulk recall band."""
    model = load_ann_model(spark, path)
    meta, cent_mat, _books = model
    if n_probe is None:
        n_probe = plan_n_probe(
            meta["nlist"], meta["n"], len(qids), mode, min_recall=min_recall
        )
    smode = choose_search_mode(meta["nlist"], n_probe)
    if smode == "flat":
        shortlist = search_flat_pq(spark, path, qids, qmat, qnrm, model=model)
        cells = list(range(meta["nlist"]))
    else:
        cell_to_q = _probe_map(cent_mat, qmat, n_probe)
        shortlist = search_ann_index(
            spark, path, qids, qmat, qnrm, n_probe=n_probe,
            model=model, cell_to_q=cell_to_q,
        )
        cells = list(cell_to_q)
    # the in-place-vs-join economics price the store side by the rows
    # the rerank actually reads: a raw layout reranks against
    # raw_rerank_frame (the PROBED cells only), so its store estimate
    # scales by the probed-cell fraction — pricing the full corpus
    # overstated it by ~nlist/width and could trigger the pair band
    # where the probed-partition shuffle join was cheaper (advice r12
    # #3).  A caller-supplied norms_df is the full corpus either way.
    store_est = meta["n"]
    if norms_df is None and meta.get("raw"):
        norms_df = raw_rerank_frame(spark, path, meta, cells)
        store_est = max(
            1, int(meta["n"] * len(cells) / max(1, int(meta["nlist"])))
        )
    if norms_df is None:
        raise ValueError(
            "non-raw layout needs norms_df (vec_id, emb, nrm) to rerank"
        )
    sl_rows = len(qids) * max(PQ_SHORTLIST, meta["n"] // PQ_SHORTLIST_FRAC)
    return _exact_rerank(
        spark, norms_df, shortlist, qids, qmat, qnrm, shortlist_rows=sl_rows,
        store_rows=store_est,
    )


# --- selectivity estimation (r13 verdict "missing" #3) -----------------------

# per-batch deterministic hash-sample size: 20k rows bound the estimate's
# standard error under ~0.4% absolute at any corpus size, and the whole
# sample stays a driver-trivial single-file read at serve time
_SELECTIVITY_SAMPLE_TARGET = 20_000
_SELECTIVITY_SAMPLE_MOD = 1 << 20


def _write_selectivity_sample(meta_df, n_rows: int, out_dir: str) -> None:
    """Persist a deterministic hash-sample of the filterable metadata
    columns (vec_id + meta_cols) under ``sample.parquet/batch=<tag>``.
    xxhash64(vec_id) sampling is reproducible across engines and
    independent of the label distribution; ~20k rows per batch keep the
    serve-time estimate O(1) in the corpus size."""
    keep = max(
        1,
        int(
            _SELECTIVITY_SAMPLE_MOD
            * min(1.0, _SELECTIVITY_SAMPLE_TARGET / max(1, int(n_rows)))
        ),
    )
    (
        meta_df.where(
            F.pmod(
                F.xxhash64(F.col("vec_id")),
                F.lit(_SELECTIVITY_SAMPLE_MOD),
            )
            < F.lit(keep)
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(out_dir)
    )


_selectivity_memo: dict[tuple, tuple] = {}
_SELECTIVITY_MEMO_MAX = 256  # ad-hoc predicates must not grow unbounded


def _sample_fingerprint(sroot: str) -> tuple:
    """(name, mtime_ns, size) of every file under the sample dir —
    appends/migrations that rewrite or add sample batches change it."""
    out = []
    for base, _dirs, files in os.walk(sroot):
        for f in files:
            st = os.stat(os.path.join(base, f))
            out.append((os.path.relpath(os.path.join(base, f), sroot),
                        st.st_mtime_ns, st.st_size))
    return tuple(sorted(out))


def estimate_selectivity(spark, path: str, filter_expr: str):
    """Laplace-smoothed selectivity estimate for a metadata predicate,
    from the layout's persisted hash-sample — an O(sample)=O(1) job,
    never an O(n) qualifying count in the serve path (r13 verdict
    "missing" #3).  Returns None when the layout carries no sample
    (built without ``meta_cols``); staleness is bounded by the deleted
    fraction since the last rebuild/migration, inside the ±2× error
    band the filtered-serve planner is pinned stable under.

    Memoized per (path, predicate) against the sample FILES' stat
    fingerprint (r15, same pattern as _model_memo): a serving process
    estimating the same predicate re-runs the sample job only when a
    mutation rewrote/extended the sample."""
    sroot = os.path.join(path, "sample.parquet")
    if not os.path.isdir(sroot) or not _has_parquet_files(sroot):
        return None
    fp = _sample_fingerprint(sroot)
    key = (path, filter_expr)
    hit = _selectivity_memo.get(key)
    if hit is not None and hit[0] == fp:
        return hit[1]
    if hit is not None:  # sample rewritten: every estimate for this
        # path is stale — evict them all (the ivf._n_cache pattern,
        # advice r15 #4) instead of letting superseded entries pile up
        for k in [k for k in _selectivity_memo if k[0] == path]:
            _selectivity_memo.pop(k)
    while len(_selectivity_memo) >= _SELECTIVITY_MEMO_MAX:
        _selectivity_memo.pop(next(iter(_selectivity_memo)))
    agg = (
        spark.read.parquet(sroot)
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.expr(filter_expr), F.lit(1)).otherwise(F.lit(0))
            ).alias("q"),
        )
        .first()
    )
    est = (float(agg.q or 0) + 1.0) / (float(agg.n or 0) + 2.0)
    _selectivity_memo[key] = (fp, est)
    return est


# --- filtered ANN search (r12 verdict "What's missing" #2) -------------------
#
# Every production vector store serves "top-k WHERE metadata predicate"
# (tenant, language, date).  The predicate reduces to a qualifying-id
# set; the serve then picks between two classical plans:
#
# * PRE-filter: semi-join the qualifying ids into the codes scan BELOW
#   the shortlist truncation (the same machinery as the tombstone
#   anti-join), so the shortlist — and the exact rerank over the
#   filtered store — is the true top-k over qualifying survivors.  The
#   probe width widens by 1/selectivity (each probed cell holds only a
#   selectivity-fraction of qualifying mass, so the scan must see more
#   cells to surface the same qualifying candidate count; the scored
#   rows stay ≈ the unfiltered serve's because the semi-join removes
#   the complement).  The right plan at LOW selectivity, where the
#   post-filter's overfetch explodes.
# * POST-filter: serve UNFILTERED with an overfetched k' =
#   ceil(margin · k / selectivity), then keep qualifying neighbors and
#   re-rank to k.  No semi-join against the scan, no extra probes —
#   the right plan at HIGH selectivity where most of any top-k'
#   already qualifies and the pre-filter's semi-join would touch
#   nearly every scanned row for nothing.
#
# The crossover is a coded rule (choose_filter_mode), pinned in tests
# like choose_search_mode: at selectivity ≥ 0.5 an overfetch of
# margin·k/sel ≤ 4·k rows per query is cheaper than a corpus-sized
# semi-join; below it the overfetch grows without bound while the
# pre-filter's semi-join SHRINKS with the qualifying set.
FILTER_PRE_MAX_SELECTIVITY = 0.5
FILTER_POST_OVERFETCH = 2.0

# pre-filter probe widening beyond the naive 1/selectivity: on
# label-correlated clusters (every real predicate: tenant, language,
# date) a query's qualifying neighbors live in OTHER clusters' cells,
# so matching the unfiltered scan's qualifying MASS is not enough —
# the scan must reach qualifying REGIONS.  Measured at 1M/sel=0.344
# |Q|=10 (width → recall@5 vs exact-filtered, wall flat 7-9 s
# throughout): 94 (1/sel) → 0.64, 188 → 0.94, 376 → 0.98, 752 → 1.00.
# 4× the 1/sel width buys 0.98 recall for no interactive wall cost;
# bulk batches pay width-proportional scan, offset ~1/sel by the
# semi-join's row removal.
FILTER_PRE_WIDEN = 4.0


def choose_filter_mode(selectivity: float) -> str:
    """'pre' (scan-side semi-join) or 'post' (overfetch + filter)."""
    return "pre" if selectivity < FILTER_PRE_MAX_SELECTIVITY else "post"


def serve_topk_filtered(
    spark, path: str, qids, qmat, qnrm, filter_ids=None,
    selectivity: float | None = None, mode: str = "auto",
    k: int | None = None, norms_df=None,
    min_recall: float | None = BULK_RECALL_FLOOR,
    filter_expr: str | None = None,
):
    """Filtered serving pipeline: top-k WHERE the neighbor satisfies a
    metadata predicate.  Two predicate forms:

    * ``filter_expr`` (the 100 TB path): a SQL predicate over the
      layout's persisted metadata columns (``meta_cols`` builds) —
      evaluated SCAN-SIDE as a pushed parquet filter below the
      shortlist truncation; no qualifying-id relation is ever produced,
      shuffled, or counted.  Selectivity defaults to the layout's
      hash-sample estimate (``estimate_selectivity`` — an O(1) job).
    * ``filter_ids`` (the arbitrary-predicate fallback): a DataFrame of
      qualifying vec_ids, semi-joined into the scan at the same plan
      position.  Selectivity defaults to an exact count of the id
      relation (O(|filter|), documented fallback cost).

    ``mode`` = "auto" (coded rule) | "pre" | "post"; returns
    ``(result_df, mode)``.  One model snapshot serves the whole
    pipeline, as serve_topk."""
    from .vector import TOP_K, _exact_rerank

    if (filter_ids is None) == (filter_expr is None):
        raise ValueError(
            "exactly one of filter_ids / filter_expr must be given"
        )
    if k is None:
        k = TOP_K
    model = load_ann_model(spark, path)
    meta, cent_mat, _books = model
    if selectivity is None:
        if filter_expr is not None:
            selectivity = estimate_selectivity(spark, path, filter_expr)
            if selectivity is None:
                # missing/unreadable sample on a meta_cols layout (a
                # crashed maintenance pass can leave none) — columnar
                # LIVE-row fallback over the codes tree's predicate
                # columns; dead rows must not inflate the numerator
                # while meta["n"] counts live only
                croot0 = _codes_root_gen(path, _gen_of(meta))
                selectivity = (
                    _live_codes(
                        spark, path, _codes_scan(spark, croot0, [croot0]), meta
                    )
                    .where(F.expr(filter_expr))
                    .count()
                    / max(1, meta["n"])
                )
        else:
            selectivity = filter_ids.count() / max(1, meta["n"])
    selectivity = min(1.0, max(selectivity, 1.0 / max(1, meta["n"])))
    n_filter = int(round(selectivity * meta["n"]))
    fmode = choose_filter_mode(selectivity) if mode == "auto" else mode
    if fmode not in ("pre", "post"):
        raise ValueError(f"unknown filter mode {fmode!r}")
    base_w = plan_n_probe(
        meta["nlist"], meta["n"], len(qids), "auto", min_recall=min_recall
    )
    if fmode == "pre":
        # widen probes so the filtered scan reaches the qualifying
        # REGIONS, not just the same qualifying mass (see
        # FILTER_PRE_WIDEN calibration)
        w = min(
            int(meta["nlist"]),
            int(np.ceil(FILTER_PRE_WIDEN * base_w / selectivity)),
        )
        w = max(base_w, w)
        cell_to_q = _probe_map(cent_mat, qmat, w)
        shortlist = search_ann_index(
            spark, path, qids, qmat, qnrm, n_probe=w, model=model,
            cell_to_q=cell_to_q, filter_ids=filter_ids,
            filter_count=n_filter, filter_expr=filter_expr,
        )
        cells = list(cell_to_q)
        store = norms_df
        store_est = n_filter
        if store is None and meta.get("raw"):
            store = raw_rerank_frame(
                spark, path, meta, cells, filter_expr=filter_expr
            )
            store_est = max(
                1,
                int(n_filter * len(cells) / max(1, int(meta["nlist"]))),
            )
        if store is None:
            raise ValueError(
                "non-raw layout needs norms_df (vec_id, emb, nrm) to rerank"
            )
        if filter_ids is not None:
            store = _apply_id_filter(store, filter_ids, n_filter)
        # expr mode: the shortlist already holds ONLY qualifying ids
        # (scan-side filter below truncation) and the rerank inner-joins
        # store to shortlist — a caller-supplied store without the
        # metadata columns needs no further restriction for correctness
        sl_rows = len(qids) * max(PQ_SHORTLIST, meta["n"] // PQ_SHORTLIST_FRAC)
        return (
            _exact_rerank(
                spark, store, shortlist, qids, qmat, qnrm,
                shortlist_rows=sl_rows, store_rows=store_est, k=k,
            ),
            fmode,
        )
    # post: unfiltered serve overfetched to margin·k/selectivity, then
    # keep qualifying neighbors and re-rank to k
    k_over = max(k, int(np.ceil(FILTER_POST_OVERFETCH * k / selectivity)))
    smode = choose_search_mode(meta["nlist"], base_w)
    if smode == "flat":
        shortlist = search_flat_pq(spark, path, qids, qmat, qnrm, model=model)
        cells = list(range(meta["nlist"]))
    else:
        cell_to_q = _probe_map(cent_mat, qmat, base_w)
        shortlist = search_ann_index(
            spark, path, qids, qmat, qnrm, n_probe=base_w, model=model,
            cell_to_q=cell_to_q,
        )
        cells = list(cell_to_q)
    store = norms_df
    store_est = meta["n"]
    if store is None and meta.get("raw"):
        store = raw_rerank_frame(spark, path, meta, cells)
        store_est = max(
            1, int(meta["n"] * len(cells) / max(1, int(meta["nlist"])))
        )
    if store is None:
        raise ValueError(
            "non-raw layout needs norms_df (vec_id, emb, nrm) to rerank"
        )
    sl_rows = len(qids) * max(PQ_SHORTLIST, meta["n"] // PQ_SHORTLIST_FRAC)
    over = _exact_rerank(
        spark, store, shortlist, qids, qmat, qnrm,
        shortlist_rows=sl_rows, store_rows=store_est, k=k_over,
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    if filter_expr is not None:
        # qualifying test from the codes tree's OWN metadata columns —
        # a (vec_id, predicate-cols) column-pruned scan with the
        # predicate pushed, restricted to the PROBED cell dirs (every
        # overfetched neighbor was read from a probed cell, so the
        # qualifying scan never needs the rest of the corpus).  The
        # overfetched side is |Q|·k' rows, so it BROADCASTS and the
        # qualifying scan streams map-side — post mode is the
        # high-selectivity regime where a left-semi against the
        # qualifying relation would shuffle ~the whole corpus's ids.
        # Tombstoned qualifying rows are harmless here (`over` already
        # excludes deleted neighbors); a re-inserted vec_id can appear
        # in several batch dirs → dropDuplicates on the joined (tiny)
        # result, never on the scan.
        croot0 = _codes_root_gen(path, _gen_of(meta))
        qdirs = _probed_cell_dirs(croot0, cells)
        if not qdirs:  # every probed cell empty (fully-dead folds vanish)
            return (
                spark.createDataFrame(
                    [], "query_id long, neighbor_id long, cosine double, rn long"
                ),
                fmode,
            )
        qscan = _codes_scan(spark, croot0, qdirs).where(
            F.col("cell").isin([int(c) for c in cells])
        )
        # LIVE rows only: a tombstoned row's STALE metadata must never
        # qualify a re-inserted neighbor whose current metadata does
        # not (found by review: delete vec X [qualifying label], re-add
        # it with a non-qualifying label → the dead row's label matched
        # the predicate and the serve returned X)
        qualifying = (
            _live_codes(spark, path, qscan, meta)
            .where(F.expr(filter_expr))
            .select(F.col("vec_id").alias("neighbor_id"))
        )
        kept = (
            qualifying.join(
                F.broadcast(over.select("query_id", "neighbor_id", "cosine")),
                "neighbor_id",
            )
            .dropDuplicates(["query_id", "neighbor_id"])
        )
    else:
        fi = filter_ids.select(
            F.col("vec_id").cast("long").alias("neighbor_id")
        )
        if n_filter * _TOMBSTONE_ROW_BYTES <= _TOMBSTONE_BROADCAST_MAX_BYTES:
            fi = F.broadcast(fi)
        kept = over.join(fi, "neighbor_id", "left_semi")
    return (
        kept.withColumn("rn", F.row_number().over(w_f).cast("long"))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", "rn"),
        fmode,
    )


def _query_rows_arrow(sf_dir, n_queries):
    """Driver-side pyarrow read of the |Q| query rows (row-group
    predicate pushdown on vec_id), with the norm computed as the SAME
    sequential left fold of squares the JVM ``_fold_sum`` runs —
    per-dimension acc += x·x in f8, so the doubles are bitwise equal
    (pinned by tests/test_round16_opt.py against the collect path).
    Returns None when the source is not locally readable parquet — the
    caller falls back to the Spark collect (r16, guide §5: a 10-row
    query fetch was a full Spark job per serve)."""
    try:
        import pyarrow.parquet as pq

        path = f"{sf_dir}/embeddings.parquet"
        if not os.path.exists(path):
            return None
        tbl = pq.read_table(
            path,
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "<", int(n_queries))],
        )
        qids = tbl.column("vec_id").to_numpy()
        col = tbl.column("embedding").combine_chunks()
        n = len(qids)
        if n == 0:
            return None
        flat = col.values.to_numpy(zero_copy_only=False)
        if flat.size % n != 0:
            return None
        qmat = flat.astype("f8", copy=False).reshape(n, flat.size // n)
        order = np.argsort(qids)
        qids = qids[order].astype("i8", copy=False)
        qmat = np.ascontiguousarray(qmat[order])
        acc = np.zeros(n, dtype="f8")
        for d in range(qmat.shape[1]):  # sequential over dims == the fold
            acc += qmat[:, d] * qmat[:, d]
        return qids, qmat, np.sqrt(acc)
    except Exception:
        return None


def _query_rows(spark, sf_dir, n_queries=N_QUERIES):
    got = _query_rows_arrow(sf_dir, n_queries)
    if got is not None:
        return got
    rows = (
        _norms(spark, sf_dir)
        .where(F.col("vec_id") < n_queries)
        .select("vec_id", "emb", "nrm")
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    qids = np.array([r.vec_id for r in rows], dtype="i8")
    qmat = np.array([list(r.emb) for r in rows], dtype="f8")
    qnrm = np.array([r.nrm for r in rows], dtype="f8")
    return qids, qmat, qnrm


def knn_cosine_served(spark, sf_dir):
    """End-to-end serving query: ensure the persisted index exists (build
    amortizes to zero across calls/processes on the same corpus), then
    search-only + exact re-rank.  Same (query_id, neighbor_id, cosine,
    rn) contract as every knn_cosine_* query.  Serves through
    ``serve_topk`` — the probe width and the flat-vs-pruned choice are
    the measured defaults, not caller knobs; the shared testdata index
    is built without store_raw, so the rerank reads the corpus."""
    path = build_ann_index(spark, sf_dir)
    qids, qmat, qnrm = _query_rows(spark, sf_dir)
    return serve_topk(
        spark, path, qids, qmat, qnrm, norms_df=_norms(spark, sf_dir)
    )


def q_knn_cosine_served(spark, sf_dir):
    """Rows-only, SELF-VERIFYING (the r7-verdict gate pattern): at
    verification scale the serving result's recall vs the exact
    brute-force top-k is enforced in-query — a corrupt persisted layout,
    collapsed codebook, or broken probe map turns the driver row red."""
    res = knn_cosine_served(spark, sf_dir)
    if corpus_rows(spark, sf_dir) <= _PQ_GATE_MAX_N:
        res = res.localCheckpoint(eager=False)
        exact = q_knn_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
        n = exact.count()
        hit = exact.join(
            res.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        ).count()
        floor = RECALL_FLOORS["knn_cosine_served"]
        if n == 0 or hit / n < floor:
            raise AssertionError(
                f"served ANN recall collapsed: {hit}/{n} vs floor {floor}"
            )
    return res


def q_ann_index_stats(spark, sf_dir):
    """Rows-only, SELF-VERIFYING build-integrity gate: every corpus
    vector must be encoded exactly once, every cell id must be a real
    centroid, every code must be exactly M bytes — raises otherwise.
    Returns one scalar row describing the persisted layout (the
    compression ratio is the PQ claim made checkable)."""
    path = build_ann_index(spark, sf_dir)
    meta, cent_mat, _books = load_ann_model(spark, path)
    codes = spark.read.parquet(_codes_root_gen(path, _gen_of(meta)))
    stats = codes.agg(
        F.count("*").alias("n_codes"),
        F.countDistinct("vec_id").alias("n_ids"),
        F.min("cell").alias("min_cell"),
        F.max("cell").alias("max_cell"),
        F.countDistinct("cell").alias("n_cells_used"),
        F.min(F.length("code")).alias("min_code_len"),
        F.max(F.length("code")).alias("max_code_len"),
    ).first()
    n = corpus_rows(spark, sf_dir)
    if stats.n_codes != n or stats.n_ids != n:
        raise AssertionError(
            f"index codes {stats.n_codes}/{stats.n_ids} != corpus {n}"
        )
    if stats.min_cell < 0 or stats.max_cell >= len(cent_mat):
        raise AssertionError(
            f"cell ids [{stats.min_cell}, {stats.max_cell}] outside "
            f"[0, {len(cent_mat)})"
        )
    if stats.min_code_len != meta["m"] or stats.max_code_len != meta["m"]:
        raise AssertionError(
            f"code byte length [{stats.min_code_len}, {stats.max_code_len}] "
            f"!= M={meta['m']}"
        )
    return spark.createDataFrame(
        [
            (
                int(n),
                int(meta["nlist"]),
                int(stats.n_cells_used),
                int(meta["m"]),
                int(meta["ksub"]),
                int(meta["m"]) + 8,  # code bytes + float64 norm
            )
        ],
        "n_vectors long, nlist long, n_cells_used long, pq_m long, "
        "pq_ksub long, bytes_per_vector long",
    )


# --- incremental maintenance (the daily-crawl shape) -------------------------


def _safe_tag(batch_tag: str) -> str:
    import re

    return re.sub(r"[^A-Za-z0-9_.-]", "-", batch_tag)


def _batch_dir(path: str, batch_tag: str, gen: int | None = None) -> str:
    if gen is None:
        gen = _gen_of(_read_meta(path))
    return os.path.join(_codes_root_gen(path, gen), f"batch={_safe_tag(batch_tag)}")


def append_ann_index(spark, path: str, emb_raw, batch_tag: str) -> int:
    """Append a NEW batch of vectors to a persisted index using the
    EXISTING quantizers — no retrain, no re-encode of the old corpus
    (the daily-crawl shape; the dedup mirror is textops'
    dedup_incremental).  New vectors are coarse-assigned and PQ-encoded
    against the persisted centroids/codebooks and land as their own
    ``codes.parquet/batch=<tag>/`` partition directory via write-to-temp
    + ONE atomic rename — so the append is crash-atomic: a killed
    writer leaves only a temp dir (reaped later), never a half-visible
    batch, and the applied-check is the batch directory's existence,
    which survives any crash (review r9 #1; the previous design
    recorded the tag in meta.json AFTER a non-atomic parquet append,
    so a crash between the two duplicated the batch on retry).

    Idempotent per ``batch_tag``; writer-writer races are serialized by
    the layout flock.  meta.json's row count advances best-effort after
    the rename (it only sizes the ADC shortlist; the integrity gates
    count the codes themselves).  Returns the number of rows appended
    (0 if the tag was already applied).

    Drift caveat (inherent to frozen quantizers): appended batches are
    encoded with the BASE distribution's centroids; under distribution
    drift cell occupancy skews and recall decays —
    vector.centroid_drift_frames(base, batch) is the monitoring query
    (the one-corpus md5-half split of q_embedding_drift cannot see an
    append batch), a full rebuild the remedy.  Measured drill:
    tools/ann_drift_run.py, numbers in BASELINE.md §ann-serving.
    """
    import time
    import uuid

    from .events import (
        _LAYOUT_HARD_CAP_SEC,
        _flock_layout_lock,
        _release_layout_lock,
    )

    tag = _safe_tag(batch_tag)
    meta, cent_mat, books = load_ann_model(spark, path)
    # applied = batch dir exists IN THE CURRENT GENERATION (crash window:
    # rename landed, meta write didn't) OR tag in the ledger (compaction
    # folded the dir away but merged the tag into the ledger atomically
    # at the generation flip)
    if os.path.isdir(_batch_dir(path, tag, _gen_of(meta))) or tag in meta.get(
        "batches", []
    ):
        return 0
    sup_ch = build_two_level(cent_mat) if len(cent_mat) >= TWO_LEVEL_MIN else None
    mcols = tuple(meta.get("meta_cols", []))
    emb = emb_raw.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"),
        *mcols,
    )
    fd = _flock_layout_lock(f"{path}.lock", time.time() + _LAYOUT_HARD_CAP_SEC)
    try:
        _reap_layout_scratch(path)  # aged tmp dirs + superseded gen trees
        meta = _read_meta(path)
        target = _batch_dir(path, tag, _gen_of(meta))
        if os.path.isdir(target) or tag in meta.get("batches", []):
            return 0  # re-check under the lock
        encoded, bc = _encode_codes(
            spark, emb, cent_mat, sup_ch, books,
            with_raw=bool(meta.get("raw")), meta_cols=mcols,
        )
        encoded = encoded.localCheckpoint(eager=True)  # one encode pass
        n_new = encoded.count()
        tmp = os.path.join(path, f".batch-tmp-{uuid.uuid4().hex}")
        (
            encoded.repartition("cell")
            .sortWithinPartitions("vec_id")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(tmp)
        )
        os.rename(tmp, target)  # the commit point
        if mcols:
            # batch's own selectivity-sample slice: crash AFTER the
            # batch rename but before this write only costs estimate
            # freshness, never correctness (the estimator smooths)
            _write_selectivity_sample(
                emb.select("vec_id", *mcols), n_new,
                os.path.join(path, "sample.parquet", f"batch={tag}"),
            )
        meta = _read_meta(path)
        meta["n"] = meta["n"] + n_new
        meta["batches"] = meta.get("batches", []) + [tag]
        tmp_meta = os.path.join(path, ".meta.json.tmp")
        with open(tmp_meta, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp_meta, os.path.join(path, "meta.json"))
        bc.destroy(blocking=False)
        return n_new
    finally:
        _release_layout_lock(fd)


# --- tombstone deletions (takedowns / dedup survivors changing) --------------

# tombstone anti-join broadcast gate: the broadcast side is the
# tombstones EXPANDED across their covered batches (rows × |cover|) and
# decompressed into one hash table per executor — so the gate estimates
# the EXPANDED in-memory size (advice r10 #2: raw parquet bytes of the
# id-lists under-count by the cover factor after many appends), at
# ~64 B per (vec_id, batch-string) hash-table entry.  Above the gate the
# join falls back to a keyed shuffle — correct either way, and
# compaction is the pressure valve that folds tombstones to zero.
_TOMBSTONE_BROADCAST_MAX_BYTES = 64 << 20
_TOMBSTONE_ROW_BYTES = 64


def _tombstone_dirs(path: str, gen: int | None = None) -> list[str]:
    if gen is None:
        gen = _gen_of(_read_meta(path))
    troot = _tomb_root_gen(path, gen)
    try:
        return sorted(
            os.path.join(troot, n)
            for n in os.listdir(troot)
            if n.startswith("del=")
        )
    except OSError:
        return []


def _tombstone_rows(dirs: list[str]) -> dict[str, int]:
    """Row count per delete tag, read from the parquet footers (no scan
    job) — feeds the expanded-size broadcast gate."""
    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    # tombstone rows are (vec_id int64, batch string) — conservative
    # LOWER bound on bytes/row so an unreadable footer OVERcounts rows
    # and pushes the expanded-size gate toward the shuffle path (the
    # safe direction: a broadcast of an undercounted anti-join side is
    # the executor-OOM the gate exists to prevent, advice r11 #2)
    _FALLBACK_BYTES_PER_ROW = 8
    for d in dirs:
        tag = os.path.basename(d).split("=", 1)[1]
        n = 0
        for r, _sub, fs in os.walk(d):
            for f in fs:
                if not (f.endswith(".parquet") or f.startswith("part-")):
                    continue
                fp = os.path.join(r, f)
                try:
                    n += pq.ParquetFile(fp).metadata.num_rows
                except Exception:
                    # unreadable footer — estimate by bytes so the
                    # batch still counts toward the gate
                    try:
                        n += max(1, os.path.getsize(fp) // _FALLBACK_BYTES_PER_ROW)
                    except OSError:
                        continue
        out[tag] = n
    return out


def _live_codes(spark, path: str, codes: DataFrame, meta: dict | None = None) -> DataFrame:
    """Anti-join pending tombstones out of a codes scan.  Runs BEFORE
    the ADC kernel's per-cell shortlist truncation, so serving returns
    the exact top-k over the SURVIVING corpus — a deleted vector can
    neither be returned nor displace a live candidate out of a
    truncated per-cell list.  No tombstones → the scan is untouched
    (the common case pays one listdir).

    Suppression is SEQUENCED, not global: each delete batch records the
    batch tags applied at delete time (meta ``delete_cover``) and the
    anti-join keys on (vec_id, batch) — so a vector re-appended AFTER
    its deletion serves again immediately (the index analogue of
    merge_upsert_chain's re-insert-after-delete leg), while a global
    vec_id anti-join would suppress the new row and the compaction fold
    would then drop it permanently.  A del batch missing from the cover
    map (its writer died between the rename and the meta write) falls
    back to covering every batch present in ITS generation — the
    conservative direction for a takedown, and bounded to the snapshot:
    tombstones, cover, and codes all resolve from ONE meta read, so a
    gen-G cover can never suppress rows of a later generation's folded
    tree (advice r10 #1 — the v2 crash window this design removes)."""
    if meta is None:
        meta = _read_meta(path)
    supp = _suppression_frame(spark, path, meta)
    if supp is None:
        return codes
    return codes.join(
        supp,
        (codes["vec_id"] == supp["vec_id"])
        & (codes["batch"].cast("string") == supp["_supp_batch"]),
        "left_anti",
    )


def _suppression_frame(spark, path: str, meta: dict):
    """The (vec_id, _supp_batch) pair set the pending tombstones
    suppress, with the broadcast-vs-shuffle gate applied; None when no
    tombstones are pending.  Shared by the serving anti-join
    (_live_codes) and the per-cell garbage accounting (ann_cell_stats)
    so both see the identical sequenced-cover semantics."""
    gen = _gen_of(meta)
    dirs = _tombstone_dirs(path, gen)
    if not dirs:
        return None
    cover = meta.get("delete_cover", {})
    all_batches = [
        n.split("=", 1)[1]
        for n in os.listdir(_codes_root_gen(path, gen))
        if n.startswith("batch=")
    ]
    pairs = [
        (os.path.basename(d).split("=", 1)[1], b)
        for d in dirs
        for b in cover.get(os.path.basename(d).split("=", 1)[1], all_batches)
    ]
    covered = spark.createDataFrame(pairs, "del string, batch string")
    tomb = (
        spark.read.option("basePath", _tomb_root_gen(path, gen))
        .parquet(*dirs)
        .select("vec_id", F.col("del").cast("string").alias("del"))
    )
    supp = tomb.join(covered, "del").select(
        "vec_id", F.col("batch").alias("_supp_batch")
    )
    rows = _tombstone_rows(dirs)
    expanded = sum(
        rows.get(tag, 0) * len(cover.get(tag, all_batches)) for tag in rows
    )
    if expanded * _TOMBSTONE_ROW_BYTES <= _TOMBSTONE_BROADCAST_MAX_BYTES:
        supp = F.broadcast(supp)
    return supp


def delete_ann_index(spark, path: str, vec_ids, delete_tag: str) -> int:
    """Delete vectors from a persisted index WITHOUT rebuilding it (r9
    verdict "What's missing" #1 — takedowns and dedup-survivor churn in
    a daily crawl).  ``vec_ids`` is a DataFrame with a ``vec_id``
    column; the distinct ids land as a ``tombstones.g<G>.parquet/del=<tag>/``
    batch via write-to-temp + ONE atomic rename — the same crash-atomic
    protocol as appends, with the same applied-check (dir existence, or
    the tag in meta's ``deletes`` ledger once compaction folds the dir
    away).  Serving anti-joins pending tombstones out of every scan;
    ``compact_ann_index`` rewrites the codes without the dead rows and
    empties the tombstone set.  Idempotent per ``delete_tag``; returns
    the number of tombstoned ids (0 if the tag was already applied).

    Deletion cost scales with the DELTA (an id-list write), not the
    corpus — the read-side cost until the next compaction is one
    (usually broadcast) anti-join per serve."""
    import time
    import uuid

    from .events import (
        _LAYOUT_HARD_CAP_SEC,
        _flock_layout_lock,
        _release_layout_lock,
    )

    def _applied(meta: dict, target: str) -> bool:
        # fully applied = ledgered (pending-with-cover, or folded).  A
        # tombstone dir WITHOUT its ledger entry is a delete that died
        # between the rename and the meta write — the replay must
        # COMPLETE the bookkeeping, not no-op: with no cover recorded,
        # _live_codes falls back to covering every batch, and a
        # re-insert landed after the crash would be folded away for
        # good (found by the tools/ann_churn_run.py drill design).
        return tag in meta.get("deletes", []) and (
            not os.path.isdir(target) or tag in meta.get("delete_cover", {})
        )

    tag = _safe_tag(delete_tag)
    meta = _read_meta(path)
    gen = _gen_of(meta)
    target = os.path.join(_tomb_root_gen(path, gen), f"del={tag}")
    if _applied(meta, target):
        return 0
    fd = _flock_layout_lock(f"{path}.lock", time.time() + _LAYOUT_HARD_CAP_SEC)
    try:
        _reap_layout_scratch(path)
        meta = _read_meta(path)
        gen = _gen_of(meta)
        target = os.path.join(_tomb_root_gen(path, gen), f"del={tag}")
        if _applied(meta, target):
            return 0  # re-check under the lock
        if os.path.isdir(target):
            # crash-window repair: the id-list landed, the meta write
            # didn't.  Record the ledger + a cover of the batches
            # present NOW — possibly wider than at the original delete
            # (batches appended during the crash window get covered:
            # the conservative takedown direction, bounded to the
            # window instead of lasting until the fold).  n stays
            # untouched (advisory; compaction resyncs it exactly).
            cover = sorted(
                n.split("=", 1)[1]
                for n in os.listdir(_codes_root_gen(path, gen))
                if n.startswith("batch=")
            )
            meta["deletes"] = meta.get("deletes", []) + [tag]
            meta.setdefault("delete_cover", {})[tag] = cover
            tmp_meta = os.path.join(path, ".meta.json.tmp")
            with open(tmp_meta, "w") as fh:
                json.dump(meta, fh)
            os.replace(tmp_meta, os.path.join(path, "meta.json"))
            return 0
        ids = vec_ids.select(F.col("vec_id").cast("long").alias("vec_id")).distinct()
        # the advisory meta['n'] decrement counts only ids NOT already
        # tombstoned in this generation (advice r10 #4: overlapping
        # deletes under different tags were double-decrementing n and
        # shrinking the ADC shortlist sizing); ids absent from the
        # corpus still count here — compaction resynchronizes n from
        # the folded row count, atomically with the generation flip
        prior_dirs = _tombstone_dirs(path, gen)
        if prior_dirs:
            prior = (
                spark.read.option("basePath", _tomb_root_gen(path, gen))
                .parquet(*prior_dirs)
                .select("vec_id")
            )
            fresh = ids.join(prior, "vec_id", "left_anti")
        else:
            fresh = ids
        n_del = fresh.count()
        # the delete covers exactly the batches applied so far: later
        # appends of the same ids are NEW rows and must serve (the
        # sequencing that makes re-insert-after-delete correct).  The
        # tag's id-list is the FULL supplied set — an id tombstoned
        # under an earlier tag, re-appended, then deleted again must be
        # suppressed in the new batches only this wider cover sees.
        cover = sorted(
            n.split("=", 1)[1]
            for n in os.listdir(_codes_root_gen(path, gen))
            if n.startswith("batch=")
        )
        tmp = os.path.join(path, f".del-tmp-{uuid.uuid4().hex}")
        ids.coalesce(1).write.mode("overwrite").parquet(tmp)
        os.makedirs(_tomb_root_gen(path, gen), exist_ok=True)
        os.rename(tmp, target)  # the commit point
        # meta advances best-effort after the rename (ledger for the
        # post-compaction applied-check; n only sizes the ADC shortlist)
        meta = _read_meta(path)
        meta["n"] = max(1, meta["n"] - n_del)
        meta["deletes"] = meta.get("deletes", []) + [tag]
        meta.setdefault("delete_cover", {})[tag] = cover
        tmp_meta = os.path.join(path, ".meta.json.tmp")
        with open(tmp_meta, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp_meta, os.path.join(path, "meta.json"))
        return n_del
    finally:
        _release_layout_lock(fd)


def ann_cell_stats(spark, path: str, meta: dict | None = None) -> dict:
    """Per-cell maintenance ledger for the CURRENT generation: for each
    cell, its file count and byte size across every batch directory
    (filesystem walk) plus its total and tombstone-suppressed ("dead")
    row counts.  The dead count joins the codes against the shared
    suppression frame reading ONLY the (vec_id, cell, batch) columns —
    parquet column pruning keeps the code/raw bytes on disk, so the
    stats pass costs O(corpus ids), not O(corpus bytes): ~80 MB of
    column reads at 10M rows against a ~33 GB raw tree.  This is the
    selection input for budgeted partial folds; the driver-side result
    is one dict entry per OCCUPIED cell (≤ nlist — bounded like the
    centroid collect)."""
    if meta is None:
        meta = _read_meta(path)
    gen = _gen_of(meta)
    croot = _codes_root_gen(path, gen)
    stats: dict[int, dict] = {}
    for b in os.listdir(croot):
        if not b.startswith("batch="):
            continue
        bdir = os.path.join(croot, b)
        for c in os.listdir(bdir):
            if not c.startswith("cell="):
                continue
            s = stats.setdefault(
                int(c.split("=", 1)[1]),
                {"files": 0, "bytes": 0, "rows": 0, "dead": 0},
            )
            for r, _d, fs in os.walk(os.path.join(bdir, c)):
                for f in fs:
                    if f.endswith(".parquet") or f.startswith("part-"):
                        s["files"] += 1
                        try:
                            s["bytes"] += os.path.getsize(os.path.join(r, f))
                        except OSError:
                            pass
    codes = spark.read.parquet(croot)
    for r in codes.groupBy("cell").agg(F.count("*").alias("cnt")).collect():
        stats.setdefault(
            int(r["cell"]), {"files": 0, "bytes": 0, "rows": 0, "dead": 0}
        )["rows"] = int(r["cnt"])
    supp = _suppression_frame(spark, path, meta)
    if supp is not None:
        sel = codes.select("vec_id", "cell", "batch")
        matched = sel.join(
            supp,
            (sel["vec_id"] == supp["vec_id"])
            & (sel["batch"].cast("string") == supp["_supp_batch"]),
            "left_semi",
        )
        for r in matched.groupBy("cell").agg(F.count("*").alias("cnt")).collect():
            if int(r["cell"]) in stats:
                stats[int(r["cell"])]["dead"] = int(r["cnt"])
    return stats


# a cell qualifies for a partial fold when it carries tombstoned rows
# (garbage) or its codes have fragmented across this many files (append
# decay).  8 files ≈ 8 appends since the cell last folded — past the
# point where per-file open/footer overhead shows up in the scan.
COMPACT_FRAG_FILES = 8


def plan_compaction_cells(
    stats: dict,
    scratch_budget_bytes: int | None = None,
    frag_files: int | None = COMPACT_FRAG_FILES,
) -> list[int]:
    """Select the cells a budgeted partial fold should rewrite: every
    cell with dead rows or ≥ ``frag_files`` fragments qualifies;
    ordering is garbage-ratio DESC (most reclaimed per byte rewritten
    first), then bytes ASC.  The byte budget bounds the bytes-in-flight
    of one round — qualifying cells that do not fit are left for the
    next round; the first qualifying cell is always taken so a
    single over-budget cell cannot stall the loop forever."""
    cand = [
        (c, s)
        for c, s in stats.items()
        if s["dead"] > 0
        or (frag_files is not None and s["files"] >= frag_files)
    ]
    cand.sort(
        key=lambda cs: (
            -(cs[1]["dead"] / max(1, cs[1]["rows"])),
            cs[1]["bytes"],
            cs[0],
        )
    )
    out: list[int] = []
    spent = 0
    for c, s in cand:
        if (
            out
            and scratch_budget_bytes is not None
            and spent + s["bytes"] > scratch_budget_bytes
        ):
            continue  # doesn't fit this round; smaller cells may still
        out.append(c)
        spent += s["bytes"]
    return sorted(out)


def _link_tree(src: str, dst: str) -> None:
    """Mirror ``src`` into ``dst`` via hard links (same filesystem by
    construction — both live inside the layout directory), falling back
    to a copy per file if the FS refuses links.  Parquet files are
    immutable once landed, so linked generations share bytes safely;
    a superseded tree's rmtree just drops link counts."""
    import shutil

    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        troot = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(troot, exist_ok=True)
        for f in files:
            s, t = os.path.join(root, f), os.path.join(troot, f)
            try:
                os.link(s, t)
            except OSError:
                shutil.copy2(s, t)


def _rebuild_selectivity_sample(spark, path, new_root, mcols, n_live):
    """Replace the layout's selectivity sample from a freshly-committed
    codes tree — deleted rows leave, so the estimator's staleness
    resets at every garbage-clearing fold and at migration.  The sample
    is advisory (estimates only): replace-by-rename outside the
    generation commit is sound, and a crash leaves either the old
    sample (stale but inside the ±2× planner band) or a prefix-reaped
    scratch dir."""
    import shutil
    import uuid

    if not mcols:
        return
    stmp = os.path.join(path, f".batch-tmp-{uuid.uuid4().hex}")
    if n_live > 0:
        _write_selectivity_sample(
            spark.read.parquet(new_root).select("vec_id", *mcols),
            n_live,
            os.path.join(stmp, "batch=folded"),
        )
    else:
        os.makedirs(stmp, exist_ok=True)
    sold = os.path.join(path, "sample.parquet")
    if os.path.isdir(sold):
        shutil.rmtree(sold)
    os.rename(stmp, sold)


def _has_parquet_files(d: str) -> bool:
    """True iff ``d`` holds at least one parquet data file.  Guards the
    read-back after maintenance writes: ``partitionBy`` over an EMPTY
    frame leaves a _SUCCESS-only directory that ``spark.read.parquet``
    rejects with 'Unable to infer schema' (advice r13 #1) — filesystem
    walk, no Spark job."""
    for _root, _dirs, files in os.walk(d):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def compact_ann_index(
    spark,
    path: str,
    cells: list[int] | None = None,
    scratch_budget_bytes: int | None = None,
) -> dict:
    """Layout maintenance for an appended index: every daily append adds
    per-cell files under its own batch directory, so after K appends a
    cell's codes are scattered over K small files — the same
    small-file decay events.compact_small_files handles for plain
    tables, here with the batch dimension folded away — and every
    pending tombstone taxes serving with an anti-join until it folds.

    TWO SHAPES (r12 verdict #1 — the whole-tree fold was the round's
    one `weak`: O(corpus) I/O and 2×-corpus scratch no matter how
    little garbage exists, measured infeasible at 10M×768 on one box):

    * FULL (``cells=None, scratch_budget_bytes=None``): rewrites ALL
      batches — minus tombstones — into a single fresh ``batch=base``
      tree under the next generation.  Total defragmentation; cost and
      scratch ∝ corpus.
    * PARTIAL (``cells=[...]`` or a byte budget): rewrites ONLY the
      selected cells — chosen by garbage ratio from ``ann_cell_stats``
      under ``scratch_budget_bytes`` of bytes-in-flight — into ONE new
      ``batch=fold-g<G+1>`` directory; every other cell of every batch
      is HARD-LINKED into the new generation unchanged (zero bytes
      copied, zero bytes of scratch).  Cost ∝ the folded cells, which
      at a skewed delete is ∝ garbage; at a uniform delete the
      budgeted loop (``compact_ann_index_incremental``) bounds PEAK
      scratch per round where the monolithic fold needed the whole
      tree resident.

      Correctness of the partial fold rests on two invariants:
      (a) the fold output lands under a batch name (``fold-g<G+1>``)
      that NO retained delete cover lists — covers enumerate batch
      tags present at delete time, so a re-inserted-then-folded row
      can never be re-suppressed by a stale cover (the failure mode a
      fold into ``batch=base`` would create); pending tombstones are
      carried VERBATIM (ids + covers) via hard links and keep
      suppressing the unfolded cells exactly as before.
      (b) a delete tag with a tombstone dir but NO cover entry (its
      writer died pre-meta-write) gets its cover REPAIRED to the old
      generation's batch list before the carry, so the conservative
      all-batches fallback can never widen onto the new fold batch.
      When the folded set covers EVERY cell with garbage, the
      tombstone tree is dropped entirely (nothing left to suppress)
      and the cover map clears — the partial fold then leaves the
      layout in exactly the state a full fold would, minus the
      unnecessary rewrites.

    Commit protocol is unchanged either way: ONE atomic ``os.replace``
    of meta.json bumps the generation pointer, merges the batch/delete
    ledgers, resyncs the advisory row count, and (full fold or
    final partial fold) clears the delete-cover map.  Readers resolve
    every tree through the pointer, so there is NO intermediate state
    to observe or repair; superseded trees are utime-stamped and
    reaped age-gated (hard links make the reap safe — shared bytes
    survive until the LAST referencing generation goes).  Returns
    before/after file counts plus rows kept/tombstoned (and, partial,
    the folded cell count).  Surviving rows are preserved EXACTLY
    (count-gated in-function; the declared gates re-check end-to-end).
    """
    import shutil
    import time
    import uuid

    from .events import (
        _LAYOUT_HARD_CAP_SEC,
        _flock_layout_lock,
        _release_layout_lock,
    )

    def _n_files(p):
        return sum(
            1
            for r, _d, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet") or f.startswith("part-")
        )

    partial = cells is not None or scratch_budget_bytes is not None
    fd = _flock_layout_lock(f"{path}.lock", time.time() + _LAYOUT_HARD_CAP_SEC)
    try:
        _reap_layout_scratch(path)
        meta = _read_meta(path)
        gen = _gen_of(meta)
        old_root = _codes_root_gen(path, gen)
        old_troot = _tomb_root_gen(path, gen)
        files_before = _n_files(old_root)
        # ledger repair: a tag applied (dir renamed in) whose best-effort
        # meta write died is merged into the ledgers here; the merge
        # commits atomically WITH the fold below, so no pre-fold meta
        # write is needed.  fold-g* names are FOLD outputs, not append
        # tags — they never enter the batches ledger.
        dir_tags = [
            name.split("=", 1)[1]
            for name in os.listdir(old_root)
            if name.startswith("batch=")
            and name != "batch=base"
            and not name.startswith("batch=fold-g")
        ]
        del_tags = [
            os.path.basename(d).split("=", 1)[1]
            for d in _tombstone_dirs(path, gen)
        ]
        merged = list(dict.fromkeys(meta.get("batches", []) + dir_tags))
        merged_del = list(dict.fromkeys(meta.get("deletes", []) + del_tags))
        # keep `batch` through the tombstone anti-join (suppression keys
        # on (vec_id, batch)); the fold itself then drops it.  A raw
        # layout carries its emb column through the fold unchanged.
        data_cols = (
            ["vec_id", "cell", "code", "nrm"]
            + (["emb"] if meta.get("raw") else [])
            + list(meta.get("meta_cols", []))
        )
        if partial:
            return _compact_partial(
                spark, path, meta, gen, old_root, old_troot, files_before,
                merged, merged_del, del_tags, data_cols, cells,
                scratch_budget_bytes, _n_files,
            )
        codes = spark.read.parquet(old_root).select(*data_cols, "batch")
        n_before = codes.count()
        live = _live_codes(spark, path, codes, meta).select(*data_cols)
        tmp = os.path.join(path, f".compact-tmp-{uuid.uuid4().hex}")
        (
            live.repartition("cell")
            .sortWithinPartitions("vec_id")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(os.path.join(tmp, "batch=base"))
        )
        if _has_parquet_files(os.path.join(tmp, "batch=base")):
            n_after = spark.read.parquet(tmp).count()
        else:
            # a fully-deleted layout folds to ZERO rows: drop the
            # _SUCCESS-only dir instead of reading it (advice r13 #1)
            shutil.rmtree(os.path.join(tmp, "batch=base"), ignore_errors=True)
            os.makedirs(tmp, exist_ok=True)
            n_after = 0
        n_live = live.count()
        if n_after != n_live:
            raise AssertionError(
                f"compaction changed the live row count {n_live} -> {n_after}"
            )
        new_root = _codes_root_gen(path, gen + 1)
        if os.path.isdir(new_root):
            # unreferenced orphan of a predecessor that died before its
            # meta flip (the pointer still reads gen) — safe to replace
            shutil.rmtree(new_root)
        os.rename(tmp, new_root)
        # every delete folds away here — reset the estimator's sample
        _rebuild_selectivity_sample(
            spark, path, new_root, tuple(meta.get("meta_cols", [])),
            int(n_after),
        )
        meta = _read_meta(path)
        meta["generation"] = gen + 1
        meta["batches"] = merged
        meta["deletes"] = merged_del
        meta["delete_cover"] = {}
        meta["n"] = int(n_after)  # resync the advisory count (advice r10 #4)
        # stamp the soon-to-be-superseded trees BEFORE the meta flip
        # (advice r11 #1): their rename/creation time is long past, and
        # the age-gated reap must see a fresh mtime so in-flight gen-G
        # readers keep their files for the grace window.  Stamping
        # still-live trees is harmless if the commit below never lands;
        # stamping AFTER left a crash window where the next lock-holder
        # reaped them instantly.
        for dead in (old_root, old_troot):
            if os.path.isdir(dead):
                os.utime(dead, None)
        tmp_meta = os.path.join(path, ".meta.json.tmp")
        with open(tmp_meta, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp_meta, os.path.join(path, "meta.json"))  # THE commit
        return {
            "files_before": files_before,
            "files_after": _n_files(new_root),
            "rows": int(n_after),
            "rows_tombstoned": int(n_before - n_live),
            "cells_folded": sum(
                1
                for n in os.listdir(os.path.join(new_root, "batch=base"))
                if n.startswith("cell=")
            ),
            "garbage_cleared": True,
        }
    finally:
        _release_layout_lock(fd)


def _compact_partial(
    spark, path, meta, gen, old_root, old_troot, files_before,
    merged, merged_del, del_tags, data_cols, cells,
    scratch_budget_bytes, _n_files,
):
    """The partial-fold body of ``compact_ann_index`` (runs under the
    layout flock the caller holds — see its docstring for the two
    correctness invariants).  Folds the selected cells into one
    ``batch=fold-g<G+1>`` directory, hard-links everything else, and
    commits through the generation pointer."""
    import shutil
    import uuid

    stats = ann_cell_stats(spark, path, meta)
    garbage_cells = {c for c, s in stats.items() if s["dead"] > 0}
    if cells is None:
        cells = plan_compaction_cells(stats, scratch_budget_bytes)
    folded = {int(c) for c in cells if int(c) in stats}
    n_total_before = sum(s["rows"] for s in stats.values())
    if not folded:
        return {
            "files_before": files_before,
            "files_after": files_before,
            "rows": int(n_total_before),
            "rows_tombstoned": 0,
            "cells_folded": 0,
            "garbage_cleared": not garbage_cells,
        }
    clears_all = garbage_cells <= folded
    batch_dirs = sorted(
        n for n in os.listdir(old_root) if n.startswith("batch=")
    )
    fold_dirs = [
        d
        for b in batch_dirs
        for c in sorted(folded)
        if os.path.isdir(d := os.path.join(old_root, b, f"cell={c}"))
    ]
    codes_f = (
        spark.read.option("basePath", old_root)
        .parquet(*fold_dirs)
        .where(F.col("cell").isin([int(c) for c in folded]))
        .select(*data_cols, "batch")
    )
    n_f_before = codes_f.count()
    live_f = _live_codes(spark, path, codes_f, meta).select(*data_cols)
    fold_batch = f"batch=fold-g{gen + 1}"
    tmp = os.path.join(path, f".compact-tmp-{uuid.uuid4().hex}")
    (
        live_f.repartition("cell")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(tmp, fold_batch))
    )
    # 100%-dead cells sort FIRST in plan_compaction_cells (garbage ratio
    # DESC), so a tight-budget round can select ONLY fully-deleted cells:
    # partitionBy over an empty frame leaves a _SUCCESS-only dir whose
    # read-back cannot infer a schema (advice r13 #1).  The correct
    # outcome is that the folded cells simply vanish from the new
    # generation — drop the empty dir instead of reading it.
    if _has_parquet_files(os.path.join(tmp, fold_batch)):
        n_written = spark.read.parquet(os.path.join(tmp, fold_batch)).count()
    else:
        shutil.rmtree(os.path.join(tmp, fold_batch), ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        n_written = 0
    n_live_f = live_f.count()
    if n_written != n_live_f:
        raise AssertionError(
            f"partial fold changed the live row count {n_live_f} -> {n_written}"
        )
    # hard-link every UNFOLDED cell of every batch into the new tree —
    # zero bytes moved; the generations share the immutable files
    for b in batch_dirs:
        bdir = os.path.join(old_root, b)
        for c in os.listdir(bdir):
            if not c.startswith("cell="):
                continue
            if int(c.split("=", 1)[1]) in folded:
                continue
            _link_tree(os.path.join(bdir, c), os.path.join(tmp, b, c))
    # tombstone carry: verbatim hard-link unless this fold clears every
    # garbage cell (then nothing is left to suppress).  Repair missing
    # covers FIRST so the all-batches fallback can never widen onto the
    # new fold batch (invariant (b) in the caller's docstring).
    cover = dict(meta.get("delete_cover", {}))
    tmp_tomb = None
    if clears_all:
        cover = {}
    else:
        for tag in del_tags:
            if tag not in cover:
                cover[tag] = [
                    b.split("=", 1)[1] for b in batch_dirs
                ]
        if os.path.isdir(old_troot):
            tmp_tomb = os.path.join(path, f".compact-tmp-{uuid.uuid4().hex}")
            _link_tree(old_troot, tmp_tomb)
    new_root = _codes_root_gen(path, gen + 1)
    new_troot = _tomb_root_gen(path, gen + 1)
    for orphan in (new_root, new_troot):
        if os.path.isdir(orphan):
            # a predecessor died before its meta flip — the pointer
            # still reads gen, so the orphan is unreferenced
            shutil.rmtree(orphan)
    os.rename(tmp, new_root)
    if tmp_tomb is not None:
        os.rename(tmp_tomb, new_troot)
    dead_folded = int(n_f_before - n_live_f)
    if clears_all:
        # the terminal round of a budgeted loop: every delete is folded,
        # so one columnar pass resets the estimator's sample staleness
        _rebuild_selectivity_sample(
            spark, path, new_root, tuple(meta.get("meta_cols", [])),
            int(n_total_before - dead_folded),
        )
    meta = _read_meta(path)
    meta["generation"] = gen + 1
    meta["batches"] = merged
    meta["deletes"] = merged_del
    meta["delete_cover"] = cover
    meta["n"] = int(n_total_before - dead_folded)
    for dead in (old_root, old_troot):
        if os.path.isdir(dead):
            os.utime(dead, None)
    tmp_meta = os.path.join(path, ".meta.json.tmp")
    with open(tmp_meta, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp_meta, os.path.join(path, "meta.json"))  # THE commit
    return {
        "files_before": files_before,
        "files_after": _n_files(new_root),
        "rows": int(meta["n"]),
        "rows_tombstoned": dead_folded,
        "cells_folded": len(folded),
        "garbage_cleared": clears_all,
    }


def compact_ann_index_incremental(
    spark, path: str, scratch_budget_bytes: int, max_rounds: int = 1000
) -> dict:
    """The budgeted compaction LOOP — the steady-state maintenance shape
    for a layout whose total garbage exceeds what one round's scratch
    budget can fold (e.g. a uniform 5% delete touches every cell):
    repeat budget-bounded partial folds until no cell carries garbage
    or fragmentation.  Each round is its own locked generation commit,
    so serves interleave between rounds reading whichever snapshot the
    pointer shows — the layout is never offline, peak scratch per round
    is bounded by the budget (+ the fold's own shuffle of the same
    order), and total I/O across the loop is ∝ the garbage-bearing
    cells, not the corpus, whenever the garbage is skewed.  Returns the
    aggregate round/cell/row counts."""
    rounds = 0
    cells_total = 0
    dead_total = 0
    rows = None
    while rounds < max_rounds:
        r = compact_ann_index(
            spark, path, scratch_budget_bytes=scratch_budget_bytes
        )
        rows = r["rows"]
        if not r["cells_folded"]:
            break
        rounds += 1
        cells_total += r["cells_folded"]
        dead_total += r["rows_tombstoned"]
        if r["garbage_cleared"] and not _tombstone_dirs(path):
            # garbage is gone; remaining rounds would only chase
            # fragmentation, which the selection already covered
            if not plan_compaction_cells(ann_cell_stats(spark, path)):
                break
    return {
        "rounds": rounds,
        "cells_folded": cells_total,
        "rows_tombstoned": dead_total,
        "rows": rows,
    }


INCR_DELTA_BUCKETS = 10  # md5 bucket 0 of 10 → the "new crawl" delta (~10%)


# the deletion drill tombstones every 17th vector (deterministic,
# spread across base AND delta batches) under a fixed takedown tag
DEL_MOD, DEL_RESIDUE, DEL_TAG = 17, 3, "takedown-17-3"


def q_ann_index_incremental(spark, sf_dir):
    """Rows-only, SELF-VERIFYING: the incremental-maintenance round trip
    — append, DELETE, compact.  The corpus splits deterministically into
    a 90% base and a 10% delta (md5 bucket, the engine's standard split
    device); the base index is BUILT (training sees only base vectors),
    the delta is APPENDED with frozen quantizers, a deterministic
    takedown slice (vec_id % 17 == 3) is DELETED via tombstones, and the
    gate raises unless (a) the appended layout holds every expected
    vector exactly once with M-byte codes, (b) a second append of the
    same batch tag is a no-op, (c) a second delete of the same tag is a
    no-op, (d) compaction folds the tombstones — surviving rows
    preserved exactly, dead rows dropped exactly, tombstone tree gone —
    AND replayed append/delete feeds stay no-ops afterwards (both
    ledgers survive the fold), and (e) at verification scale, serving
    from the appended+deleted+compacted index returns NO tombstoned
    neighbor and clears the shared recall floor vs the exact top-k
    restricted to SURVIVING neighbors (a pair whose neighbor survives
    keeps its full-corpus rank, so the floor is exact, not weakened).
    The checks are idempotence-aware: on a rerun against the same
    persisted layout every mutation no-ops and the folded counts are
    asserted instead.  Returns one scalar row describing the round
    trip."""
    raw = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bucket = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % INCR_DELTA_BUCKETS
    )
    base = raw.where(bucket != 0)
    delta = raw.where(bucket == 0)
    del_pred = F.col("vec_id") % DEL_MOD == DEL_RESIDUE
    path = ann_index_path(sf_dir) + "-incr"
    build_ann_index(spark, sf_dir, path=path, emb_raw=base)
    # append returns 0 when the tag is already applied (idempotent, e.g.
    # a second run against the same persisted layout), so the reported
    # delta size comes from the split itself
    append_ann_index(spark, path, delta, "delta-bucket-0")
    n_applied = delta.count()
    n_again = append_ann_index(spark, path, delta, "delta-bucket-0")
    if n_again != 0:
        raise AssertionError(f"duplicate append applied {n_again} rows")
    n = corpus_rows(spark, sf_dir)
    n_del = raw.where(del_pred).count()
    meta, cent_mat, _books = load_ann_model(spark, path)
    # the expected code count is derived from the LAYOUT's own state
    # (batch dirs + ledgers + pending tombstones), not from this run's
    # history — so the gate is resumable from any crash point and
    # idempotent across reruns of every completed state
    gen = _gen_of(meta)
    reinsert_applied = os.path.isdir(_batch_dir(path, "reinsert-x", gen)) or (
        "reinsert-x" in meta.get("batches", [])
    )
    pending_del = os.path.isdir(
        os.path.join(_tomb_root_gen(path, gen), f"del={DEL_TAG}")
    )
    folded_del = DEL_TAG in meta.get("deletes", []) and not pending_del
    n_expected = n + (1 if reinsert_applied else 0) - (n_del if folded_del else 0)
    # the re-inserted vector appears twice until the fold collapses it
    n_ids_expected = n_expected - (
        1 if reinsert_applied and not folded_del else 0
    )
    # meta['n'] is an ADVISORY sizing hint (a crash between the atomic
    # batch rename and the meta rewrite leaves it low, by design) — the
    # binding integrity check below counts the codes themselves
    codes = spark.read.parquet(codes_root(path))
    stats = codes.agg(
        F.count("*").alias("n_codes"),
        F.countDistinct("vec_id").alias("n_ids"),
        F.min(F.length("code")).alias("min_len"),
        F.max(F.length("code")).alias("max_len"),
        F.max("cell").alias("max_cell"),
    ).first()
    if stats.n_codes != n_expected or stats.n_ids != n_ids_expected:
        raise AssertionError(
            f"appended layout holds {stats.n_codes} codes / {stats.n_ids} ids, "
            f"expected {n_expected}/{n_ids_expected}"
        )
    if stats.min_len != meta["m"] or stats.max_len != meta["m"]:
        raise AssertionError("code byte length drifted across batches")
    if stats.max_cell >= len(cent_mat):
        raise AssertionError("appended batch invented a cell id")
    # --- the deletion round trip (+ re-insert-after-delete) -----------
    delete_ann_index(spark, path, raw.where(del_pred), DEL_TAG)
    if delete_ann_index(spark, path, raw.where(del_pred), DEL_TAG) != 0:
        raise AssertionError("duplicate delete re-applied its tombstones")
    # re-append ONE tombstoned vector as a fresh batch: suppression is
    # sequenced by delete cover, so the new row must serve while every
    # pre-delete copy stays suppressed (merge_upsert_chain's
    # re-insert-after-delete leg, for the index)
    x = raw.where(del_pred).agg(F.min("vec_id")).first()[0]
    append_ann_index(spark, path, raw.where(F.col("vec_id") == x), "reinsert-x")
    live_x = (
        _live_codes(spark, path, spark.read.parquet(codes_root(path)))
        .where(F.col("vec_id") == x)
        .count()
    )
    if live_x != 1:
        raise AssertionError(
            f"re-inserted vector serves {live_x} rows, expected exactly 1"
        )
    n_live_final = n - n_del + 1
    comp = compact_ann_index(spark, path)
    if comp["rows"] != n_live_final:
        raise AssertionError(
            f"compaction kept {comp['rows']} rows, expected {n_live_final}"
        )
    if _tombstone_dirs(path):
        raise AssertionError("tombstone tree survived compaction")
    if append_ann_index(spark, path, delta, "delta-bucket-0") != 0:
        raise AssertionError("replayed feed re-applied after compaction")
    if append_ann_index(
        spark, path, raw.where(F.col("vec_id") == x), "reinsert-x"
    ) != 0:
        raise AssertionError("replayed re-insert re-applied after compaction")
    if delete_ann_index(spark, path, raw.where(del_pred), DEL_TAG) != 0:
        raise AssertionError("replayed delete re-applied after compaction")
    if n <= _PQ_GATE_MAX_N:
        qids, qmat, qnrm = _query_rows(spark, sf_dir)
        res = _exact_rerank(
            spark,
            _norms(spark, sf_dir),
            search_ann_index(spark, path, qids, qmat, qnrm),
            qids,
            qmat,
            qnrm,
        ).localCheckpoint(eager=False)
        tombstoned = (F.col("neighbor_id") % DEL_MOD == DEL_RESIDUE) & (
            F.col("neighbor_id") != x
        )
        if res.where(tombstoned).count():
            raise AssertionError("serving returned a tombstoned neighbor")
        exact_surv = (
            q_knn_cosine_topk(spark, sf_dir)
            .where(~tombstoned)
            .select("query_id", "neighbor_id")
        )
        n_exact = exact_surv.count()
        hit = exact_surv.join(
            res.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        ).count()
        floor = RECALL_FLOORS["knn_cosine_served"]
        if n_exact == 0 or hit / n_exact < floor:
            raise AssertionError(
                f"incremental-index recall collapsed: {hit}/{n_exact}"
            )
    return spark.createDataFrame(
        [
            (
                int(n - n_applied),
                int(n_applied),
                int(n_del),
                int(n_live_final),
                int(meta["m"]),
                int(comp["files_after"]),
            )
        ],
        "n_base long, n_delta long, n_deleted long, n_live long, "
        "pq_m long, n_files_compacted long",
    )


# above this estimated raw-source size the migration skips the eager
# localCheckpoint of the training source: the checkpoint stores O(N·d)
# vector bytes in block-manager storage (≈30 GB at 10M×768 — more than
# the on-box scratch the batch-by-batch re-encode is designed to bound)
# while skipping it merely re-runs two cheap columnar sampling scans
_MIGRATE_CKPT_MAX_BYTES = 2 << 30


def migrate_ann_index(
    spark, path: str, emb_source=None, add_meta: dict | None = None
) -> dict:
    """Quantizer RETRAIN + re-encode migration with zero-downtime
    cutover (r12 verdict #5) — the remedy the drift drill
    (tools/ann_drift_run.py) prescribes when appended batches have
    drifted past what frozen quantizers can serve: rebuild the
    quantizers on the CURRENT live distribution and re-encode, while
    the old generation keeps serving until one atomic pointer flip.

    Shape: retrain coarse centroids + PQ codebooks on the live rows
    (same deterministic md5-ordered sampling as the build), then
    re-encode BATCH-BY-BATCH — each old batch directory is one bounded
    re-encode job landing as ``batch=mig-<orig>`` in the next
    generation's tree (the ann_sharded_build shape: scratch ∝ one
    batch, never the corpus).  Pending tombstones fold away during the
    re-encode (only live rows migrate).  The new quantizers land as
    GENERATION-SCOPED model tables (``centroids.g<G+1>.parquet``, …)
    and meta's ``model_gen`` starts resolving them at the same single
    ``os.replace`` that bumps the generation — a serve that loaded its
    model snapshot before the flip reads old quantizers + old codes end
    to end; one that loads after reads new + new.  No intermediate
    state exists (crash before the flip leaves orphan gen-scoped
    files/trees, reaped age-gated).

    ``emb_source`` (vec_id, embedding) is required for non-raw layouts
    (codes alone cannot be re-encoded); raw layouts migrate self-
    contained from their own raw column.  Ledgers carry forward so
    replayed feeds stay no-ops.  Returns the migration summary.

    ``add_meta`` ({column: SQL expr over the per-batch source rows})
    BACKFILLS filterable metadata columns into the codes layout during
    the re-encode — schema evolution for predicate-pushdown filtered
    serving on an index built before ``meta_cols`` existed, done at the
    only moment the whole corpus streams anyway.  The layout's
    selectivity hash-sample is rebuilt from the NEW generation whenever
    metadata columns are present (also clearing deleted rows the
    per-batch samples accumulated)."""
    import time
    import uuid

    from .events import (
        _LAYOUT_HARD_CAP_SEC,
        _flock_layout_lock,
        _release_layout_lock,
    )

    fd = _flock_layout_lock(f"{path}.lock", time.time() + _LAYOUT_HARD_CAP_SEC)
    try:
        _reap_layout_scratch(path)
        meta = _read_meta(path)
        gen = _gen_of(meta)
        old_root = _codes_root_gen(path, gen)
        is_raw = bool(meta.get("raw"))
        if not is_raw and emb_source is None:
            raise ValueError(
                "non-raw layout needs emb_source (vec_id, embedding) to migrate"
            )
        mcols = tuple(meta.get("meta_cols", []))
        add_meta = dict(add_meta or {})
        mcols_all = mcols + tuple(k for k in add_meta if k not in mcols)
        # live rows for retraining, as (vec_id, embedding)
        codes_all = spark.read.parquet(old_root)
        live_all = _live_codes(spark, path, codes_all, meta)
        if is_raw:
            source = live_all.select(
                "vec_id", F.col("emb").alias("embedding")
            )
        else:
            live_ids = live_all.select("vec_id")
            source = (
                emb_source.select("vec_id", "embedding")
                .join(live_ids, "vec_id", "left_semi")
            )
        # the eager checkpoint trades two sampling re-scans for O(N·d)
        # block-manager bytes — a win at gate/1M scale, a disk-filler at
        # 10M×768 (see _MIGRATE_CKPT_MAX_BYTES)
        d_est = int(meta.get("m", 1)) * int(meta.get("dsub", 1))
        if int(meta.get("n", 0)) * d_est * 4 <= _MIGRATE_CKPT_MAX_BYTES:
            source = source.localCheckpoint(eager=True)
        n_live = source.count()
        nlist = cost_balanced_nlist(n_live, IVFPQ_QUERY_PROBE)
        cent_mat = train_centroids(source, nlist)
        sup_ch = (
            build_two_level(cent_mat) if len(cent_mat) >= TWO_LEVEL_MIN else None
        )
        books = _pq_train_codebooks(spark, None, emb=source)
        m_, ksub, dsub = books.shape
        # batch-by-batch re-encode into the next generation's tree
        batch_dirs = sorted(
            n for n in os.listdir(old_root) if n.startswith("batch=")
        )
        tmp = os.path.join(path, f".compact-tmp-{uuid.uuid4().hex}")
        os.makedirs(tmp, exist_ok=True)
        n_written = 0
        bcs = []
        for b in batch_dirs:
            tag = b.split("=", 1)[1]
            bcodes = (
                spark.read.option("basePath", old_root)
                .parquet(os.path.join(old_root, b))
            )
            blive = _live_codes(spark, path, bcodes, meta)
            if is_raw:
                bsrc = blive.select(
                    "vec_id",
                    F.col("emb").cast("array<double>").alias("emb"),
                    *mcols,
                )
            else:
                # inner join (not semi) so the codes tree's resident
                # metadata columns migrate with the re-encoded rows
                bsrc = (
                    emb_source.select(
                        "vec_id",
                        F.col("embedding").cast("array<double>").alias("emb"),
                    )
                    .join(blive.select("vec_id", *mcols), "vec_id")
                )
            for name, sql in add_meta.items():
                bsrc = bsrc.withColumn(name, F.expr(sql))  # the backfill
            encoded, bc = _encode_codes(
                spark, bsrc, cent_mat, sup_ch, books, with_raw=is_raw,
                meta_cols=mcols_all,
            )
            bcs.append(bc)
            out = os.path.join(tmp, f"batch=mig-{_safe_tag(tag)}")
            (
                encoded.repartition("cell")
                .sortWithinPartitions("vec_id")
                .write.mode("overwrite")
                .partitionBy("cell")
                .parquet(out)
            )
            if _has_parquet_files(out):
                n_written += spark.read.parquet(out).count()
            else:
                # a fully-tombstoned source batch re-encodes to ZERO
                # rows; drop its _SUCCESS-only dir so the new generation
                # never carries a schema-less directory (advice r13 #1)
                import shutil as _sh

                _sh.rmtree(out, ignore_errors=True)
        if n_written != n_live:
            raise AssertionError(
                f"migration re-encoded {n_written} rows, live set is {n_live}"
            )
        # new model tables at their FINAL gen-scoped names (crash here →
        # orphans with gen+1 > pointer, reaped age-gated)
        spark.createDataFrame(
            [(i, [float(v) for v in c]) for i, c in enumerate(cent_mat)],
            "cell long, c_emb array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, f"centroids.g{gen + 1}.parquet")
        )
        spark.createDataFrame(
            [
                (m, c, [float(v) for v in books[m, c]])
                for m in range(m_)
                for c in range(ksub)
            ],
            "m long, code long, vec array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, f"codebooks.g{gen + 1}.parquet")
        )
        import shutil

        new_root = _codes_root_gen(path, gen + 1)
        if os.path.isdir(new_root):
            shutil.rmtree(new_root)
        os.rename(tmp, new_root)
        # rebuild the selectivity sample from the NEW generation —
        # backfilled columns enter it, deleted rows leave it
        _rebuild_selectivity_sample(
            spark, path, new_root, mcols_all, int(n_live)
        )
        dir_tags = [
            b.split("=", 1)[1]
            for b in batch_dirs
            if b != "batch=base" and not b.startswith("batch=fold-g")
        ]
        del_tags = [
            os.path.basename(d).split("=", 1)[1]
            for d in _tombstone_dirs(path, gen)
        ]
        meta = _read_meta(path)
        prev_model_gen = meta.get("model_gen")
        meta["generation"] = gen + 1
        meta["model_gen"] = gen + 1
        meta["nlist"] = int(len(cent_mat))
        meta["m"], meta["ksub"], meta["dsub"] = int(m_), int(ksub), int(dsub)
        meta["n"] = int(n_live)
        meta["meta_cols"] = list(mcols_all)
        meta["batches"] = list(
            dict.fromkeys(meta.get("batches", []) + dir_tags)
        )
        meta["deletes"] = list(
            dict.fromkeys(meta.get("deletes", []) + del_tags)
        )
        meta["delete_cover"] = {}
        # utime-stamp EVERY superseded artifact at the cutover — codes
        # tree, tombstone tree, AND the outgoing gen-scoped model tables
        # (advice r13 #3: after a second migration the previous
        # centroids.g<N>/codebooks.g<N> kept months-old mtimes and the
        # reaper collected them with no grace window, breaking the
        # old-snapshot-reader guarantee)
        dead_paths = [old_root, _tomb_root_gen(path, gen)]
        if prev_model_gen is not None:
            dead_paths += [
                os.path.join(path, f"centroids.g{prev_model_gen}.parquet"),
                os.path.join(path, f"codebooks.g{prev_model_gen}.parquet"),
            ]
        for dead in dead_paths:
            if os.path.isdir(dead):
                os.utime(dead, None)
        tmp_meta = os.path.join(path, ".meta.json.tmp")
        with open(tmp_meta, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp_meta, os.path.join(path, "meta.json"))  # THE cutover
        for bc in bcs:
            bc.destroy(blocking=False)
        return {
            "rows": int(n_live),
            "nlist": int(len(cent_mat)),
            "pq_m": int(m_),
            "batches_migrated": len(batch_dirs),
            "generation": gen + 1,
        }
    finally:
        _release_layout_lock(fd)


# the migration drill deletes every 19th vector (residue 6) before
# retraining — the migration must fold the tombstones as it re-encodes
MDEL_MOD, MDEL_RESIDUE, MDEL_TAG = 19, 6, "takedown-19-6"


def q_ann_index_migrate(spark, sf_dir):
    """Rows-only, SELF-VERIFYING: the quantizer-migration round trip.
    A store_raw layout (self-contained migration source) takes an
    append + a delete, then ``migrate_ann_index`` retrains + re-encodes
    batch-by-batch with the atomic model/codes cutover.  RAISES unless:
    (a) the migrated layout holds EXACTLY the live rows (deletes folded,
    each id once, codes sized to the NEW subspace count), (b) meta's
    model pointer resolves the gen-scoped quantizers and the old
    generation's tree/model files still exist right after the flip (the
    zero-downtime evidence: a pre-flip reader's whole snapshot remains
    readable until the age-gated reap), (c) replayed append/delete
    feeds stay no-ops across the migration, and (d) at verification
    scale the MIGRATED index serves the shared recall floor vs the
    exact top-k over survivors.  Idempotence-aware: a rerun against the
    already-migrated layout skips the re-migration and re-asserts the
    steady state.  Returns one scalar row."""
    raw = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bucket = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % INCR_DELTA_BUCKETS
    )
    base, delta = raw.where(bucket != 0), raw.where(bucket == 0)
    del_pred = F.col("vec_id") % MDEL_MOD == MDEL_RESIDUE
    path = ann_index_path(sf_dir) + "-mig"
    build_ann_index(spark, sf_dir, path=path, emb_raw=base, store_raw=True)
    append_ann_index(spark, path, delta, "mig-delta")
    delete_ann_index(spark, path, raw.where(del_pred), MDEL_TAG)
    n = corpus_rows(spark, sf_dir)
    n_del = raw.where(del_pred).count()
    n_live = n - n_del
    meta = _read_meta(path)
    if meta.get("model_gen") is None:
        old_gen = _gen_of(meta)
        res = migrate_ann_index(spark, path)
        if res["rows"] != n_live:
            raise AssertionError(f"migration kept {res['rows']}/{n_live} rows")
        # zero-downtime evidence: the pre-flip snapshot is still whole
        if not os.path.isdir(_codes_root_gen(path, old_gen)):
            raise AssertionError("old codes tree vanished at the flip")
        if not os.path.isdir(os.path.join(path, "centroids.parquet")):
            raise AssertionError("old model table vanished at the flip")
    meta, cent_mat, books = load_ann_model(spark, path)
    if meta.get("model_gen") != _gen_of(meta):
        raise AssertionError(
            f"model_gen {meta.get('model_gen')} != generation {_gen_of(meta)}"
        )
    for name in ("centroids", "codebooks"):
        if not os.path.isdir(
            os.path.join(path, f"{name}.g{_gen_of(meta)}.parquet")
        ):
            raise AssertionError(f"gen-scoped {name} table missing")
    if len(cent_mat) != meta["nlist"] or books.shape[0] != meta["m"]:
        raise AssertionError("migrated model tables disagree with meta")
    codes = spark.read.parquet(codes_root(path))
    stats = codes.agg(
        F.count("*").alias("n_codes"),
        F.countDistinct("vec_id").alias("n_ids"),
        F.min(F.length("code")).alias("min_len"),
        F.max(F.length("code")).alias("max_len"),
        F.max("cell").alias("max_cell"),
    ).first()
    if stats.n_codes != n_live or stats.n_ids != n_live:
        raise AssertionError(
            f"migrated layout holds {stats.n_codes}/{stats.n_ids}, "
            f"expected {n_live}"
        )
    if stats.min_len != meta["m"] or stats.max_len != meta["m"]:
        raise AssertionError("migrated codes not sized to the new m")
    if stats.max_cell >= len(cent_mat):
        raise AssertionError("migrated codes reference a dead centroid")
    if _tombstone_dirs(path):
        raise AssertionError("tombstones survived the migration")
    if append_ann_index(spark, path, delta, "mig-delta") != 0:
        raise AssertionError("replayed feed re-applied after migration")
    if delete_ann_index(spark, path, raw.where(del_pred), MDEL_TAG) != 0:
        raise AssertionError("replayed delete re-applied after migration")
    if n <= _PQ_GATE_MAX_N:
        qids, qmat, qnrm = _query_rows(spark, sf_dir)
        res_df = _exact_rerank(
            spark,
            _norms(spark, sf_dir),
            search_ann_index(spark, path, qids, qmat, qnrm),
            qids, qmat, qnrm,
        ).localCheckpoint(eager=False)
        gone = F.col("neighbor_id") % MDEL_MOD == MDEL_RESIDUE
        if res_df.where(gone).count():
            raise AssertionError("migrated index served a deleted neighbor")
        exact_surv = (
            q_knn_cosine_topk(spark, sf_dir)
            .where(~gone)
            .select("query_id", "neighbor_id")
        )
        n_exact = exact_surv.count()
        hit = exact_surv.join(
            res_df.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        ).count()
        floor = RECALL_FLOORS["knn_cosine_served"]
        if n_exact == 0 or hit / n_exact < floor:
            raise AssertionError(
                f"migrated-index recall collapsed: {hit}/{n_exact}"
            )
    return spark.createDataFrame(
        [(int(n), int(n_del), int(n_live), int(meta["m"]), int(meta["nlist"]))],
        "n_corpus long, n_deleted long, n_live long, pq_m long, nlist long",
    )


# the filtered-lifecycle drill deletes every 13th vector (residue 4) —
# a slice disjoint from the other drills' tags so the layouts can't
# mask each other's state
FDEL_MOD, FDEL_RESIDUE, FDEL_TAG = 13, 4, "takedown-13-4"


def _filtered_lifecycle_drill(spark, sf_dir):
    """Round-13's serving features COMPOSED (r13 verdict "missing" #1):
    filtered ANN serving driven against a layout with PENDING
    TOMBSTONES, across a budgeted partial fold, and after a quantizer
    migration — every stage on the filter_expr path (metadata columns
    resident in the codes layout, predicate pushed into the scan) with
    the selectivity sourced from the persisted hash-sample, never an
    exact count (r13 verdict "missing" #2/#3).

    Raises — turning the knn_cosine_filtered driver row red — if any
    lifecycle stage serves a deleted neighbor, serves a non-qualifying
    neighbor, or drops filtered recall under the shared serving floor
    vs the exact filtered top-k restricted to survivors.  Idempotent
    against the persisted drill layout: build short-circuits, the
    delete tag no-ops on replay, a re-run migration is one more
    (correct) generation."""
    from .vector import FILTER_LABEL_MOD, RECALL_FLOORS, TOP_K

    raw = table(spark, sf_dir, "embeddings")  # vec_id, embedding, label
    expr = f"label % {FILTER_LABEL_MOD} = 0"
    path = ann_index_path(sf_dir) + "-fserve"
    build_ann_index(
        spark, sf_dir, path=path, emb_raw=raw, store_raw=True,
        meta_cols=("label",),
    )
    qids, qmat, qnrm = _query_rows(spark, sf_dir)
    rows = raw.select("vec_id", "embedding", "label").collect()  # gate scale
    ids = np.array([r.vec_id for r in rows], dtype="i8")
    X = np.array([list(r.embedding) for r in rows], dtype="f8")
    lab = np.array([r.label for r in rows], dtype="i8")
    qual = lab % FILTER_LABEL_MOD == 0
    nrm_x = np.sqrt((X * X).sum(axis=1))
    # the sample-based estimate must price the predicate inside the
    # ±2x band the planner is pinned stable under — and the serve path
    # below never computes an exact qualifying count
    est = estimate_selectivity(spark, path, expr)
    true_sel = float(qual.mean())
    if est is None or not (0.5 * true_sel <= est <= 2.0 * true_sel):
        raise AssertionError(
            f"selectivity estimate {est} outside ±2x of {true_sel:.3f}"
        )
    floor = RECALL_FLOORS["knn_cosine_served"]
    dead0 = np.zeros(len(ids), dtype=bool)

    def check(stage, alive, modes):
        keep = np.flatnonzero(qual & alive)
        ex_pairs = set()
        for qi in range(len(qids)):
            cos = (X @ qmat[qi]) / (nrm_x * qnrm[qi] + 1e-300)
            order = sorted(keep, key=lambda j: (-cos[j], ids[j]))
            ex_pairs |= {
                (int(qids[qi]), int(ids[j])) for j in order[:TOP_K]
            }
        dead = set(ids[~alive].tolist())
        nonq = set(ids[~qual].tolist())
        for mode in modes:
            res, _used = serve_topk_filtered(
                spark, path, qids, qmat, qnrm, filter_expr=expr, mode=mode
            )
            got = [
                (r.query_id, r.neighbor_id)
                for r in res.select("query_id", "neighbor_id").collect()
            ]
            for q, nb in got:
                if nb in dead:
                    raise AssertionError(
                        f"filtered serve [{stage}/{mode}] returned the "
                        f"DELETED neighbor {nb}"
                    )
                if nb in nonq:
                    raise AssertionError(
                        f"filtered serve [{stage}/{mode}] returned the "
                        f"non-qualifying neighbor {nb}"
                    )
            hit = sum(1 for p in got if p in ex_pairs)
            if not ex_pairs or hit / len(ex_pairs) < floor:
                raise AssertionError(
                    f"filtered serve [{stage}/{mode}] recall collapsed: "
                    f"{hit}/{len(ex_pairs)} vs floor {floor}"
                )

    check("fresh", ~dead0, ("pre", "post"))
    # replay detection: once the final append re-inserted the deleted
    # slice (sequenced AFTER the delete), those rows serve again and the
    # delete below no-ops — the expected alive set is the full corpus
    replayed = "reins-f" in _read_meta(path).get("batches", [])
    delete_ann_index(
        spark, path,
        raw.where(F.col("vec_id") % FDEL_MOD == FDEL_RESIDUE), FDEL_TAG,
    )
    alive = (
        ~dead0 if replayed else (ids % FDEL_MOD != FDEL_RESIDUE)
    )
    check("tombstones-pending", alive, ("pre", "post"))
    stats = ann_cell_stats(spark, path)
    gbytes = sum(s["bytes"] for s in stats.values() if s["dead"] > 0)
    compact_ann_index_incremental(spark, path, max(1, gbytes // 3))
    check("post-fold", alive, ("auto",))
    migrate_ann_index(spark, path)
    check("post-migration", alive, ("pre", "post"))
    # ingest leg: re-insert the deleted slice as a frozen-quantizer
    # append AFTER the migration (idempotent by tag) — the appended
    # batch carries its metadata columns and its sample slice, so
    # filtered serving must see the re-added qualifying vectors again
    append_ann_index(
        spark, path,
        raw.where(F.col("vec_id") % FDEL_MOD == FDEL_RESIDUE), "reins-f",
    )
    check("post-append", ~dead0, ("pre", "post"))


def _compound_filter_drill(spark, sf_dir):
    """COMPOUND-predicate filtered serving (r14 verdict "next" #5):
    every prior drill/pin used a single equality over one metadata
    column; real filters are conjunctions over several — tenant
    equality AND a date band.  This leg builds a layout with TWO
    metadata columns (``label`` the tenant stand-in, ``day`` =
    pmod(vec_id, 7) the date stand-in) and proves, at gate scale, the
    three properties the planner rests on for compound predicates:

    * ESTIMATOR: the persisted hash-sample prices the conjunction
      (and the disjunction) within the ±2× band — the sample holds
      whole rows, so cross-column correlation is captured, not
      assumed independent;
    * MODE RULE: the low-selectivity conjunction resolves to
      pre-filter, the high-selectivity disjunction to post-filter;
    * SERVE: both modes return ONLY compound-qualifying neighbors and
      clear the shared recall floor vs the exact compound answer.

    Raises on any breach — this runs inside q_knn_cosine_filtered's
    gate, so the driver row goes red."""
    from .vector import RECALL_FLOORS, TOP_K

    raw = table(spark, sf_dir, "embeddings").withColumn(
        "day", F.pmod(F.col("vec_id"), F.lit(7))
    )
    path = ann_index_path(sf_dir) + "-fcomp"
    build_ann_index(
        spark, sf_dir, path=path, emb_raw=raw, store_raw=True,
        meta_cols=("label", "day"),
    )
    lo_expr = "label % 4 = 0 AND day < 3"
    hi_expr = "label % 4 != 0 OR day < 3"
    rows = raw.select("vec_id", "embedding", "label", "day").collect()
    ids = np.array([r.vec_id for r in rows], dtype="i8")
    X = np.array([list(r.embedding) for r in rows], dtype="f8")
    lab = np.array([r.label for r in rows], dtype="i8")
    day = np.array([r.day for r in rows], dtype="i8")
    qual_lo = (lab % 4 == 0) & (day < 3)
    qual_hi = (lab % 4 != 0) | (day < 3)
    nrm_x = np.sqrt((X * X).sum(axis=1))
    qids, qmat, qnrm = _query_rows(spark, sf_dir)
    for expr, qual, want_mode in (
        (lo_expr, qual_lo, "pre"),
        (hi_expr, qual_hi, "post"),
    ):
        true_sel = float(qual.mean())
        est = estimate_selectivity(spark, path, expr)
        if est is None or not (0.5 * true_sel <= est <= 2.0 * true_sel):
            raise AssertionError(
                f"compound selectivity estimate {est} outside ±2x of "
                f"{true_sel:.3f} for {expr!r}"
            )
        if choose_filter_mode(est) != want_mode:
            raise AssertionError(
                f"mode rule unstable on compound predicate {expr!r}: "
                f"est {est:.3f} chose {choose_filter_mode(est)!r}, "
                f"wanted {want_mode!r}"
            )
        ex_pairs = set()
        keep = np.flatnonzero(qual)
        for qi in range(len(qids)):
            cos = (X @ qmat[qi]) / (nrm_x * qnrm[qi] + 1e-300)
            order = sorted(keep, key=lambda j: (-cos[j], ids[j]))
            ex_pairs |= {(int(qids[qi]), int(ids[j])) for j in order[:TOP_K]}
        nonq = set(ids[~qual].tolist())
        res, used = serve_topk_filtered(
            spark, path, qids, qmat, qnrm, filter_expr=expr, mode="auto"
        )
        if used != want_mode:
            raise AssertionError(
                f"auto resolved to {used!r} on {expr!r}, wanted {want_mode!r}"
            )
        got = [
            (r.query_id, r.neighbor_id)
            for r in res.select("query_id", "neighbor_id").collect()
        ]
        bad = [p for p in got if p[1] in nonq]
        if bad:
            raise AssertionError(
                f"compound filtered serve returned non-qualifying "
                f"neighbors for {expr!r}: {bad[:3]}"
            )
        floor = RECALL_FLOORS["knn_cosine_served"]
        hit = sum(1 for p in got if p in ex_pairs)
        if not ex_pairs or hit / len(ex_pairs) < floor:
            raise AssertionError(
                f"compound filtered recall collapsed on {expr!r}: "
                f"{hit}/{len(ex_pairs)} vs floor {floor}"
            )


def q_knn_cosine_filtered(spark, sf_dir):
    """HASHED: exact filtered top-k — cosine top-5 for the 10 fixed
    queries among neighbors satisfying the metadata predicate
    (label % FILTER_LABEL_MOD == 0); filter → rank, so the DuckDB
    oracle mirrors it exactly (vector.O_KNN_FILTERED).

    In-query SELF-VERIFYING gate at verification scale: the SERVED
    filtered path — pre-filter (scan-side semi-join below the shortlist
    truncation, probes widened by 1/selectivity), post-filter
    (overfetch margin·k/selectivity then re-rank), AND the coded auto
    rule — must return ONLY qualifying neighbors and clear the shared
    recall floor vs this exact answer; the rule must resolve to the
    pre-filter at this below-crossover selectivity.  A filtered serve
    returning a non-qualifying neighbor or collapsed recall turns the
    driver row red."""
    from .vector import FILTER_LABEL_MOD, exact_knn_cosine_filtered

    exact = exact_knn_cosine_filtered(spark, sf_dir)
    if corpus_rows(spark, sf_dir) <= _PQ_GATE_MAX_N:
        # gate-internal snapshot only — the RETURNED frame keeps its
        # declarative plan (EXPLAINS.md shows the scan-side filter)
        exact_ck = exact.localCheckpoint(eager=False)
        path = build_ann_index(spark, sf_dir)
        qids, qmat, qnrm = _query_rows(spark, sf_dir)
        fids = (
            _emb(spark, sf_dir)
            .where(F.col("label") % FILTER_LABEL_MOD == 0)
            .select("vec_id")
        )
        qualifying = {r.vec_id for r in fids.collect()}  # gate scale only
        sel = len(qualifying) / max(1, corpus_rows(spark, sf_dir))
        if choose_filter_mode(sel) != "pre":
            raise AssertionError(
                f"auto rule chose post-filter at selectivity {sel:.2f} — "
                "below the crossover the pre-filter must win"
            )
        ex_pairs = {
            (r.query_id, r.neighbor_id)
            for r in exact_ck.select("query_id", "neighbor_id").collect()
        }
        norms = _norms(spark, sf_dir)
        floor = RECALL_FLOORS["knn_cosine_served"]
        for mode in ("auto", "pre", "post"):
            res, used = serve_topk_filtered(
                spark, path, qids, qmat, qnrm, fids, mode=mode,
                norms_df=norms,
            )
            if mode == "auto" and used != "pre":
                raise AssertionError(f"auto resolved to {used!r}")
            rows = res.select("query_id", "neighbor_id").collect()
            bad = [r for r in rows if r.neighbor_id not in qualifying]
            if bad:
                raise AssertionError(
                    f"filtered serve ({mode}) returned non-qualifying "
                    f"neighbors: {bad[:3]}"
                )
            hit = sum(
                1 for r in rows if (r.query_id, r.neighbor_id) in ex_pairs
            )
            if not ex_pairs or hit / len(ex_pairs) < floor:
                raise AssertionError(
                    f"filtered serve ({mode}) recall collapsed: "
                    f"{hit}/{len(ex_pairs)} vs floor {floor}"
                )
        # the r14 composition legs: filtered serving × tombstones ×
        # partial fold × migration, on the filter_expr/pushdown path
        _filtered_lifecycle_drill(spark, sf_dir)
        # the r15 compound-predicate legs: two meta_cols, conjunction +
        # disjunction — estimator, mode rule, recall (r14 "next" #5)
        _compound_filter_drill(spark, sf_dir)
    return exact


# the partial-fold drill deletes every 11th vector (residue 5) —
# deliberately a DIFFERENT slice/tag than the full-fold drill so the
# two gates cannot mask each other's layouts
PDEL_MOD, PDEL_RESIDUE, PDEL_TAG = 11, 5, "takedown-11-5"


def q_ann_index_partial_compact(spark, sf_dir):
    """Rows-only, SELF-VERIFYING: the BUDGETED partial-fold round trip
    (r12 verdict #1 — the whole-tree fold was the round's one `weak`).
    Base/delta split as the incremental gate, delete a slice, re-insert
    one deleted vector, then compact in two stages:

      stage 1: an EXPLICIT single-cell partial fold — asserts the
        mid-state a budgeted loop lives in: generation bumped, pending
        tombstones carried verbatim, the folded cell's garbage gone,
        serving still suppresses every tombstoned vector and serves the
        re-inserted one (the sequenced-cover invariant ACROSS a fold
        boundary — the new fold batch must never be re-suppressed by a
        stale cover);
      stage 2: ``compact_ann_index_incremental`` with a budget sized to
        force MULTIPLE rounds — asserts the loop converges: tombstone
        tree gone, cover map empty, surviving rows preserved exactly
        (n − deleted + 1 re-insert), every replayed feed a no-op, and
        at verification scale the served top-k clears the shared recall
        floor vs the exact answer restricted to survivors.

    Idempotence-aware like the incremental gate: on a rerun against the
    same persisted layout every mutation no-ops, stats report zero
    garbage, stage 1 skips its mid-state leg, and the final-state
    assertions carry the proof.  Returns one scalar row."""
    raw = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bucket = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % INCR_DELTA_BUCKETS
    )
    base, delta = raw.where(bucket != 0), raw.where(bucket == 0)
    del_pred = F.col("vec_id") % PDEL_MOD == PDEL_RESIDUE
    path = ann_index_path(sf_dir) + "-pfold"
    build_ann_index(spark, sf_dir, path=path, emb_raw=base)
    append_ann_index(spark, path, delta, "delta-bucket-0")
    delete_ann_index(spark, path, raw.where(del_pred), PDEL_TAG)
    x = raw.where(del_pred).agg(F.min("vec_id")).first()[0]
    append_ann_index(spark, path, raw.where(F.col("vec_id") == x), "reinsert-px")
    n = corpus_rows(spark, sf_dir)
    n_del = raw.where(del_pred).count()
    n_live_final = n - n_del + 1

    meta = _read_meta(path)
    stats = ann_cell_stats(spark, path, meta)
    garbage = sorted(c for c, s in stats.items() if s["dead"] > 0)
    if len(garbage) >= 2:
        # --- stage 1: explicit single-cell fold, mid-state asserted ---
        gen_before = _gen_of(meta)
        r1 = compact_ann_index(spark, path, cells=[garbage[0]])
        if r1["cells_folded"] != 1 or r1["garbage_cleared"]:
            raise AssertionError(f"stage-1 fold was not partial: {r1}")
        meta = _read_meta(path)
        if _gen_of(meta) != gen_before + 1:
            raise AssertionError("partial fold did not bump the generation")
        if not _tombstone_dirs(path):
            raise AssertionError("partial fold dropped pending tombstones")
        mid = ann_cell_stats(spark, path, meta)
        if mid[garbage[0]]["dead"] != 0 or mid[garbage[0]]["files"] != 1:
            raise AssertionError(
                f"folded cell still dirty: {mid[garbage[0]]}"
            )
        if sum(s["dead"] for s in mid.values()) != sum(
            s["dead"] for s in stats.values()
        ) - stats[garbage[0]]["dead"]:
            raise AssertionError("partial fold changed other cells' garbage")
        live_mid = _live_codes(
            spark, path, spark.read.parquet(codes_root(path)), meta
        )
        if live_mid.where(F.col("vec_id") == x).count() != 1:
            raise AssertionError(
                "re-inserted vector lost across the partial fold"
            )
        if (
            live_mid.where(del_pred & (F.col("vec_id") != x)).count() != 0
        ):
            raise AssertionError(
                "tombstoned vector served between partial folds"
            )
    # --- stage 2: the budgeted loop to a clean layout ------------------
    remaining = ann_cell_stats(spark, path)
    garbage_left = [s for s in remaining.values() if s["dead"] > 0]
    # a third of the remaining garbage bytes per round → the loop takes
    # multiple budget-bounded rounds to converge (asserted below when
    # enough garbage cells exist for the bound to be deterministic)
    budget = max(1, sum(s["bytes"] for s in garbage_left) // 3)
    agg = compact_ann_index_incremental(spark, path, budget)
    if len(garbage_left) >= 6 and agg["rounds"] < 2:
        raise AssertionError(
            f"budgeted loop converged in {agg['rounds']} round(s) — "
            "the budget did not bound the fold"
        )
    if _tombstone_dirs(path):
        raise AssertionError("tombstone tree survived the budgeted loop")
    meta = _read_meta(path)
    if meta.get("delete_cover"):
        raise AssertionError("cover map survived the budgeted loop")
    n_codes = spark.read.parquet(codes_root(path)).count()
    if n_codes != n_live_final or meta["n"] != n_live_final:
        raise AssertionError(
            f"budgeted loop kept {n_codes}/{meta['n']} rows, "
            f"expected {n_live_final}"
        )
    if append_ann_index(spark, path, delta, "delta-bucket-0") != 0:
        raise AssertionError("replayed feed re-applied after partial folds")
    if append_ann_index(
        spark, path, raw.where(F.col("vec_id") == x), "reinsert-px"
    ) != 0:
        raise AssertionError("replayed re-insert re-applied")
    if delete_ann_index(spark, path, raw.where(del_pred), PDEL_TAG) != 0:
        raise AssertionError("replayed delete re-applied")
    if n <= _PQ_GATE_MAX_N:
        qids, qmat, qnrm = _query_rows(spark, sf_dir)
        res = _exact_rerank(
            spark,
            _norms(spark, sf_dir),
            search_ann_index(spark, path, qids, qmat, qnrm),
            qids, qmat, qnrm,
        ).localCheckpoint(eager=False)
        tombstoned = (F.col("neighbor_id") % PDEL_MOD == PDEL_RESIDUE) & (
            F.col("neighbor_id") != x
        )
        if res.where(tombstoned).count():
            raise AssertionError("serving returned a tombstoned neighbor")
        exact_surv = (
            q_knn_cosine_topk(spark, sf_dir)
            .where(~tombstoned)
            .select("query_id", "neighbor_id")
        )
        n_exact = exact_surv.count()
        hit = exact_surv.join(
            res.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        ).count()
        floor = RECALL_FLOORS["knn_cosine_served"]
        if n_exact == 0 or hit / n_exact < floor:
            raise AssertionError(
                f"partial-fold recall collapsed: {hit}/{n_exact}"
            )
    return spark.createDataFrame(
        [(int(n), int(n_del), int(n_live_final), int(meta["m"]))],
        "n_corpus long, n_deleted long, n_live long, pq_m long",
    )


STREAM_INGEST_FILES = 5  # feed files → micro-batches: add,add,DEL,add,add

# the streaming CDC drill deletes every 13th vector (residue 4) mid-feed
SDEL_MOD, SDEL_RESIDUE = 13, 4


def q_ann_index_stream_ingest(spark, sf_dir):
    """Rows-only, SELF-VERIFYING: the streaming ANN ingest twin (r11
    verdict "What's missing" #3) WITH the streaming DELETE leg (r12
    verdict #4) — the production crawl is a CDC stream of embedding
    batches AND takedowns folding into the served index.  The corpus
    splits into the standard 90% base / 10% delta (md5 bucket); the
    base index is built twice from identical deterministic training
    (batch twin + stream twin), then the SAME op sequence reaches each
    twin differently:

      op sequence: add delta-parts 0,1 → DELETE the vec_id %
                   {SDEL_MOD} == {SDEL_RESIDUE} slice → add delta-parts
                   2,3 plus ONE previously-deleted base vector (the
                   re-insert-after-delete leg crossing a streamed
                   delete)
      batch twin : three batch API calls (append, delete, append)
      stream twin: five drop files with ascending mtimes (the
                   chronological-admission lesson of r10), each row
                   tagged op=add|del, admitted by a real Structured
                   Streaming file source (availableNow,
                   maxFilesPerTrigger=1 → one micro-batch per file),
                   folded via ``foreachBatch`` → ``append_ann_index``
                   / ``delete_ann_index`` under batch-id tags — replays
                   (checkpoint recovery, gate reruns) are no-ops on
                   BOTH legs, i.e. exactly-once by idempotence with
                   deletes sequenced by the same cover device the
                   churn drill crash-proves.

    The gate RAISES unless (a) the stream twin folded ≥2 add
    micro-batches AND ≥1 delete micro-batch, (b) live code sets agree
    and the served top-k of the two twins is IDENTICAL as a multiset
    (exceptAll both directions — frozen quantizers + sequenced covers
    make the fold order-invariant), (c) no streamed-deleted vector is
    served while the streamed re-insert IS live (exactly once), and
    (d) at verification scale the served top-k clears the shared
    recall floor vs the exact answer over SURVIVORS.  Returns one
    scalar summary row."""
    import shutil
    import time
    import uuid

    raw = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bucket = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % INCR_DELTA_BUCKETS
    )
    base = raw.where(bucket != 0)
    delta = raw.where(bucket == 0)
    # delta quarters by an INDEPENDENT md5 prefix (deterministic, does
    # not correlate with the base/delta split)
    part = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 9, 8), 16, 10)
        .cast("long") % 4
    )
    del_pred = F.col("vec_id") % SDEL_MOD == SDEL_RESIDUE
    # the re-insert: one BASE vector that the mid-feed delete removes
    x = base.where(del_pred).agg(F.min("vec_id")).first()[0]
    parts = [delta.where(part == i) for i in range(4)]
    adds_after = parts[2].unionByName(parts[3]).unionByName(
        raw.where(F.col("vec_id") == x)
    )
    path_b = ann_index_path(sf_dir) + "-sing2-b"
    path_s = ann_index_path(sf_dir) + "-sing2-s"
    # identical deterministic training (md5-ordered sample, lowest-id
    # init) → the two twins share quantizers without a layout copy
    build_ann_index(spark, sf_dir, path=path_b, emb_raw=base)
    build_ann_index(spark, sf_dir, path=path_s, emb_raw=base)
    append_ann_index(
        spark, path_b, parts[0].unionByName(parts[1]), "ingest-all-a"
    )
    delete_ann_index(spark, path_b, raw.where(del_pred), "ingest-all-del")
    append_ann_index(spark, path_b, adds_after, "ingest-all-b")

    feed = path_s + "-feed"
    ckpt = path_s + "-ckpt"
    if not os.path.isfile(os.path.join(feed, "_SUCCESS")):
        tmp = feed + f".tmp-{uuid.uuid4().hex}"
        os.makedirs(tmp)
        file_dfs = [
            parts[0].withColumn("op", F.lit("add")),
            parts[1].withColumn("op", F.lit("add")),
            raw.where(del_pred).withColumn("op", F.lit("del")),
            parts[2].withColumn("op", F.lit("add")),
            parts[3]
            .unionByName(raw.where(F.col("vec_id") == x))
            .withColumn("op", F.lit("add")),
        ]
        now = time.time()
        for i, fdf in enumerate(file_dfs):
            scratch = os.path.join(tmp, f".w{i}")
            fdf.coalesce(1).write.mode("overwrite").parquet(scratch)
            pf = next(
                f for f in os.listdir(scratch) if f.endswith(".parquet")
            )
            dst = os.path.join(tmp, f"{i:03d}.parquet")
            os.rename(os.path.join(scratch, pf), dst)
            shutil.rmtree(scratch)
            # ascending mtimes: FileStreamSource admits by mtime, and
            # unordered arrival stalls the op sequencing (r10 lesson)
            os.utime(dst, (now + i, now + i))
        with open(os.path.join(tmp, "_SUCCESS"), "w"):
            pass
        if os.path.isdir(feed):
            shutil.rmtree(feed)
        os.rename(tmp, feed)

    def _fold(df, batch_id):
        adds = df.where(F.col("op") == "add")
        dels = df.where(F.col("op") == "del")
        if not adds.isEmpty():
            append_ann_index(
                spark, path_s, adds.select("vec_id", "embedding"),
                f"ingest-stream-{batch_id}",
            )
        if not dels.isEmpty():
            delete_ann_index(
                spark, path_s, dels.select("vec_id"),
                f"ingest-del-{batch_id}",
            )

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("ANN ingest stream did not drain in 300s")
    meta_s = _read_meta(path_s)
    stream_tags = [
        t for t in meta_s.get("batches", []) if t.startswith("ingest-stream-")
    ]
    del_tags = [
        t for t in meta_s.get("deletes", []) if t.startswith("ingest-del-")
    ]
    if len(stream_tags) < 2 or len(del_tags) < 1:
        raise AssertionError(
            f"stream twin folded {len(stream_tags)} add / {len(del_tags)} "
            "delete micro-batches — CDC multi-batch admission did not engage"
        )
    live = {}
    for name, p in (("batch", path_b), ("stream", path_s)):
        live[name] = _live_codes(
            spark, p, spark.read.parquet(codes_root(p))
        ).localCheckpoint(eager=False)
    n_live_b, n_live_s = live["batch"].count(), live["stream"].count()
    if n_live_b != n_live_s:
        raise AssertionError(
            f"twin live sets diverged: {n_live_b} vs {n_live_s} rows"
        )
    # streamed delete suppressed everywhere; streamed re-adds (delta
    # parts 2,3 land AFTER the delete, plus the explicit re-insert x)
    # serve exactly once (sequenced cover across the CDC stream).  A
    # deleted id is GONE only if nothing re-added it afterwards.
    def _gone(c):
        b = (
            F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
            .cast("long") % INCR_DELTA_BUCKETS
        )
        p = (
            F.conv(F.substring(F.md5(c.cast("string")), 9, 8), 16, 10)
            .cast("long") % 4
        )
        readded = ((b == 0) & p.isin(2, 3)) | (c == x)
        return (c % SDEL_MOD == SDEL_RESIDUE) & ~readded

    for name in ("batch", "stream"):
        if live[name].where(_gone(F.col("vec_id"))).count():
            raise AssertionError(f"{name} twin serves a deleted vector")
        if live[name].where(F.col("vec_id") == x).count() != 1:
            raise AssertionError(
                f"{name} twin lost the re-inserted vector"
            )
    qids, qmat, qnrm = _query_rows(spark, sf_dir)
    norms = _norms(spark, sf_dir)
    served = {}
    for name, p in (("batch", path_b), ("stream", path_s)):
        served[name] = _exact_rerank(
            spark, norms, search_ann_index(spark, p, qids, qmat, qnrm),
            qids, qmat, qnrm,
        ).select("query_id", "neighbor_id").localCheckpoint(eager=False)
    n_diff = (
        served["batch"].exceptAll(served["stream"]).count()
        + served["stream"].exceptAll(served["batch"]).count()
    )
    if n_diff:
        raise AssertionError(
            f"stream-ingested index serves a different top-k: {n_diff} "
            "rows diverge from the batch twin"
        )
    n_rows = served["stream"].count()
    n = corpus_rows(spark, sf_dir)
    if n <= _PQ_GATE_MAX_N:
        # exact answer over SURVIVORS: the deleted slice minus every
        # re-add cannot appear as a neighbor
        gone = _gone(F.col("neighbor_id"))
        exact = (
            q_knn_cosine_topk(spark, sf_dir)
            .where(~gone)
            .select("query_id", "neighbor_id")
        )
        if served["stream"].where(gone).count():
            raise AssertionError("served top-k contains a deleted neighbor")
        n_exact = exact.count()
        hit = exact.join(
            served["stream"], ["query_id", "neighbor_id"], "left_semi"
        ).count()
        floor = RECALL_FLOORS["knn_cosine_served"]
        if n_exact == 0 or hit / n_exact < floor:
            raise AssertionError(
                f"stream-ingested index recall collapsed: {hit}/{n_exact}"
            )
    return spark.createDataFrame(
        [
            (
                int(base.count()),
                int(delta.count()),
                int(raw.where(del_pred).count()),
                int(len(stream_tags)),
                int(len(del_tags)),
                int(n_live_s),
                int(n_rows),
            )
        ],
        "n_base long, n_delta long, n_deleted long, n_stream_batches long, "
        "n_del_batches long, n_live long, n_topk_rows long",
    )


QUERIES = {
    # rows-only (iterative quantizer training — no SQL mirror), all
    # self-verifying: recall floor / build-integrity / idempotent-append
    # gates raise in-query
    "knn_cosine_served": q_knn_cosine_served,
    "ann_index_stats": q_ann_index_stats,
    "ann_index_incremental": q_ann_index_incremental,
    "ann_index_stream_ingest": q_ann_index_stream_ingest,
    "ann_index_partial_compact": q_ann_index_partial_compact,
    "ann_index_migrate": q_ann_index_migrate,
    # HASHED (filter → rank is SQL-expressible); the in-query gate
    # additionally drills the served pre/post/auto filtered paths
    "knn_cosine_filtered": q_knn_cosine_filtered,
}


def _filtered_oracle() -> str:
    from .vector import O_KNN_FILTERED

    return O_KNN_FILTERED


ORACLES: dict[str, str] = {"knn_cosine_filtered": _filtered_oracle()}
