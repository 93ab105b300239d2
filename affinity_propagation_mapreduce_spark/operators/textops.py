"""Text analysis & deduplication operators (SURVEY.md §2 D-rows) over the
`documents` corpus — the LLM-training-pipeline surface the north star adds
on top of the reference's clustering core.

Data-shape traps (FIXTURES.md facts 3–4, all verified): raw texts have
ZERO exact duplicates at every sf, so exact dedup keys on the normalized
sorted distinct-token set; the 31-word vocabulary makes token Jaccard
dense, so near-dedup is declared at >= 0.95.

Scale notes: token explode → groupBy is the map-side-combinable word-count
shape; the exact O(n²) Jaccard join is oracle-checkable at sf0.01 while
``dedup_near_minhash`` (hash-checked via portable double hashing) is the banded-LSH path that survives
100 TB — candidate pairs come from band-bucket equi-joins, never a cross
join.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources import table


def _docs(spark, sf_dir):
    return table(spark, sf_dir, "documents")


def _tokens(spark, sf_dir, docs=None):
    """(doc_id, token) — one row per token occurrence.  ``docs``
    overrides the testdata source (widened-scan callers)."""
    if docs is None:
        docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )


def _distinct_tokens(spark, sf_dir, docs=None):
    """(doc_id, token) — the token *set* per document.  ``docs``
    overrides the testdata source (widened-scan callers)."""
    if docs is None:
        docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
    )


# --- D1 tokenize + word count ----------------------------------------------

def q_tok_wordcount(spark, sf_dir):
    return (
        _tokens(spark, sf_dir)
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


O_WORDCOUNT = """
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
"""

# --- D2 TF-IDF top term per document ---------------------------------------

def q_tfidf_topterms(spark, sf_dir):
    """tf·idf with idf = ln(N/df); top term per doc, ties → term asc.

    Input width (guide §2.5, verdict r15 #8): the token explode and the
    tf/df partial aggregations inherit the oracle-sf single-file scan's
    ONE partition — the guarded widen parallelizes them and is a no-op
    on a multi-file production scan.  Every value is an exact-int count
    or a per-row function of exact ints (tf·ln(N/df)), so the result is
    partitioning-independent."""
    from ..sources.tables import table_rows, widen_scan

    docs = _docs(spark, sf_dir)
    n_rows = table_rows(sf_dir, "documents")
    toks = _tokens(
        spark, sf_dir,
        docs=widen_scan(docs, n_rows, _MINHASH_DOCS_PER_TASK, "doc_id"),
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = (
        toks.select("doc_id", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(n_docs)
        .withColumn("tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("token").alias("top_term"),
            F.round("tfidf", 6).alias("tfidf"),
        )
    )


O_TFIDF = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
df AS (SELECT token, count(*) AS df
       FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf * ln(n.n_docs / df.df) AS tfidf
  FROM tf JOIN df USING (token) CROSS JOIN n)
SELECT doc_id, token AS top_term, ROUND(tfidf, 6) AS tfidf
FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY tfidf DESC, token ASC) = 1
"""

# --- D3 bigrams via positional self-join ------------------------------------

def q_ngrams_bigram(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    pos_toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " "))
    ).select("doc_id", F.col("pos").alias("p"), F.col("col").alias("w"))
    a = pos_toks.alias("a")
    b = pos_toks.alias("b")
    bigrams = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("b.p") == F.col("a.p") + 1),
    ).select(F.concat_ws(" ", "a.w", "b.w").alias("bigram"))
    return bigrams.groupBy("bigram").agg(F.count("*").alias("n"))


O_BIGRAM = """
WITH pos_toks AS (
  SELECT doc_id,
         CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS p,
         unnest(string_split(text, ' ')) AS w
  FROM documents)
SELECT a.w || ' ' || b.w AS bigram, count(*) AS n
FROM pos_toks a JOIN pos_toks b ON a.doc_id = b.doc_id AND b.p = a.p + 1
GROUP BY 1
"""

# --- D4 exact dedup on normalized token-set key -----------------------------

def q_dedup_exact(spark, sf_dir):
    """Key = md5 of the sorted distinct-token set (raw-text md5 is
    degenerate: zero raw duplicates at every sf — FIXTURES.md fact 3).
    Keeps the lowest doc_id per key; emits survivors + duplicate count."""
    docs = _docs(spark, sf_dir)
    key = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))
    )
    keyed = docs.select("doc_id", key.alias("dup_key"))
    w = Window.partitionBy("dup_key").orderBy("doc_id")
    wc = Window.partitionBy("dup_key")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .withColumn("n_dups", F.count("*").over(wc))
        .where(F.col("rn") == 1)
        .select("doc_id", "dup_key", "n_dups")
    )


O_DEDUP_EXACT = """
WITH keyed AS (
  SELECT doc_id,
         md5(list_aggregate(list_sort(list_distinct(string_split(text, ' '))),
                            'string_agg', ' ')) AS dup_key
  FROM documents)
SELECT doc_id, dup_key, count(*) OVER (PARTITION BY dup_key) AS n_dups
FROM keyed
QUALIFY row_number() OVER (PARTITION BY dup_key ORDER BY doc_id) = 1
"""

# --- D5 exact near-dedup: token-set Jaccard >= 0.95 -------------------------

def q_dedup_near_jaccard(spark, sf_dir):
    """All-pairs token-set Jaccard via the distinct-token inverted index:
    candidates only share-a-token pairs (no cross join), intersection from
    the token equi-join, union by inclusion-exclusion.  Threshold 0.95
    (FIXTURES.md fact 4: the 31-word vocabulary makes lower thresholds
    degenerate).  Jaccard is a ratio of exact ints → bitwise parity."""
    # size-gated dup cut (r16): dt feeds BOTH self-join sides and the
    # size dimension — without the cut the explode subtree is planned
    # three times (r15 plan audit, guide §2.4); above the gate each
    # consumer recomputes instead (executor-loss safety, guide §5).
    # Input width (guide §2.5, verdict r15 #8): the oracle-sf documents
    # table is ONE parquet file, so the explode + both join probes ran
    # one-threaded; the guarded widen adds nothing on a multi-file scan.
    # Values are row-local / integer-ratio Jaccard → order-free.
    from ..sources.tables import dup_cut, table_rows, widen_scan

    n_docs = table_rows(sf_dir, "documents")
    src = widen_scan(
        _docs(spark, sf_dir), n_docs, _MINHASH_DOCS_PER_TASK, "doc_id"
    )
    dt = dup_cut(_distinct_tokens(spark, sf_dir, docs=src), n_docs)
    sizes = dt.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = dt.alias("a")
    b = dt.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_lo"), F.col("b.doc_id").alias("doc_hi"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_lo"), F.col("sz").alias("sz_lo"))
    sb = sizes.select(F.col("doc_id").alias("doc_hi"), F.col("sz").alias("sz_hi"))
    jac = F.col("inter") / (F.col("sz_lo") + F.col("sz_hi") - F.col("inter"))
    return (
        inter.join(sa, "doc_lo")
        .join(sb, "doc_hi")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= 0.95)
        .select("doc_lo", "doc_hi", F.round("jaccard", 6).alias("jaccard"))
    )


O_NEAR_JACCARD = """
WITH dt AS (
  SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents),
sizes AS (SELECT doc_id, count(*) AS sz FROM dt GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi, count(*) AS inter
  FROM dt a JOIN dt b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_lo, doc_hi,
       ROUND(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON inter.doc_lo = sa.doc_id
JOIN sizes sb ON inter.doc_hi = sb.doc_id
WHERE inter / (sa.sz + sb.sz - inter) >= 0.95
"""


# --- D5a word-bigram-shingle Jaccard near-dedup -----------------------------

NGRAM_JACCARD_THRESHOLD = 0.8
# Unlike the token-SET Jaccard (background ≈ 0.6 on the 31-word
# vocabulary — FIXTURES.md fact 4), word-bigram shingles preserve local
# ordering, so the background collapses: measured at sf0.01, the 99th
# percentile of candidate-pair shingle-Jaccard is 0.08 while the 25 true
# near-dup pairs sit at >= 0.8.  This is why shingling (not token sets)
# is the standard dedup representation for LLM training corpora.


def _shingles(spark, sf_dir, docs=None):
    """(doc_id, shingle) — the distinct word-bigram shingle set per doc.
    ``docs`` overrides the testdata source (growth-law test).

    The token array is projected ONCE before the generator: referencing
    ``split(text, ' ')`` inside the transform lambda re-evaluates the
    split per element (Catalyst does not CSE through generator lambdas —
    measured 5× slower on the sf0.1 shingle stage).

    Docs with < 2 tokens are filtered FIRST — they have no bigram
    shingles, and Spark's ``sequence(1, 0)`` is a *descending* [1, 0]
    whose 0 index would throw in ANSI ``element_at`` (same trap as
    _char_trigrams; DuckDB's range(1, 0) is empty, so the oracle needs
    no guard)."""
    if docs is None:
        docs = _docs(spark, sf_dir)
    docs = (
        docs
        .select("doc_id", F.split("text", " ").alias("tk"))
        .where(F.size("tk") >= 2)
    )
    sh = F.explode(
        F.array_distinct(
            F.expr(
                "transform(sequence(1, size(tk) - 1),"
                " i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))"
            )
        )
    )
    return docs.select("doc_id", sh.alias("shingle"))


def q_dedup_ngram_jaccard(spark, sf_dir):
    """n-gram (word-bigram shingle) Jaccard near-dedup: candidate pairs
    from the shingle inverted index (share-a-shingle equi-join — never a
    cross join), intersection counted on the join, union by
    inclusion-exclusion, threshold 0.8.  Integer-ratio Jaccard → bitwise
    parity.  Scale shape is identical to q_dedup_near_jaccard: the
    inverted index shuffles by shingle, and rare shingles keep candidate
    fan-out near-linear; pair with MinHash banding over the SAME shingle
    sets (not token sets) when the corpus outgrows the index join."""
    # size-gated dup cut (r16): sh feeds both self-join sides and the
    # size dimension (same cut as q_dedup_near_jaccard, r15); guarded
    # input widen as in q_dedup_near_jaccard (order-free integer ratios)
    from ..sources.tables import dup_cut, table_rows, widen_scan

    n_docs = table_rows(sf_dir, "documents")
    src = widen_scan(
        _docs(spark, sf_dir), n_docs, _MINHASH_DOCS_PER_TASK, "doc_id"
    )
    sh = dup_cut(_shingles(spark, sf_dir, docs=src), n_docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_lo"), F.col("b.doc_id").alias("doc_hi"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_lo"), F.col("sz").alias("sz_lo"))
    sb = sizes.select(F.col("doc_id").alias("doc_hi"), F.col("sz").alias("sz_hi"))
    jac = F.col("inter") / (F.col("sz_lo") + F.col("sz_hi") - F.col("inter"))
    return (
        inter.join(sa, "doc_lo")
        .join(sb, "doc_hi")
        .where(jac >= NGRAM_JACCARD_THRESHOLD)
        .select("doc_lo", "doc_hi", F.round(jac, 6).alias("jaccard"))
    )


O_NGRAM_JACCARD = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS shingle
  FROM t),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_lo, doc_hi,
       ROUND(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON inter.doc_lo = sa.doc_id
JOIN sizes sb ON inter.doc_hi = sb.doc_id
WHERE inter / (sa.sz + sb.sz - inter) >= {NGRAM_JACCARD_THRESHOLD}
"""


# --- D5b MinHash + banded LSH near-dedup (rows-only; the 100 TB path) -------

N_HASHES = 32
# 8 bands × 4 rows over SHINGLE sets, tuned for the 0.8 shingle-Jaccard
# threshold: recall at j=0.8 is 1-(1-0.8^4)^8 ≈ 0.985 (and 1.0 for exact
# dups), while the background (candidate-pair shingle-Jaccard p99 ≈ 0.08
# — see NGRAM_JACCARD_THRESHOLD note) passes 1-(1-0.08^4)^8 ≈ 3e-4 of
# pairs.  Round 1 banded the token SETS instead, whose background
# similarity is ≈0.6 on this 31-word vocabulary — the bands passed 24%
# of ALL pairs (3.05M of 12.5M at sf0.1) and the verify join dominated
# the whole bench suite (34.6 s).  Shingles are also the semantically
# right unit for LLM-corpus dedup: they preserve word order.
N_BANDS = 8
MINHASH_PRIME = 2147483647  # 2^31-1; (ha + 31*hb) < 2^53 stays exact int64
_MINHASH_BROADCAST_MAX_DOCS = 1_000_000  # ≈ dimension-table broadcast cap
# input-width floor for the map-heavy minhash stages (guide §2.5): the
# oracle-sf documents table is ONE parquet file, so the shingle explode,
# per-shingle md5 hashing and the 32-way signature partial-agg all
# inherit a single partition and run one-threaded regardless of core
# count.  Docs are hash-repartitioned to ceil(n_docs / this) tasks,
# capped at defaultParallelism — derived from problem size (a 100 TB
# corpus arrives multi-file and never triggers it), keyed on doc_id (a
# deterministic key, never round-robin — guide §2.5 retry safety).
_MINHASH_DOCS_PER_TASK = 128


def _minhash_band_buckets(sh):
    """(doc_id, band, bucket) — banded MinHash buckets from a
    (doc_id, shingle) relation.  All N_HASHES minhashes come from ONE
    hash aggregation (32 ``min()`` columns over the shingle rows — the
    seeded-explode formulation shuffles 32× the rows for the same
    signatures); the Carter–Wegman double-hash family (one md5 split
    into two 48-bit halves) keeps every value exact int64, so DuckDB
    replays the identical banding."""
    digest = F.md5("shingle")
    hashed = sh.select(
        "doc_id",
        F.conv(F.substring(digest, 1, 12), 16, 10).cast("long").alias("ha"),
        F.conv(F.substring(digest, 13, 12), 16, 10).cast("long").alias("hb"),
    )
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min((F.col("ha") + s * F.col("hb")) % MINHASH_PRIME).alias(f"h{s}")
            for s in range(N_HASHES)
        ]
    )
    rows_per_band = N_HASHES // N_BANDS
    return sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(band).alias("band"),
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"h{band * rows_per_band + r}").cast("string")
                            for r in range(rows_per_band)
                        ],
                    ).alias("bucket"),
                )
                for band in range(N_BANDS)
            ])
        ).alias("bb"),
    ).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def q_dedup_near_minhash(
    spark, sf_dir, broadcast_verify: bool | None = None, docs=None
):
    """Banded MinHash LSH over word-bigram shingle sets — the sub-N²
    twin of ``dedup_ngram_jaccard``: per-doc signature of N_HASHES
    min-hashes, split into N_BANDS bands; docs sharing any band bucket
    become candidates (equi-join keyed by the band signature — never
    all-pairs), then candidates are verified with EXACT shingle Jaccard
    >= NGRAM_JACCARD_THRESHOLD.  Emitted pairs are therefore a subset of
    the exact operator's output (recall asserted >= 0.95 in
    tests/test_ann_recall.py).

    Fully hash-checked (upgraded from round-1 rows-only): the hash
    family is Carter-Wegman double hashing — ONE md5 per shingle split
    into two 48-bit halves (ha, hb), seed s's hash = (ha + s*hb) mod
    2^31-1.  All arithmetic is exact int64 (max intermediate < 2^53), so
    the DuckDB oracle replays the SAME banding and the gate verifies the
    LSH path end-to-end, not just the verify stage.  One md5 + 32 cheap
    fused ops per shingle costs about the same as the round-1 32×
    xxhash64 formulation (engine-specific, hence unverifiable) — 32
    seeded md5 calls instead would double the sf0.1 stage time.

    ``broadcast_verify``: the per-doc shingle-set dimension used by the
    verify stage is broadcast only while the corpus is broadcast-sized
    (auto by doc count when None); beyond the gate the verify join
    falls back to a keyed shuffle — at 100 TB the dimension does NOT fit
    an executor, and an unconditional broadcast would OOM (round-1
    review finding).  Both branches are plan-asserted in tests.

    ``docs`` overrides the testdata source with a caller-supplied
    (doc_id, text) frame — the growth-law test drives the real LSH
    pipeline over a synthetic corpus sweep.
    """
    # input width (guide §2.5, r15 session 3): at oracle SFs the source
    # is one parquet file and EVERY stage of this pipeline inherited a
    # single partition (measured: the whole query ran one-threaded).
    # Hash-repartition the doc rows (5000 rows — far cheaper to shuffle
    # than the ~50× larger exploded shingle relation) so the explode,
    # md5 hashing, signature partial-agg and verify intersects
    # parallelize; values are row-local / order-free (min over exact
    # ints, set semantics), so the result is unchanged.
    from ..sources.tables import table_rows, widen_scan

    n_docs = docs.count() if docs is not None else table_rows(
        sf_dir, "documents"
    )
    src = widen_scan(
        docs if docs is not None else _docs(spark, sf_dir),
        n_docs, _MINHASH_DOCS_PER_TASK, "doc_id",
    )
    # size-gated dup cut (r16) on the exploded shingle relation: it
    # feeds the signature build AND the verify-stage set aggregation —
    # without the cut the explode+distinct subtree runs twice (r15 plan
    # audit, guide §2.4); above the gate each consumer recomputes
    from ..sources.tables import dup_cut

    sh = dup_cut(_shingles(spark, sf_dir, docs=src), n_docs)
    # cut before the self-join too: both join sides reuse ONE
    # materialization instead of recomputing the signature subplan twice
    buckets = dup_cut(_minhash_band_buckets(sh), n_docs)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_lo"), F.col("b.doc_id").alias("doc_hi")
        )
        .distinct()
    )
    # exact verification on candidates only — array_intersect on the
    # shingle-set arrays (JVM, per-pair) instead of re-exploding: verify
    # cost is O(|candidates| · |shingles/doc|), not another shuffle of
    # the exploded relation
    # checkpoint the per-doc set dimension too: sa and sb below are two
    # selects over it, and Catalyst plans a DAG reuse as two full copies
    # of the aggregation subtree otherwise (r15 plan audit: the explode +
    # ObjectHashAggregate pair appeared twice in the executed plan)
    shsets = dup_cut(
        sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("shs")),
        n_docs,
    )
    if broadcast_verify is None:
        # n_docs computed once above (footer read / docs.count, r15)
        broadcast_verify = n_docs <= _MINHASH_BROADCAST_MAX_DOCS
    hint = F.broadcast if broadcast_verify else (lambda df: df)
    sa = shsets.select(F.col("doc_id").alias("doc_lo"), F.col("shs").alias("shs_lo"))
    sb = shsets.select(F.col("doc_id").alias("doc_hi"), F.col("shs").alias("shs_hi"))
    inter = F.size(F.array_intersect("shs_lo", "shs_hi"))
    union = F.size("shs_lo") + F.size("shs_hi") - inter
    jac = inter / union
    # size-ratio prefilter: J(A,B) <= min(|A|,|B|)/max(|A|,|B|) — pairs
    # whose set sizes differ beyond the threshold can never verify, so
    # they are pruned BEFORE the O(|A|·|B|) array_intersect runs
    size_ok = (
        F.least(F.size("shs_lo"), F.size("shs_hi"))
        / F.greatest(F.size("shs_lo"), F.size("shs_hi"))
        >= NGRAM_JACCARD_THRESHOLD
    )
    return (
        cand.join(hint(sa), "doc_lo")
        .join(hint(sb), "doc_hi")
        .where(size_ok)
        .where(jac >= NGRAM_JACCARD_THRESHOLD)
        .select("doc_lo", "doc_hi", F.round(jac, 6).alias("jaccard"))
    )


O_DEDUP_NEAR_MINHASH = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS shingle
  FROM t),
hashed AS (
  SELECT doc_id,
         ('0x' || substring(md5(shingle), 1, 12))::BIGINT AS ha,
         ('0x' || substring(md5(shingle), 13, 12))::BIGINT AS hb
  FROM sh),
hs AS (
  SELECT doc_id, seeds.s,
         min((ha + seeds.s * hb) % {MINHASH_PRIME}) AS mh
  FROM hashed CROSS JOIN (SELECT unnest(range(0, {N_HASHES})) AS s) seeds
  GROUP BY doc_id, seeds.s),
sig AS (
  SELECT doc_id, s // {N_HASHES // N_BANDS} AS band,
         string_agg(mh::VARCHAR, ',' ORDER BY s) AS bucket
  FROM hs GROUP BY doc_id, s // {N_HASHES // N_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_lo, b.doc_id AS doc_hi
  FROM sig a JOIN sig b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
sets AS (SELECT doc_id, list(DISTINCT shingle) AS shs FROM sh GROUP BY doc_id)
SELECT doc_lo, doc_hi,
       ROUND(len(list_intersect(sa.shs, sb.shs)) /
             (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs))),
             6) AS jaccard
FROM cand
JOIN sets sa ON cand.doc_lo = sa.doc_id
JOIN sets sb ON cand.doc_hi = sb.doc_id
WHERE len(list_intersect(sa.shs, sb.shs)) /
      (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs)))
      >= {NGRAM_JACCARD_THRESHOLD}
"""


# --- (⊕ r8) incremental dedup: new batch vs existing corpus index -----------

INCR_NEW_BUCKETS = 100  # md5 bucket < 100 of 1000 → ~10% "new batch"


def q_dedup_incremental(spark, sf_dir):
    """Incremental near-dedup — the production daily-crawl shape: match a
    NEW document batch against the EXISTING corpus without re-deduping
    the corpus against itself.  The split is the deterministic md5
    bucket (sampling.py convention): bucket < INCR_NEW_BUCKETS = the new
    batch (~10%), the rest = the indexed corpus.  Candidates come from
    the banded-MinHash bucket equi-join of batch signatures against
    index signatures (the same portable Carter–Wegman banding as
    ``dedup_near_minhash``); verification is exact shingle Jaccard.

    Scale shape: the index side pays one signature build (amortized in
    production — signatures persist); the batch side is small BY
    CONSTRUCTION, so its band buckets AND its shingle sets broadcast,
    and the only big-side work is the broadcast-probe of the index
    relations — no index self-join ever happens.  The verify join
    against the index's shingle sets is keyed by doc_id (the index
    dimension can never broadcast at 100 TB).  → hashed."""
    from .sampling import _bucket

    from ..sources.tables import dup_cut, table_rows

    docs = _docs(spark, sf_dir)
    n_docs = table_rows(sf_dir, "documents")
    is_new = _bucket(F.col("doc_id")) < INCR_NEW_BUCKETS
    sh_new = _shingles(spark, sf_dir, docs=docs.where(is_new))
    sh_old = _shingles(spark, sf_dir, docs=docs.where(~is_new))
    # size-gated dup cuts (r16): buckets + sets each read one build; the
    # INDEX side is ~90% of the corpus, so its cut is the first to yield
    # to the gate at scale (production keeps persisted signatures anyway)
    sh_new = dup_cut(sh_new, n_docs)
    sh_old = dup_cut(sh_old, n_docs)
    bn = _minhash_band_buckets(sh_new).select(
        F.col("doc_id").alias("new_doc_id"), "band", "bucket"
    )
    bo = _minhash_band_buckets(sh_old).select(
        F.col("doc_id").alias("old_doc_id"), "band", "bucket"
    )
    cand = (
        bo.join(F.broadcast(bn), ["band", "bucket"])
        .select("new_doc_id", "old_doc_id")
        .distinct()
    )
    sets_new = sh_new.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("shs_new")
    ).select(F.col("doc_id").alias("new_doc_id"), "shs_new")
    sets_old = sh_old.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("shs_old")
    ).select(F.col("doc_id").alias("old_doc_id"), "shs_old")
    inter = F.size(F.array_intersect("shs_new", "shs_old"))
    union = F.size("shs_new") + F.size("shs_old") - inter
    jac = inter / union
    return (
        cand.join(sets_old, "old_doc_id")
        .join(F.broadcast(sets_new), "new_doc_id")
        .where(jac >= NGRAM_JACCARD_THRESHOLD)
        .select(
            "new_doc_id",
            "old_doc_id",
            F.round(jac, 6).alias("jaccard"),
        )
    )


_INCR_BUCKET_SQL = (
    "CAST(('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS BIGINT)"
    " % 1000"
)

O_DEDUP_INCREMENTAL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         ({_INCR_BUCKET_SQL}) < {INCR_NEW_BUCKETS} AS is_new
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id, is_new,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS shingle
  FROM t),
hashed AS (
  SELECT doc_id, is_new,
         ('0x' || substring(md5(shingle), 1, 12))::BIGINT AS ha,
         ('0x' || substring(md5(shingle), 13, 12))::BIGINT AS hb
  FROM sh),
hs AS (
  SELECT doc_id, is_new, seeds.s,
         min((ha + seeds.s * hb) % {MINHASH_PRIME}) AS mh
  FROM hashed CROSS JOIN (SELECT unnest(range(0, {N_HASHES})) AS s) seeds
  GROUP BY doc_id, is_new, seeds.s),
sig AS (
  SELECT doc_id, is_new, s // {N_HASHES // N_BANDS} AS band,
         string_agg(mh::VARCHAR, ',' ORDER BY s) AS bucket
  FROM hs GROUP BY doc_id, is_new, s // {N_HASHES // N_BANDS}),
cand AS (
  SELECT DISTINCT n.doc_id AS new_doc_id, o.doc_id AS old_doc_id
  FROM sig n JOIN sig o
    ON n.band = o.band AND n.bucket = o.bucket
  WHERE n.is_new AND NOT o.is_new),
sets AS (SELECT doc_id, list(DISTINCT shingle) AS shs FROM sh GROUP BY doc_id)
SELECT new_doc_id, old_doc_id,
       ROUND(len(list_intersect(sn.shs, so.shs)) /
             (len(sn.shs) + len(so.shs) - len(list_intersect(sn.shs, so.shs))),
             6) AS jaccard
FROM cand
JOIN sets sn ON cand.new_doc_id = sn.doc_id
JOIN sets so ON cand.old_doc_id = so.doc_id
WHERE len(list_intersect(sn.shs, so.shs)) /
      (len(sn.shs) + len(so.shs) - len(list_intersect(sn.shs, so.shs)))
      >= {NGRAM_JACCARD_THRESHOLD}
"""


# --- D5c near-dup cluster canonicalization (connected components) -----------

def q_dedup_components(spark, sf_dir):
    """Near-dup cluster canonicalization — the step that turns pairwise
    dedup output into an actual corpus filter: connected components over
    the exact Jaccard >= 0.95 pair graph (D5), component id = min doc_id
    in the component, survivor = the doc equal to its component id.

    Iterative min-label propagation: each round joins labels along the
    (symmetrized, checkpointed) edge list and takes the per-vertex min —
    the standard distributed CC shape (keyed join + partial-aggregated
    groupBy per round, O(graph diameter) rounds; near-dup components are
    near-cliques, so 1-2 rounds here).  At 100 TB the same loop runs
    with the large-star/small-star optimization; nothing driver-side
    ever holds the graph — the loop only checks a changed-count
    aggregate per round.  Deterministic (min) → hashed against a DuckDB
    recursive-CTE oracle."""
    pairs = q_dedup_near_jaccard(spark, sf_dir).select("doc_lo", "doc_hi")
    docs = _docs(spark, sf_dir).select("doc_id")
    edges = (
        pairs.select(F.col("doc_lo").alias("src"), F.col("doc_hi").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_hi").alias("src"), F.col("doc_lo").alias("dst")
            )
        )
        .localCheckpoint(eager=False)
    )
    labels = docs.select("doc_id", F.col("doc_id").alias("comp"))
    while True:
        nbr_min = (
            edges.join(labels, edges["src"] == labels["doc_id"])
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("comp", "old_comp"), "doc_id"
            )
            .where(F.col("comp") != F.col("old_comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        "doc_id",
        "comp",
        (F.col("doc_id") == F.col("comp")).cast("long").alias("is_canonical"),
    )


O_DEDUP_COMPONENTS = f"""
WITH RECURSIVE dt AS (
  SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents),
sizes AS (SELECT doc_id, count(*) AS sz FROM dt GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi, count(*) AS inter
  FROM dt a JOIN dt b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_lo, doc_hi
  FROM inter
  JOIN sizes sa ON inter.doc_lo = sa.doc_id
  JOIN sizes sb ON inter.doc_hi = sb.doc_id
  WHERE inter / (sa.sz + sb.sz - inter) >= 0.95),
edges AS (SELECT doc_lo AS src, doc_hi AS dst FROM pairs
          UNION ALL
          SELECT doc_hi AS src, doc_lo AS dst FROM pairs),
reach(doc_id, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON r.doc_id = e.src)
SELECT doc_id, min(comp) AS comp,
       CAST(doc_id = min(comp) AS BIGINT) AS is_canonical
FROM reach GROUP BY doc_id
"""


# --- D6 corpus profile -------------------------------------------------------

def q_text_profile(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bucket = F.floor(F.col("n_chars") / 100).cast("long")
    return (
        docs.groupBy("lang", bucket.alias("len_bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


O_TEXT_PROFILE = """
SELECT lang, CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket,
       count(*) AS n_docs,
       ROUND(avg(n_chars), 4) AS avg_chars,
       count(DISTINCT source) AS n_sources
FROM documents GROUP BY 1, 2
"""


# --- D7 language ID via character-trigram profiles --------------------------

LANG_PROFILE_K = 20  # top-k trigrams per language profile


def _char_trigrams(spark, sf_dir):
    """(doc_id, lang, trigram) — one row per trigram occurrence.  Texts
    shorter than 3 chars are filtered FIRST: sequence(1, length-2) with
    length < 3 generates a *descending* sequence (bogus positions), not
    an empty one."""
    docs = _docs(spark, sf_dir).where(F.length("text") >= 3)
    return docs.select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(1), F.length("text") - 2)).alias("p"),
        "text",
    ).select("doc_id", "lang", F.expr("substring(text, p, 3)").alias("tg"))


def q_lang_id_ngram(spark, sf_dir):
    """n-gram language ID: learn top-K character trigrams per language
    from the labeled corpus, score each doc by profile-hit counts,
    predict argmax (ties → lang asc).  On THIS corpus all languages share
    one vocabulary so accuracy is chance — the declared semantics are the
    mechanism (profile building + scoring), which is what transfers to
    real corpora."""
    tgs = _char_trigrams(spark, sf_dir)
    prof_counts = tgs.groupBy("lang", "tg").agg(F.count("*").alias("c"))
    w_prof = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tg"))
    profile = (
        prof_counts.withColumn("rn", F.row_number().over(w_prof))
        .where(F.col("rn") <= LANG_PROFILE_K)
        .select(F.col("lang").alias("cand_lang"), "tg")
    )
    doc_tg = tgs.groupBy("doc_id", "tg").agg(F.count("*").alias("n"))
    scored = (
        doc_tg.join(profile, "tg")
        .groupBy("doc_id", "cand_lang")
        .agg(F.sum("n").alias("score"))
    )
    w_best = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("cand_lang")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_best))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("pred_lang"), "score")
    )


O_LANG_ID = f"""
WITH maxlen AS (SELECT max(length(text)) AS m FROM documents),
pos AS (SELECT unnest(range(1, (SELECT m FROM maxlen))) AS p),
tgs AS (
  SELECT doc_id, lang, substring(text, p::INT, 3) AS tg
  FROM documents CROSS JOIN pos
  WHERE length(text) >= 3 AND p <= length(text) - 2),
prof_counts AS (SELECT lang, tg, count(*) AS c FROM tgs GROUP BY lang, tg),
profile AS (
  SELECT lang AS cand_lang, tg FROM prof_counts
  QUALIFY row_number() OVER (PARTITION BY lang ORDER BY c DESC, tg ASC)
          <= {LANG_PROFILE_K}),
doc_tg AS (SELECT doc_id, tg, count(*) AS n FROM tgs GROUP BY doc_id, tg),
scored AS (
  SELECT doc_id, cand_lang, CAST(sum(n) AS BIGINT) AS score
  FROM doc_tg JOIN profile USING (tg)
  GROUP BY doc_id, cand_lang)
SELECT doc_id, cand_lang AS pred_lang, score
FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, cand_lang ASC) = 1
"""

# --- D8 quality scoring ------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "in", "to")


def q_text_quality_score(spark, sf_dir, docs=None):
    """Length / stopword-ratio / token-length quality components with a
    weighted score — integer-ratio arithmetic, so parity is exact.
    ``docs`` overrides the testdata source (scale runs)."""
    if docs is None:
        docs = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    n_toks = F.size(toks)
    sw = ", ".join(f"'{w}'" for w in _STOPWORDS)
    n_stop = F.expr(f"size(filter(split(text, ' '), t -> t IN ({sw})))")
    avg_tok_len = (F.length("text") - n_toks + 1) / n_toks  # chars sans spaces
    stop_ratio = n_stop / n_toks
    score = (
        0.5 * stop_ratio
        + 0.3 * F.least(F.lit(1.0), n_toks / F.lit(50.0))
        + 0.2 * F.least(F.lit(1.0), avg_tok_len / F.lit(8.0))
    )
    # the composite score lands on EXACT 1e-4 half-boundaries for many
    # docs (small-denominator rationals); ROUND(x, 4) then diverges
    # across engines (BigDecimal-exact vs multiply-in-FP ties).  A scaled
    # *integer* — round(x·1e4) — agrees everywhere: both engines round
    # the identical double half-away-from-zero.
    return docs.select(
        "doc_id",
        n_toks.cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stopwords"),
        F.round(stop_ratio * 10000, 0).cast("long").alias("stopword_ratio_x1e4"),
        F.round(avg_tok_len * 10000, 0).cast("long").alias("avg_token_len_x1e4"),
        F.round(score * 10000, 0).cast("long").alias("quality_score_x1e4"),
    )


O_QUALITY = f"""
WITH x AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_toks,
         len(list_filter(string_split(text, ' '),
             t -> t IN ({", ".join("'" + w + "'" for w in _STOPWORDS)}))) AS n_stop,
         length(text) AS n_chars
  FROM documents)
SELECT doc_id,
       CAST(n_toks AS BIGINT) AS n_tokens,
       CAST(n_stop AS BIGINT) AS n_stopwords,
       CAST(ROUND((n_stop / n_toks) * 10000, 0) AS BIGINT) AS stopword_ratio_x1e4,
       CAST(ROUND(((n_chars - n_toks + 1) / n_toks) * 10000, 0) AS BIGINT) AS avg_token_len_x1e4,
       CAST(ROUND((0.5 * (n_stop / n_toks)
             + 0.3 * least(1.0, n_toks / 50.0)
             + 0.2 * least(1.0, ((n_chars - n_toks + 1) / n_toks) / 8.0))
             * 10000, 0) AS BIGINT)
         AS quality_score_x1e4
FROM x
"""

# --- D9 token counting: whitespace + BPE-ish regex ---------------------------

_BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def q_token_count(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    ws = F.size(F.split("text", " "))
    bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
        F.round(F.length("text") / bpe, 4).alias("chars_per_bpe_token"),
    )


O_TOKEN_COUNT = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT) AS bpe_tokens,
       ROUND(length(text) / len(regexp_extract_all(text, '{_BPE_PATTERN}')), 4)
         AS chars_per_bpe_token
FROM documents
"""

# --- D10 rolling-hash document fingerprint -----------------------------------

HASH_BASE = 31
HASH_MOD = 2147483647  # 2^31-1; BIGINT intermediate never overflows


def q_doc_fingerprint(spark, sf_dir):
    """Rabin–Karp-style rolling hash over the character stream
    (h = h*31 + code mod 2^31-1) as a sequential fold — integer
    arithmetic, bitwise-portable.  Also emits the hash of the distinct
    sorted token set to pair with D4's md5 normalization."""
    docs = _docs(spark, sf_dir)
    fold = (
        f"aggregate(transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT)),"
        f" CAST(0 AS BIGINT), (acc, x) -> (acc * {HASH_BASE} + x) % {HASH_MOD})"
    )
    norm_fold = (
        f"aggregate(transform(split(concat_ws(' ',"
        f" array_sort(array_distinct(split(text, ' ')))), ''),"
        f" c -> CAST(ascii(c) AS BIGINT)),"
        f" CAST(0 AS BIGINT), (acc, x) -> (acc * {HASH_BASE} + x) % {HASH_MOD})"
    )
    return docs.select(
        "doc_id",
        F.expr(fold).alias("content_hash"),
        F.expr(norm_fold).alias("tokenset_hash"),
    )


O_FINGERPRINT = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ''),
                          c -> CAST(ascii(c) AS BIGINT))),
         (acc, x) -> (acc * {HASH_BASE} + x) % {HASH_MOD}) AS content_hash,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(
             list_aggregate(list_sort(list_distinct(string_split(text, ' '))),
                            'string_agg', ' '), ''),
                          c -> CAST(ascii(c) AS BIGINT))),
         (acc, x) -> (acc * {HASH_BASE} + x) % {HASH_MOD}) AS tokenset_hash
FROM documents
"""


# --- D11 SimHash near-dup ----------------------------------------------------

SIMHASH_BITS = 31  # driven by the 31-bit portable rolling token hash
SIMHASH_HAMMING_MAX = 1  # dense corpus: 2.8k exact-fp pairs, 11k at <=1, 48k at <=3


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup: per-doc fingerprint = sign-aggregated bit votes
    of the (portable rolling-hash) distinct-token hashes; pairs at
    Hamming distance <= SIMHASH_HAMMING_MAX (= 1).  Fully deterministic
    integer arithmetic → hashed against the DuckDB oracle (unlike
    MinHash, whose xxhash64 seeds are engine-specific).

    Candidate generation is the standard simhash block sharding, not
    all-pairs: split the 31-bit fingerprint into two halves; at Hamming
    distance <= 1 at most one half differs, so (pigeonhole) every
    qualifying pair agrees EXACTLY on at least one half.  Candidates are
    an equi-join keyed on (half_index, half_value) — a keyed shuffle
    that survives 100 TB — then verified with the full Hamming distance.
    (For a threshold of h, split into h+1 blocks; the same join works.)
    The DuckDB oracle keeps the declarative all-pairs formulation: same
    result set, which is the point of the hash check."""
    docs = _docs(spark, sf_dir)
    tok_hash = (
        f"aggregate(transform(split(token, ''), c -> CAST(ascii(c) AS BIGINT)),"
        f" CAST(0 AS BIGINT), (acc, x) -> (acc * {HASH_BASE} + x) % {HASH_MOD})"
    )
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
    ).select("doc_id", F.expr(tok_hash).alias("h"))
    bits = toks.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("j"),
    )
    vote = F.when(
        F.expr("(h div CAST(pow(2, j) AS BIGINT)) % 2") == 1, 1
    ).otherwise(-1)
    votes = bits.groupBy("doc_id", "j").agg(F.sum(vote).alias("v"))
    fp = votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("CAST(pow(2, j) AS BIGINT)")).otherwise(
                F.lit(0)
            )
        ).alias("fp")
    )
    # one materialization feeds both join sides (and both half-blocks)
    fp = fp.localCheckpoint(eager=False)
    lo_half = F.col("fp").bitwiseAND(F.lit(0xFFFF))
    hi_half = F.shiftright(F.col("fp"), 16)
    blocks = fp.select(
        "doc_id", "fp", F.lit(0).alias("blk"), lo_half.alias("hv")
    ).unionByName(
        fp.select("doc_id", "fp", F.lit(1).alias("blk"), hi_half.alias("hv"))
    )
    a = blocks.select(
        F.col("doc_id").alias("doc_lo"), F.col("fp").alias("fp_lo"), "blk", "hv"
    )
    b = blocks.select(
        F.col("doc_id").alias("doc_hi"), F.col("fp").alias("fp_hi"), "blk", "hv"
    )
    cand = (
        a.join(b, ["blk", "hv"])
        .where(F.col("doc_lo") < F.col("doc_hi"))
        # a pair agreeing on BOTH halves surfaces in both blocks → dedup
        .select("doc_lo", "doc_hi", "fp_lo", "fp_hi")
        .distinct()
    )
    ham = F.bit_count(F.col("fp_lo").bitwiseXOR(F.col("fp_hi"))).cast("long")
    return (
        cand.select("doc_lo", "doc_hi", ham.alias("hamming"))
        .where(F.col("hamming") <= SIMHASH_HAMMING_MAX)
    )


O_SIMHASH = f"""
WITH toks AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(token, ''),
                            c -> CAST(ascii(c) AS BIGINT))),
           (acc, x) -> (acc * {HASH_BASE} + x) % {HASH_MOD}) AS h
  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        FROM documents)),
bits AS (
  SELECT doc_id, h, unnest(range(0, {SIMHASH_BITS})) AS j FROM toks),
votes AS (
  SELECT doc_id, j,
         CAST(sum(CASE WHEN (h // CAST(pow(2, j) AS BIGINT)) % 2 = 1
                       THEN 1 ELSE -1 END) AS BIGINT) AS v
  FROM bits GROUP BY doc_id, j),
fp AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0 THEN CAST(pow(2, j) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS fp
  FROM votes GROUP BY doc_id)
SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi,
       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= {SIMHASH_HAMMING_MAX}
"""


# --- D5d PageRank over the near-dup graph (⊕) -------------------------------

PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 5


def q_pagerank_neardup(spark, sf_dir):
    """PageRank (damping 0.85, 5 unrolled iterations, uniform teleport)
    over the symmetric >= 0.95 token-Jaccard near-dup graph — the second
    iterative relational algorithm in the engine after AP, and the
    centrality signal a curation pipeline uses to pick cluster
    representatives.  Same execution shape as the AP passes: per-
    iteration contribution = edges ⋈ ranks keyed by src, partial-
    aggregated by dst, rank rebuilt with a left join — the O(E) state is
    scanned per iteration, never sorted.  The corpus size enters as a
    cross-joined 1-row aggregate (lazy).  Ranks are group sums of
    doubles (summation-order dependent) → round(6) on BOTH sides at the
    output only; intermediates stay raw (divergence ~1e-14 after 5
    iterations, far under the grid).

    At 100 TB: the edge list shuffles by key once per iteration; ranks
    and degrees are vertex-sized.  For unrolled depth beyond a few
    iterations, checkpoint per iteration as ap.iterate does."""
    pairs = q_dedup_near_jaccard(spark, sf_dir).select("doc_lo", "doc_hi")
    edges = (
        pairs.select(F.col("doc_lo").alias("src"), F.col("doc_hi").alias("dst"))
        .unionAll(
            pairs.select(F.col("doc_hi").alias("src"), F.col("doc_lo").alias("dst"))
        )
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    docs = _docs(spark, sf_dir).select("doc_id")
    n = docs.agg(F.count("*").alias("n_docs"))
    base = docs.crossJoin(F.broadcast(n))
    ranks = base.select("doc_id", (F.lit(1.0) / F.col("n_docs")).alias("rank"))
    d = PAGERANK_DAMPING
    for _ in range(PAGERANK_ITERS):
        contrib = (
            edges.join(deg, "src")
            .join(ranks.withColumnRenamed("doc_id", "src"), "src")
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        ranks = base.join(contrib, "doc_id", "left").select(
            "doc_id",
            (
                (1.0 - d) / F.col("n_docs")
                + d * F.coalesce("contrib", F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select("doc_id", F.round("rank", 6).alias("rank"))


def _pagerank_oracle_sql() -> str:
    """Unrolled CTE chain mirroring q_pagerank_neardup iteration-for-
    iteration (same graph CTEs as O_DEDUP_COMPONENTS' pair derivation)."""
    d = PAGERANK_DAMPING
    parts = [
        """WITH dt AS (
  SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents),
sizes AS (SELECT doc_id, count(*) AS sz FROM dt GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi, count(*) AS inter
  FROM dt a JOIN dt b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_lo, doc_hi
  FROM inter
  JOIN sizes sa ON inter.doc_lo = sa.doc_id
  JOIN sizes sb ON inter.doc_hi = sb.doc_id
  WHERE inter / (sa.sz + sb.sz - inter) >= 0.95),
edges AS (SELECT doc_lo AS src, doc_hi AS dst FROM pairs
          UNION ALL
          SELECT doc_hi AS src, doc_lo AS dst FROM pairs),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
n AS (SELECT count(*) AS n_docs FROM documents),
r0 AS (SELECT doc_id, 1.0 / n.n_docs AS rank FROM documents, n)"""
    ]
    for i in range(PAGERANK_ITERS):
        parts.append(
            f"""c{i + 1} AS (
  SELECT e.dst AS doc_id, sum(r.rank / deg.deg) AS contrib
  FROM edges e JOIN deg ON e.src = deg.src
  JOIN r{i} r ON e.src = r.doc_id
  GROUP BY e.dst),
r{i + 1} AS (
  SELECT d.doc_id,
         (1.0 - {d}) / n.n_docs + {d} * COALESCE(c.contrib, 0.0) AS rank
  FROM documents d CROSS JOIN n LEFT JOIN c{i + 1} c ON d.doc_id = c.doc_id)"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT doc_id, ROUND(rank, 6) AS rank FROM r{PAGERANK_ITERS}"
    )


O_PAGERANK_NEARDUP = _pagerank_oracle_sql()


# --- (⊕ r4) graph analytics over the near-dup pair graph ---------------------

# shared oracle CTE: the exact-Jaccard >= 0.95 pair graph (same derivation
# as O_NEAR_JACCARD / O_DEDUP_COMPONENTS)
_O_PAIRS_CTE = """
dt AS (
  SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents),
sizes AS (SELECT doc_id, count(*) AS sz FROM dt GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi, count(*) AS inter
  FROM dt a JOIN dt b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_lo, doc_hi
  FROM inter
  JOIN sizes sa ON inter.doc_lo = sa.doc_id
  JOIN sizes sb ON inter.doc_hi = sb.doc_id
  WHERE inter / (sa.sz + sb.sz - inter) >= 0.95)
"""


def q_graph_triangle_count(spark, sf_dir):
    """Triangle census of the near-dup graph — near-dup components are
    near-cliques, so triangle density is the cheap clique-ness signal
    (how much of the pair list is redundant transitivity).  Classic
    oriented two-path join: edges kept as a<b, triangles counted as
    (a<b)⋈(b<c) two-paths closed by an (a,c) edge — each triangle counted
    exactly once, never the 6× of the unoriented join.  At scale the
    two-path join shuffles on the shared middle vertex and the closing
    probe is a semi-join against the (broadcastable) edge list."""
    pairs = q_dedup_near_jaccard(spark, sf_dir).select("doc_lo", "doc_hi")
    e1 = pairs.select(F.col("doc_lo").alias("a"), F.col("doc_hi").alias("b"))
    e2 = pairs.select(F.col("doc_lo").alias("b"), F.col("doc_hi").alias("c"))
    two_paths = e1.join(e2, "b")
    closing = pairs.select(F.col("doc_lo").alias("a"), F.col("doc_hi").alias("c"))
    tri = two_paths.join(closing, ["a", "c"], "left_semi")
    nodes = pairs.select(F.col("doc_lo").alias("d")).unionByName(
        pairs.select(F.col("doc_hi").alias("d"))
    )
    return (
        tri.agg(F.count("*").alias("n_triangles"))
        .crossJoin(pairs.agg(F.count("*").alias("n_edges")))
        .crossJoin(nodes.agg(F.countDistinct("d").alias("n_nodes")))
        .select("n_nodes", "n_edges", "n_triangles")
    )


O_TRIANGLE = f"""
WITH {_O_PAIRS_CTE},
tri AS (
  SELECT count(*) AS n_triangles
  FROM pairs e1
  JOIN pairs e2 ON e1.doc_hi = e2.doc_lo
  WHERE EXISTS (SELECT 1 FROM pairs e3
                WHERE e3.doc_lo = e1.doc_lo AND e3.doc_hi = e2.doc_hi)),
stats AS (
  SELECT count(*) AS n_edges FROM pairs),
nodes AS (
  SELECT count(DISTINCT d) AS n_nodes
  FROM (SELECT doc_lo AS d FROM pairs UNION ALL SELECT doc_hi FROM pairs))
SELECT n_nodes, n_edges, n_triangles FROM tri, stats, nodes
"""


def q_graph_degree_hist(spark, sf_dir):
    """Degree distribution of the near-dup graph: how many docs have k
    near-duplicates.  Two keyed aggregations (symmetrize → per-vertex
    degree → histogram); both shuffle keys shrink monotonically, the
    standard degree-profile shape at any scale."""
    pairs = q_dedup_near_jaccard(spark, sf_dir).select("doc_lo", "doc_hi")
    incid = pairs.select(F.col("doc_lo").alias("doc_id")).unionByName(
        pairs.select(F.col("doc_hi").alias("doc_id"))
    )
    deg = incid.groupBy("doc_id").agg(F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(F.count("*").alias("n_docs"))


O_DEGREE_HIST = f"""
WITH {_O_PAIRS_CTE},
incid AS (SELECT doc_lo AS doc_id FROM pairs
          UNION ALL SELECT doc_hi FROM pairs),
deg AS (SELECT doc_id, count(*) AS degree FROM incid GROUP BY doc_id)
SELECT degree, count(*) AS n_docs FROM deg GROUP BY degree
"""


# --- (⊕ r4) BPE first-merge statistics ---------------------------------------

def q_bpe_pair_stats(spark, sf_dir):
    """Adjacent character-pair frequencies within tokens — the statistic
    the first BPE merge step maximizes over a training corpus.  Emits
    each pair's total occurrence count and the number of distinct tokens
    containing it (the candidate-merge table a distributed BPE trainer
    consumes).  Generator explode over the token relation; both counts
    partial-aggregate map-side, and the result is bounded by alphabet²,
    not corpus size."""
    toks = _tokens(spark, sf_dir)
    # 1-char tokens make sequence(1, 0) descend through position 0;
    # substring tolerates it (unlike element_at) and the length filter
    # drops the sub-2-char artifacts it produces
    pairs = toks.select(
        "token",
        F.explode(
            F.expr(
                "transform(sequence(1, length(token) - 1),"
                " i -> substring(token, i, 2))"
            )
        ).alias("pair"),
    ).where(F.length("pair") == 2)
    return pairs.groupBy("pair").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("token").alias("n_distinct_tokens"),
    )


O_BPE_PAIRS = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
pairs AS (
  SELECT token,
         unnest(list_transform(generate_series(1, length(token) - 1),
                               i -> substring(token, i, 2))) AS pair
  FROM toks)
SELECT pair, count(*) AS n_occurrences,
       count(DISTINCT token) AS n_distinct_tokens
FROM pairs
WHERE length(pair) = 2
GROUP BY pair
"""


# --- (⊕ r4) per-source dedup QC report ---------------------------------------

def q_dedup_report(spark, sf_dir):
    """Corpus-curation QC rollup: per source, how much would exact
    (normalized token-set) dedup remove, and how many near-dup pairs
    (Jaccard >= 0.95) touch the source's docs.  Composes the D4 and D5
    relations — the report a pipeline operator emits before a filtering
    run; every input is an already-declared operator, so the report
    inherits their scale shapes."""
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    survivors = q_dedup_exact(spark, sf_dir).select("doc_id")
    pairs = q_dedup_near_jaccard(spark, sf_dir)
    per_source = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    surv = (
        docs.join(survivors, "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n_exact_survivors"))
    )
    touched = (
        pairs.select(F.col("doc_lo").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_hi").alias("doc_id")))
        .distinct()
        .join(docs, "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n_near_dup_docs"))
    )
    return (
        per_source.join(surv, "source")
        .join(touched, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_exact_survivors",
            F.round(
                (F.col("n_docs") - F.col("n_exact_survivors"))
                / F.col("n_docs"),
                4,
            ).alias("exact_dup_ratio"),
            F.coalesce("n_near_dup_docs", F.lit(0)).alias("n_near_dup_docs"),
        )
    )


O_DEDUP_REPORT = f"""
WITH {_O_PAIRS_CTE},
docs AS (SELECT doc_id, source FROM documents),
keyed AS (
  SELECT doc_id,
         md5(list_aggregate(list_sort(list_distinct(string_split(text, ' '))),
                            'string_agg', ' ')) AS dup_key
  FROM documents),
survivors AS (
  SELECT doc_id FROM keyed
  QUALIFY row_number() OVER (PARTITION BY dup_key ORDER BY doc_id) = 1),
per_source AS (SELECT source, count(*) AS n_docs FROM docs GROUP BY source),
surv AS (
  SELECT source, count(*) AS n_exact_survivors
  FROM docs JOIN survivors USING (doc_id) GROUP BY source),
touched AS (
  SELECT source, count(*) AS n_near_dup_docs
  FROM (SELECT DISTINCT doc_id
        FROM (SELECT doc_lo AS doc_id FROM pairs
              UNION ALL SELECT doc_hi FROM pairs)) t
  JOIN docs USING (doc_id)
  GROUP BY source)
SELECT source, n_docs, n_exact_survivors,
       ROUND((n_docs - n_exact_survivors) / CAST(n_docs AS DOUBLE), 4)
         AS exact_dup_ratio,
       CAST(coalesce(n_near_dup_docs, 0) AS BIGINT) AS n_near_dup_docs
FROM per_source
JOIN surv USING (source)
LEFT JOIN touched USING (source)
"""


# --- (⊕ r5) within-document repetition signals ------------------------------

REPETITION_TAU = 0.2  # Gopher-style cutoff for either repetition signal


def q_doc_repetition(spark, sf_dir):
    """Within-document repetition quality signals (the Gopher/RefinedWeb
    filter family): per doc, the most-frequent-token fraction and the
    duplicated-bigram fraction (1 − distinct/total), with a flag when
    either crosses REPETITION_TAU.  The bigram signal is computed
    array-side (transform over the token array — zero shuffle, no
    positional self-join; review finding); only the token histogram
    shuffles, on doc_id alone, so a 100 TB corpus profiles with
    per-doc-sized state and no cross-doc joins."""
    docs = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    tok_stats = (
        docs.select("doc_id", F.explode(toks).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_tokens"), F.max("c").alias("max_tok"))
    )
    bigrams = F.transform(
        F.slice(toks, F.lit(1), F.size(toks) - 1),
        lambda x, i: F.concat_ws(" ", x, F.get(toks, i + 1)),
    )
    big_stats = docs.select(
        "doc_id",
        (F.size(toks) - F.lit(1)).cast("long").alias("n_big"),
        F.size(F.array_distinct(bigrams)).cast("long").alias("n_big_d"),
    )
    top_frac = F.col("max_tok") / F.col("n_tokens")
    dup_frac = F.coalesce(
        F.lit(1.0) - F.col("n_big_d") / F.col("n_big"), F.lit(0.0)
    )
    return (
        tok_stats.join(big_stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(top_frac, 4).alias("top_token_frac"),
            F.round(dup_frac, 4).alias("dup_bigram_frac"),
            ((top_frac > REPETITION_TAU) | (dup_frac > REPETITION_TAU))
            .alias("is_repetitive"),
        )
    )


O_DOC_REPETITION = f"""
WITH pos_toks AS (
  SELECT doc_id,
         CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS p,
         unnest(string_split(text, ' ')) AS w
  FROM documents),
tok AS (SELECT doc_id, w, count(*) AS c FROM pos_toks GROUP BY 1, 2),
tstat AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(max(c) AS BIGINT) AS max_tok
  FROM tok GROUP BY 1),
big AS (
  SELECT a.doc_id, a.w || ' ' || b.w AS g
  FROM pos_toks a JOIN pos_toks b ON a.doc_id = b.doc_id AND b.p = a.p + 1),
bstat AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_big,
         CAST(count(DISTINCT g) AS BIGINT) AS n_big_d
  FROM big GROUP BY 1)
SELECT t.doc_id, t.n_tokens,
       ROUND(t.max_tok / t.n_tokens, 4) AS top_token_frac,
       ROUND(COALESCE(1.0 - b.n_big_d / b.n_big, 0.0), 4) AS dup_bigram_frac,
       (t.max_tok / t.n_tokens > {REPETITION_TAU}
        OR COALESCE(1.0 - b.n_big_d / b.n_big, 0.0) > {REPETITION_TAU})
         AS is_repetitive
FROM tstat t LEFT JOIN bstat b USING (doc_id)
"""


# --- D15 RAG chunking: overlapping token windows -----------------------------

CHUNK_TOKENS = 32  # window size W
CHUNK_STRIDE = 24  # stride S (overlap = W - S = 8 tokens)


def q_doc_chunk(spark, sf_dir):
    """Split every document into overlapping token-window chunks (the
    RAG / context-window packing pre-step): starts at 0, S, 2S, ... < n,
    each chunk = W tokens from its start (short tail kept).

    Scale shape: pure per-row generate-and-explode — ``sequence`` +
    ``slice`` stay inside whole-stage codegen, no shuffle at all; output
    partitioning inherits the scan, so a 100 TB corpus chunks embar-
    rassingly parallel.  Deterministic strings/ints → fully hashed."""
    docs = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    n = F.size(toks)
    chunked = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(
            F.sequence(F.lit(0), n - 1, F.lit(CHUNK_STRIDE))
        ).alias("start_tok"),
    )
    piece = F.slice(F.col("toks"), F.col("start_tok") + 1, F.lit(CHUNK_TOKENS))
    return chunked.select(
        "doc_id",
        F.floor(F.col("start_tok") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


O_DOC_CHUNK = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, toks,
             unnest(range(0, len(toks), {CHUNK_STRIDE})) AS start_tok
      FROM t)
SELECT doc_id,
       CAST(start_tok // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(len(toks[start_tok + 1 : start_tok + {CHUNK_TOKENS}]) AS BIGINT)
         AS n_chunk_tokens,
       array_to_string(toks[start_tok + 1 : start_tok + {CHUNK_TOKENS}], ' ')
         AS chunk_text
FROM s
"""


# --- D16 cross-document duplicated-span detection ----------------------------

SPAN_K = 8  # span width in tokens (Lee et al. use 50 BPE tokens at web scale)


def q_span_dedup(spark, sf_dir, docs=None):
    """Substring-level dedup signal (the "Deduplicating Training Data
    Makes Language Models Better" shape, token-window variant): an
    8-token span is *duplicated* if the identical span occurs in >= 2
    distinct documents; per document report how much of it is covered
    by corpus-duplicated spans.

    Scale shape: explode to (doc, span) → map-side-combinable groupBy
    on the span for document frequency → equi-join back on the span
    key.  No all-pairs anything; the span string is the shuffle key
    (at 100 TB you'd key on a 128-bit span hash instead — same plan).
    Integer counts and a scaled-integer ratio → fully hashed.

    ``docs`` overrides the testdata source with a caller-supplied
    (doc_id, text) frame (tools/text_scale_run.py drives the real
    pipeline at 500k synthesized docs)."""
    from ..sources.tables import dup_cut, table_rows

    if docs is None:
        docs = _docs(spark, sf_dir)
        n_docs = table_rows(sf_dir, "documents")
    else:
        n_docs = None  # caller-supplied frame: small by convention
    toks = F.split("text", " ")
    n = F.size(toks)
    grams = dup_cut(
        docs.where(n >= SPAN_K).select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), n - (SPAN_K - 1)),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, SPAN_K)),
                )
            ).alias("gram"),
        ),
        n_docs,
    )  # one explode feeds DF agg + join probe
    gram_df = (
        grams.distinct()  # (doc_id, gram) set → rows per gram = distinct docs
        .groupBy("gram")
        .agg(F.count("*").alias("gram_docs"))
    )
    return (
        grams.join(gram_df, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("gram_docs") >= 2).cast("long")).alias("n_dup_grams"),
            F.max("gram_docs").alias("max_gram_docs"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_dup_grams").cast("long").alias("n_dup_grams"),
            F.col("max_gram_docs").cast("long").alias("max_gram_docs"),
            F.round(F.col("n_dup_grams") / F.col("n_grams") * 10000, 0)
            .cast("long")
            .alias("dup_span_frac_x1e4"),
        )
    )


O_SPAN_DEDUP = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) - {SPAN_K - 2}),
                               i -> array_to_string(toks[i : i + {SPAN_K - 1}],
                                                    ' '))) AS gram
  FROM t WHERE len(toks) >= {SPAN_K}),
df AS (SELECT gram, count(DISTINCT doc_id) AS gram_docs FROM g GROUP BY gram)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN gram_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_grams,
       CAST(max(gram_docs) AS BIGINT) AS max_gram_docs,
       CAST(ROUND(sum(CASE WHEN gram_docs >= 2 THEN 1 ELSE 0 END)
                  / count(*) * 10000, 0) AS BIGINT) AS dup_span_frac_x1e4
FROM g JOIN df USING (gram)
GROUP BY doc_id
"""


# --- D17 near-dup canonical selection: keep the best-quality survivor --------

def q_dedup_keep_best(spark, sf_dir):
    """The dedup *policy* step real pipelines run after clustering:
    within each near-dup component (D5c), keep exactly one survivor —
    the highest quality-score document (tie → lowest doc_id) — instead
    of D5c's arbitrary min-id canonical.

    Composition of two proven operators: component labels (iterative
    min-label propagation) joined to the integer quality score (D8),
    then a per-component row_number window.  The window partitions by
    component id — components are near-cliques of duplicates, so
    partitions are tiny and skew-free at any corpus size.  Integer
    score + deterministic tie-break → fully hashed."""
    comps = q_dedup_components(spark, sf_dir).select("doc_id", "comp")
    quality = q_text_quality_score(spark, sf_dir).select(
        "doc_id", "quality_score_x1e4"
    )
    w = Window.partitionBy("comp").orderBy(
        F.desc("quality_score_x1e4"), F.asc("doc_id")
    )
    return (
        comps.join(quality, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            "comp",
            "quality_score_x1e4",
            (F.col("rn") == 1).cast("long").alias("keep"),
        )
    )


O_DEDUP_KEEP_BEST = f"""
WITH RECURSIVE dt AS (
  SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents),
sizes AS (SELECT doc_id, count(*) AS sz FROM dt GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi, count(*) AS inter
  FROM dt a JOIN dt b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_lo, doc_hi
  FROM inter
  JOIN sizes sa ON inter.doc_lo = sa.doc_id
  JOIN sizes sb ON inter.doc_hi = sb.doc_id
  WHERE inter / (sa.sz + sb.sz - inter) >= 0.95),
edges AS (SELECT doc_lo AS src, doc_hi AS dst FROM pairs
          UNION ALL
          SELECT doc_hi AS src, doc_lo AS dst FROM pairs),
reach(doc_id, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON r.doc_id = e.src),
comp AS (SELECT doc_id, min(comp) AS comp FROM reach GROUP BY doc_id),
q AS (
  SELECT doc_id,
         CAST(ROUND((0.5 * (n_stop / n_toks)
               + 0.3 * least(1.0, n_toks / 50.0)
               + 0.2 * least(1.0, ((n_chars - n_toks + 1) / n_toks) / 8.0))
               * 10000, 0) AS BIGINT) AS quality_score_x1e4
  FROM (SELECT doc_id,
               len(string_split(text, ' ')) AS n_toks,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ({", ".join("'" + w + "'" for w in _STOPWORDS)})))
                 AS n_stop,
               length(text) AS n_chars
        FROM documents))
SELECT c.doc_id, c.comp, q.quality_score_x1e4,
       CAST(row_number() OVER (PARTITION BY c.comp
                               ORDER BY q.quality_score_x1e4 DESC,
                                        c.doc_id ASC) = 1 AS BIGINT) AS keep
FROM comp c JOIN q USING (doc_id)
"""


# --- D18 unigram LM scoring (perplexity-filter proxy) ------------------------

_LM_BROADCAST_MAX_DOCS = 1_000_000  # vocab broadcast cap (Heaps'-law proxy)


def q_lm_unigram_score(spark, sf_dir):
    """CCNet-style LM quality scoring with the model Spark can train
    in-query: a corpus unigram LM (p(t) = count/total), each document
    scored by its average negative log-likelihood (= log-perplexity
    under the unigram model).  Real pipelines swap in a KenLM scorer at
    this exact spot; the plan shape is identical.

    Scale shape: token counts are one map-side-combinable groupBy; the
    vocabulary joins back via broadcast only while the corpus is
    broadcast-sized (vocabulary grows with corpus size by Heaps' law, so
    an unconditional broadcast would OOM at web scale — same gate
    convention as _MINHASH_BROADCAST_MAX_DOCS); past the gate it is a
    keyed shuffle join on the token.  Per-doc NLL sums have
    <= |vocab-in-doc| double terms, so ROUND(·, 4) is orders of
    magnitude above any summation-order noise → fully hashed."""
    docs = _docs(spark, sf_dir)
    toks = _tokens(spark, sf_dir)
    tot = toks.agg(F.count("*").alias("total"))
    uni = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    hint = (
        F.broadcast
        if docs.count() <= _LM_BROADCAST_MAX_DOCS
        else (lambda df: df)
    )
    doc_tok = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    scored = (
        doc_tok.join(hint(uni), "token")
        .crossJoin(F.broadcast(tot))
        .withColumn("nll", -F.col("tf") * F.log(F.col("cnt") / F.col("total")))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.round(F.sum("nll") / F.sum("tf"), 4).alias("avg_neg_logprob"),
    )


O_LM_UNIGRAM = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tot AS (SELECT count(*) AS total FROM toks),
uni AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
dt AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token)
SELECT doc_id,
       CAST(sum(tf) AS BIGINT) AS n_tokens,
       ROUND(sum(-tf * ln(cnt / total)) / sum(tf), 4) AS avg_neg_logprob
FROM dt JOIN uni USING (token) CROSS JOIN tot
GROUP BY doc_id
"""


# --- (⊕ r8) BM25 retrieval scoring ------------------------------------------

BM25_K1 = 1.2          # standard Robertson parameters
BM25_B = 0.75
BM25_QUERY = ("hash", "join", "filter")  # fixed query term set
BM25_TOP_N = 10


def q_bm25_topk(spark, sf_dir):
    """BM25 top-N retrieval for a fixed query term set — the classic
    lexical ranking used to mine/score training documents against a
    probe query (quality filtering, dedup-against-eval, retrieval
    baselines).  idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) (the
    Robertson/Lucene non-negative variant), tf component
    tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)).

    Scale shape: per-doc length (dl) is one map-side-combinable groupBy
    over the token stream; the query-term postings are FILTERED to the
    |q|=3 terms BEFORE their (doc_id, token) aggregation, so the scored
    relation is bounded by the query's posting lists, never the corpus
    vocabulary.  N/avgdl are a 1-row broadcast crossJoin.  Ranking is a
    TakeOrderedAndProject top-N (no global sort materialized).  Scores
    are summed over ≤3 terms then ROUND(·, 4); ranking uses the rounded
    score with doc_id tie-break, so order is engine-stable → hashed."""
    toks = _tokens(spark, sf_dir)
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qtoks = toks.where(F.col("token").isin(*BM25_QUERY))
    tf = qtoks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = qtoks.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "term_score", idf * F.col("tf") * (BM25_K1 + 1.0) / denom
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(F.sum("term_score"), 4).alias("bm25"),
            F.count("*").cast("long").alias("n_terms_hit"),
        )
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(BM25_TOP_N)
    )


_BM25_Q_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY)

O_BM25 = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
qt AS (SELECT * FROM toks WHERE token IN ({_BM25_Q_SQL})),
tf AS (SELECT doc_id, token, count(*) AS tf FROM qt GROUP BY 1, 2),
dfx AS (SELECT token, count(DISTINCT doc_id) AS df FROM qt GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * tf * ({BM25_K1} + 1.0)
           / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))
           AS term_score
  FROM tf JOIN dfx USING (token) JOIN dl USING (doc_id) CROSS JOIN stats)
SELECT doc_id, ROUND(sum(term_score), 4) AS bm25,
       CAST(count(*) AS BIGINT) AS n_terms_hit
FROM scored
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT {BM25_TOP_N}
"""


QUERIES = {
    "tok_wordcount": q_tok_wordcount,
    "bm25_topk": q_bm25_topk,
    "dedup_incremental": q_dedup_incremental,
    "bpe_pair_stats": q_bpe_pair_stats,
    "dedup_report": q_dedup_report,
    "dedup_simhash": q_dedup_simhash,
    "tfidf_topterms": q_tfidf_topterms,
    "ngrams_bigram": q_ngrams_bigram,
    "dedup_exact": q_dedup_exact,
    "dedup_near_jaccard": q_dedup_near_jaccard,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_components": q_dedup_components,
    "pagerank_neardup": q_pagerank_neardup,
    "dedup_near_minhash": q_dedup_near_minhash,
    "text_profile": q_text_profile,
    "doc_repetition": q_doc_repetition,
    "lang_id_ngram": q_lang_id_ngram,
    "text_quality_score": q_text_quality_score,
    "token_count": q_token_count,
    "doc_fingerprint": q_doc_fingerprint,
    "graph_triangle_count": q_graph_triangle_count,
    "graph_degree_hist": q_graph_degree_hist,
    "doc_chunk": q_doc_chunk,
    "span_dedup": q_span_dedup,
    "dedup_keep_best": q_dedup_keep_best,
    "lm_unigram_score": q_lm_unigram_score,
}

ORACLES = {
    "tok_wordcount": O_WORDCOUNT,
    "bm25_topk": O_BM25,
    "dedup_incremental": O_DEDUP_INCREMENTAL,
    "bpe_pair_stats": O_BPE_PAIRS,
    "dedup_report": O_DEDUP_REPORT,
    "dedup_simhash": O_SIMHASH,
    "tfidf_topterms": O_TFIDF,
    "ngrams_bigram": O_BIGRAM,
    "dedup_exact": O_DEDUP_EXACT,
    "dedup_near_jaccard": O_NEAR_JACCARD,
    "dedup_ngram_jaccard": O_NGRAM_JACCARD,
    "dedup_near_minhash": O_DEDUP_NEAR_MINHASH,
    "pagerank_neardup": O_PAGERANK_NEARDUP,
    "dedup_components": O_DEDUP_COMPONENTS,
    "text_profile": O_TEXT_PROFILE,
    "doc_repetition": O_DOC_REPETITION,
    "lang_id_ngram": O_LANG_ID,
    "text_quality_score": O_QUALITY,
    "token_count": O_TOKEN_COUNT,
    "doc_fingerprint": O_FINGERPRINT,
    "graph_triangle_count": O_TRIANGLE,
    "graph_degree_hist": O_DEGREE_HIST,
    "doc_chunk": O_DOC_CHUNK,
    "span_dedup": O_SPAN_DEDUP,
    "dedup_keep_best": O_DEDUP_KEEP_BEST,
    "lm_unigram_score": O_LM_UNIGRAM,
}
