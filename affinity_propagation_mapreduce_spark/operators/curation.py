"""Corpus-curation operators (⊕ rows): eval-set decontamination,
document-frequency vocabulary pruning, Zipf corpus statistics.

The missing piece between dedup (textops) and sampling (sampling):
before a corpus trains anything, the pipeline must (a) prove the
training split does not leak the held-out split — *decontamination* —
and (b) know its token distribution (stopword mass, Zipf shape) to
calibrate filters.

Scale notes (100 TB):
- decontamination candidates come from the shingle inverted index
  (share-a-shingle equi-join, the same shape as dedup_ngram_jaccard) —
  never train × eval.  The eval side is tiny by construction (a held-out
  split), so the joined eval postings broadcast; the train side streams.
  Boilerplate shingles are the skew risk: at scale, cap posting length
  (drop shingles with eval-side document frequency above a bound) —
  contamination is decided by *rare* shingle mass, so a df-cap changes
  recall only marginally while bounding the join fan-out.
- vocabulary df and Zipf are one explode + two-level aggregate: partial
  map-side combine does almost all the work; the reducer sees one row
  per distinct token, not per occurrence.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .sampling import TRAIN_END, VAL_END, _bucket, _BUCKET_SQL
from .textops import _docs, _shingles, _tokens

CONTAMINATION_THRESHOLD = 0.5   # shared-shingle fraction of the eval doc
STOPWORD_DF = 0.6               # token is a stopword if df >= 60% of docs
ZIPF_TOPK = 30


# --- X1 eval-set decontamination ------------------------------------------

def q_decontaminate_eval(spark, sf_dir):
    """Flag train-split documents whose word-bigram shingle overlap with
    any test-split document is >= 50% of the eval doc's shingles — the
    train/eval leakage check run before every pretraining job.  Splits
    are the deterministic md5 buckets of split_train_val_test, so the
    contamination report itself is reproducible.  Candidates come from
    the shingle inverted index; overlap is an integer ratio (bitwise
    cross-engine)."""
    sh = _shingles(spark, sf_dir)
    b = _bucket(F.col("doc_id"))
    bucketed = sh.withColumn("bucket", b)
    train = bucketed.filter(F.col("bucket") < TRAIN_END)
    ev = bucketed.filter(F.col("bucket") >= VAL_END)
    ev_sz = ev.groupBy("doc_id").agg(F.count("*").alias("eval_sz"))
    inter = (
        train.alias("t")
        .join(ev.alias("e"), F.col("t.shingle") == F.col("e.shingle"))
        .groupBy(
            F.col("t.doc_id").alias("train_doc"),
            F.col("e.doc_id").alias("eval_doc"),
        )
        .agg(F.count("*").alias("inter"))
    )
    ratio = F.col("inter") / F.col("eval_sz")
    return (
        inter.join(ev_sz.withColumnRenamed("doc_id", "eval_doc"), "eval_doc")
        .where(ratio >= CONTAMINATION_THRESHOLD)
        .select(
            "train_doc", "eval_doc", "inter", "eval_sz",
            F.round(ratio, 6).alias("overlap"),
        )
    )


O_DECONTAMINATE_EVAL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                  {_BUCKET_SQL} AS bucket
           FROM documents),
sh AS (
  SELECT DISTINCT doc_id, bucket,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS shingle
  FROM t),
ev_sz AS (SELECT doc_id, count(*) AS eval_sz FROM sh
          WHERE bucket >= {VAL_END} GROUP BY 1),
inter AS (
  SELECT tr.doc_id AS train_doc, ev.doc_id AS eval_doc, count(*) AS inter
  FROM sh tr JOIN sh ev ON tr.shingle = ev.shingle
  WHERE tr.bucket < {TRAIN_END} AND ev.bucket >= {VAL_END}
  GROUP BY 1, 2)
SELECT train_doc, eval_doc, inter, eval_sz,
       ROUND(inter / eval_sz, 6) AS overlap
FROM inter JOIN ev_sz ON inter.eval_doc = ev_sz.doc_id
WHERE inter / eval_sz >= {CONTAMINATION_THRESHOLD}
"""


# --- X2 document-frequency vocabulary pruning ------------------------------

def q_vocab_prune(spark, sf_dir):
    """Corpus-level stopword detection (df >= 60% of docs) and the
    per-document effect of pruning them: token counts before/after and
    the surviving distinct vocabulary.  Two aggregates over one explode;
    the df side is a tiny distinct-token relation that broadcasts into
    the per-doc join.  The corpus size enters as a cross-joined 1-row
    aggregate (stays lazy — no separate driver-side count job)."""
    n_docs = _docs(spark, sf_dir).agg(F.count("*").alias("n_docs"))
    df_tbl = (
        _tokens(spark, sf_dir)
        .groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .withColumn("is_stop", F.col("df") >= STOPWORD_DF * F.col("n_docs"))
        .drop("n_docs")
    )
    toks = _tokens(spark, sf_dir)
    return (
        toks.join(F.broadcast(df_tbl), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.col("is_stop").cast("long")).alias("n_stop_tokens"),
            F.countDistinct(
                F.when(~F.col("is_stop"), F.col("token"))
            ).alias("kept_vocab"),
        )
    )


O_VOCAB_PRUNE = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
dfreq AS (
  SELECT token, count(DISTINCT doc_id) AS df,
         count(DISTINCT doc_id) >=
           {STOPWORD_DF} * (SELECT count(*) FROM documents) AS is_stop
  FROM tok GROUP BY token)
SELECT t.doc_id,
       count(*) AS n_tokens,
       -- CAST: DuckDB integer sum() yields HUGEINT; driver hash is
       -- type-sensitive against Spark's BIGINT
       CAST(sum(CASE WHEN d.is_stop THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stop_tokens,
       count(DISTINCT CASE WHEN NOT d.is_stop THEN t.token END) AS kept_vocab
FROM tok t JOIN dfreq d USING (token)
GROUP BY 1
"""


# --- X3 Zipf corpus statistics --------------------------------------------

def q_zipf_topk(spark, sf_dir):
    """Token frequency head: top-30 tokens by occurrence count with
    dense frequency rank and document frequency — the Zipf curve head
    every corpus report plots.  Partial-aggregated token counts; the
    rank window runs over the distinct-token relation (vocabulary-sized,
    not corpus-sized)."""
    counts = (
        _tokens(spark, sf_dir)
        .groupBy("token")
        .agg(
            F.count("*").alias("occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
    )
    w = Window.orderBy(F.col("occurrences").desc(), F.col("token"))
    return (
        counts.withColumn("freq_rank", F.row_number().over(w))
        .where(F.col("freq_rank") <= ZIPF_TOPK)
        .select("freq_rank", "token", "occurrences", "doc_freq")
    )


O_ZIPF_TOPK = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
counts AS (
  SELECT token, count(*) AS occurrences, count(DISTINCT doc_id) AS doc_freq
  FROM tok GROUP BY token)
SELECT CAST(row_number() OVER (ORDER BY occurrences DESC, token)
            AS INTEGER) AS freq_rank,
       token, occurrences, doc_freq
FROM counts
QUALIFY freq_rank <= {ZIPF_TOPK}
"""


# --- X4 feature-hashing embedder ------------------------------------------

FEATURE_HASH_DIMS = 64


def q_embed_feature_hash(spark, sf_dir):
    """Hashing-trick featurization: each token occurrence lands in
    dimension md5_bucket(token) % 64 with sign ±1 from the next hash
    bit — the classic collision-tolerant bag-of-words embedding that
    needs NO vocabulary table (the property that makes it the 100 TB
    featurizer: zero global state, pure map + one aggregate).  Output is
    the sparse (doc_id, dim, weight) relation with exact integer
    weights — dense assembly/normalization is a downstream concern
    (and floats would need parity rounding; ints hash exactly)."""
    toks = _tokens(spark, sf_dir)
    h = F.conv(F.substring(F.md5("token"), 1, 12), 16, 10).cast("long")
    dim = (h % FEATURE_HASH_DIMS).alias("dim")
    sign = (F.when((h / FEATURE_HASH_DIMS).cast("long") % 2 == 0, 1)
            .otherwise(-1))
    return (
        toks.select("doc_id", dim, sign.alias("sign"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("sign").alias("weight"))
        .where(F.col("weight") != 0)
    )


O_EMBED_FEATURE_HASH = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
hashed AS (
  SELECT doc_id,
         ('0x' || substring(md5(token), 1, 12))::BIGINT % {FEATURE_HASH_DIMS}
           AS dim,
         CASE WHEN (('0x' || substring(md5(token), 1, 12))::BIGINT
                    // {FEATURE_HASH_DIMS}) % 2 = 0 THEN 1 ELSE -1 END AS sign
  FROM tok)
SELECT doc_id, dim, CAST(sum(sign) AS BIGINT) AS weight
FROM hashed GROUP BY doc_id, dim
HAVING sum(sign) != 0
"""


# --- PII-style masking ------------------------------------------------------

def q_pii_scrub(spark, sf_dir):
    """PII-shaped scrubbing pass: mask every digit in the identifier-bearing
    name column ('Customer#000000042' -> 'Customer##########') and report
    how many characters were redacted per row plus a per-row residual
    check (no digits may survive).  Pure JVM regexp expressions — the
    masking pipeline is a map-only projection at any scale, no shuffle.
    On a real corpus the same shape carries email/phone patterns; the
    digit-run rule is the pattern this fixture schema can exercise."""
    from ..sources import table as _table

    cust = _table(spark, sf_dir, "customer")
    masked = F.regexp_replace(F.col("c_name"), "[0-9]", "#")
    n_redacted = (
        F.length("c_name") - F.length(F.regexp_replace(F.col("c_name"), "[0-9]", ""))
    )
    return cust.select(
        "c_custkey",
        masked.alias("name_masked"),
        n_redacted.cast("long").alias("n_redacted"),
        masked.rlike("[0-9]").cast("bigint").alias("residual_digits"),
    )


O_PII_SCRUB = """
SELECT c_custkey,
       regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
       CAST(length(c_name)
            - length(regexp_replace(c_name, '[0-9]', '', 'g')) AS BIGINT)
         AS n_redacted,
       CAST(regexp_matches(regexp_replace(c_name, '[0-9]', '#', 'g'), '[0-9]')
            AS BIGINT) AS residual_digits
FROM customer
"""


# --- (⊕ r4) count-min sketch term frequencies --------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_PRIME = 2147483647  # 2^31-1; (ha + j*hb) < 2^53 stays exact int64


def _cms_hashed(spark, sf_dir):
    """(token, ha, hb): one md5 per token occurrence, split into the two
    Carter-Wegman 48-bit halves."""
    from .. sources import table as _table

    toks = _table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    digest = F.md5("token")
    return toks.select(
        "token",
        F.conv(F.substring(digest, 1, 12), 16, 10).cast("long").alias("ha"),
        F.conv(F.substring(digest, 13, 12), 16, 10).cast("long").alias("hb"),
    )


def _cms_bucket_structs():
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("depth"),
                ((F.col("ha") + F.lit(j) * F.col("hb")) % CMS_PRIME % CMS_WIDTH)
                .alias("bucket"),
            )
            for j in range(1, CMS_DEPTH + 1)
        ]
    )


def cms_counters(spark, sf_dir):
    """The sketch state itself: ≤ CMS_DEPTH·CMS_WIDTH counter rows no
    matter the corpus size (the bound tests assert both the cardinality
    and the map-side partial aggregation that keeps the shuffle at that
    size)."""
    hashed = _cms_hashed(spark, sf_dir)
    return (
        hashed.select(F.explode(_cms_bucket_structs()).alias("s"))
        .groupBy(F.col("s.depth").alias("depth"), F.col("s.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def q_freq_cms(spark, sf_dir):
    """Count-min sketch of corpus term frequencies, checked against the
    exact counts: every token occurrence increments CMS_DEPTH counters
    (Carter-Wegman bucket = (ha + j·hb) mod p mod width, one md5 per
    token — same portable family as the minhash LSH), the estimate is
    the min over depths, and the emitted overcount = estimate − exact is
    the sketch's collision error (never negative, by construction).

    Scale story: the counter table is depth×width = 256 cells regardless
    of corpus size — the shuffle reduces to it map-side — and the probe
    joins are broadcasts of that fixed-size sketch; the exact counts
    here are the oracle-side audit, not something the 100 TB run needs."""
    hashed = _cms_hashed(spark, sf_dir)
    bucket_structs = _cms_bucket_structs()
    counters = cms_counters(spark, sf_dir)
    probes = (
        hashed.groupBy("token", "ha", "hb")
        .agg(F.count("*").alias("exact_n"))
        .select("token", "exact_n", F.explode(bucket_structs).alias("s"))
        .select(
            "token", "exact_n",
            F.col("s.depth").alias("depth"), F.col("s.bucket").alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(counters), ["depth", "bucket"])
        .groupBy("token", "exact_n")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "token",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        )
    )


def _cms_oracle_sql() -> str:
    probes = "\nUNION ALL\n".join(
        f"SELECT token, exact_n, {j} AS depth,"
        f" (ha + {j} * hb) % {CMS_PRIME} % {CMS_WIDTH} AS bucket FROM hashed"
        for j in range(1, CMS_DEPTH + 1)
    )
    incr = "\nUNION ALL\n".join(
        f"SELECT {j} AS depth,"
        f" (ha + {j} * hb) % {CMS_PRIME} % {CMS_WIDTH} AS bucket FROM occ"
        for j in range(1, CMS_DEPTH + 1)
    )
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
occ AS (
  SELECT token,
         ('0x' || substring(md5(token), 1, 12))::BIGINT AS ha,
         ('0x' || substring(md5(token), 13, 12))::BIGINT AS hb
  FROM toks),
counters AS (
  SELECT depth, bucket, count(*) AS cnt
  FROM ({incr}) GROUP BY depth, bucket),
hashed AS (
  SELECT token, ha, hb, count(*) AS exact_n
  FROM occ GROUP BY token, ha, hb),
probed AS ({probes})
SELECT token, CAST(exact_n AS BIGINT) AS exact_n,
       CAST(min(cnt) AS BIGINT) AS cms_est,
       CAST(min(cnt) - exact_n AS BIGINT) AS overcount
FROM probed JOIN counters USING (depth, bucket)
GROUP BY token, exact_n
"""


O_FREQ_CMS = _cms_oracle_sql()


QUERIES = {
    "freq_cms": q_freq_cms,
    "pii_scrub": q_pii_scrub,
    "decontaminate_eval": q_decontaminate_eval,
    "vocab_prune": q_vocab_prune,
    "zipf_topk": q_zipf_topk,
    "embed_feature_hash": q_embed_feature_hash,
}

ORACLES = {
    "freq_cms": O_FREQ_CMS,
    "pii_scrub": O_PII_SCRUB,
    "decontaminate_eval": O_DECONTAMINATE_EVAL,
    "vocab_prune": O_VOCAB_PRUNE,
    "zipf_topk": O_ZIPF_TOPK,
    "embed_feature_hash": O_EMBED_FEATURE_HASH,
}
