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

from .sampling import CONTEXT_TOKENS, TRAIN_END, VAL_END, _bucket, _BUCKET_SQL
from .textops import _STOPWORDS, _docs, _shingles, _tokens

_STOPWORDS_SQL = ", ".join("'" + w + "'" for w in _STOPWORDS)

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


# --- X6 the composed curation pipeline (round 14) ---------------------------

def q_pipeline_curation_report(spark, sf_dir):
    """THE composed training-data job (r13 verdict "missing" #5): every
    stage below exists and is proven alone — this runs them as ONE DAG
    and emits the per-stage row accounting a real curation run is
    judged by:

        0_input             — corpus as scanned
        1_exact_dedup       — token-set-md5 exact dedup (D4's key)
        2_neardup_keep_best — Jaccard>=0.95 components over the exact
                              survivors, best-quality doc kept per
                              component (D5/D5c + keep_best policy)
        3_train_split       — deterministic md5 train bucket (S3)
        4_decontaminated    — eval-leakage docs removed (X1's rule,
                              eval side = the held-out split of the
                              FULL corpus)
        5_packed            — context-window packing of the clean train
                              split (S5's sharded formulation; n_units
                              = sequences, n_tokens = packed tokens)

    Stage semantics are the proven operators' own (same keys, same
    thresholds, same bucket function).  The exact Jaccard pair graph is
    the oracle-sf formulation; at 100 TB the banded-MinHash twin
    (dedup_near_minhash) replaces that one stage and everything else is
    already scale-shaped (hash buckets, inverted-index joins,
    partitioned packing windows, map-side-combining aggregates).  The
    report itself is six single-row aggregates cross-joined then
    stacked — one declarative plan, all-integer columns → fully hashed
    vs a DuckDB CTE chain."""
    from ..sources.tables import table_rows

    n_docs = table_rows(sf_dir, "documents")
    return _curation_report(
        spark,
        _docs(spark, sf_dir),
        lambda ed: _exact_jaccard_pairs(ed, src_rows=n_docs),
    )


def pipeline_curation_report_scaled(spark, docs):
    """The 100 TB formulation of the same DAG: identical stages except
    the near-dup pair graph comes from banded MinHash LSH
    (q_dedup_near_minhash's candidates ∝ band co-residency, never
    all-pairs) instead of the oracle-sf exact token-set Jaccard — the
    documented stage substitution.  Driven at 2M docs by
    tools/text_scale_run.py --pipeline; numbers in BASELINE.md."""
    from .textops import q_dedup_near_minhash

    def pairs_of(ed):
        return q_dedup_near_minhash(spark, None, docs=ed).select(
            "doc_lo", "doc_hi"
        )

    return _curation_report(spark, docs, pairs_of)


def _exact_jaccard_pairs(ed, src_rows: int | None = None):
    """Token-set Jaccard >= 0.95 pairs over the survivor docs —
    q_dedup_near_jaccard's inverted-index shape, parameterized."""
    from ..sources.tables import dup_cut

    # size-gated dup cut (r16): dt feeds both self-join sides and the
    # size dimension — and its parent `ed` (the survivor-doc subtree)
    # would otherwise be recomputed with it (r15, guide §2.4)
    dt = dup_cut(
        ed.select(
            "doc_id",
            F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
        ).distinct(),
        src_rows,
    )
    sizes = dt.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = dt.alias("a"), dt.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_lo"), F.col("b.doc_id").alias("doc_hi")
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("sz_lo") + F.col("sz_hi") - F.col("inter"))
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_lo"), F.col("sz").alias("sz_lo")),
            "doc_lo",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_hi"), F.col("sz").alias("sz_hi")),
            "doc_hi",
        )
        .where(jac >= 0.95)
        .select("doc_lo", "doc_hi")
    )


def _curation_report(spark, docs, pairs_of):
    """Shared body of the curation DAG — ``docs`` is any (doc_id, text)
    frame, ``pairs_of(ed)`` supplies the near-dup pair graph over the
    exact-dedup survivors (exact Jaccard at oracle sf, banded MinHash
    at scale)."""
    from .textops import q_text_quality_score

    toks_of = F.size(F.split("text", " ")).cast("long")
    d0 = docs.select("doc_id", "text", toks_of.alias("toks"))
    # stage 1: exact dedup on the token-set md5 (q_dedup_exact's key)
    key = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))
    )
    w_e = Window.partitionBy("k").orderBy("doc_id")
    ed = (
        d0.withColumn("k", key)
        .withColumn("rn", F.row_number().over(w_e))
        .where(F.col("rn") == 1)
        .select("doc_id", "text", "toks")
    )
    # stage 2: near-dup components over the survivors, best quality
    # kept per component (q_dedup_keep_best's window)
    pairs = pairs_of(ed)
    edges = pairs.select(
        F.col("doc_lo").alias("src"), F.col("doc_hi").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_hi").alias("src"), F.col("doc_lo").alias("dst"))
    ).localCheckpoint(eager=False)
    labels = ed.select("doc_id", F.col("doc_id").alias("comp"))
    while True:  # min-label propagation (q_dedup_components' loop)
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
    # score the SURVIVORS only (the oracle's q CTE is FROM ed too):
    # per-row function, so restricting the input changes no kept score
    # and skips the duplicate fraction's scoring work at scale
    quality = q_text_quality_score(spark, None, docs=ed).select(
        "doc_id", "quality_score_x1e4"
    )
    w_kb = Window.partitionBy("comp").orderBy(
        F.desc("quality_score_x1e4"), F.asc("doc_id")
    )
    kb = (
        labels.join(quality, "doc_id")
        .withColumn("rn", F.row_number().over(w_kb))
        .where(F.col("rn") == 1)
        .select("doc_id")
    )
    # stage 3: the deterministic train split
    tr = kb.where(_bucket(F.col("doc_id")) < TRAIN_END)
    # stage 4: decontamination vs the FULL corpus's held-out split
    tsh = _shingles(spark, None, docs=d0.join(tr, "doc_id", "left_semi"))
    esh = _shingles(spark, None, docs=d0).where(
        _bucket(F.col("doc_id")) >= VAL_END
    )
    ev_sz = esh.groupBy("doc_id").agg(F.count("*").alias("eval_sz"))
    olap = (
        tsh.alias("t")
        .join(esh.alias("e"), F.col("t.shingle") == F.col("e.shingle"))
        .groupBy(
            F.col("t.doc_id").alias("train_doc"),
            F.col("e.doc_id").alias("eval_doc"),
        )
        .agg(F.count("*").alias("inter"))
    )
    contaminated = (
        olap.join(ev_sz.withColumnRenamed("doc_id", "eval_doc"), "eval_doc")
        .where(F.col("inter") / F.col("eval_sz") >= CONTAMINATION_THRESHOLD)
        .select(F.col("train_doc").alias("doc_id"))
        .distinct()
    )
    cl = tr.join(contaminated, "doc_id", "left_anti")
    # stage 5: sharded context-window packing of the clean train split
    order_key = F.md5(F.col("doc_id").cast("string"))
    base = d0.join(cl, "doc_id", "left_semi").select(
        "doc_id", "toks", order_key.alias("ok"),
        F.conv(F.substring(order_key, 1, 1), 16, 10)
        .cast("long").alias("shard"),
    )
    w_p = (
        Window.partitionBy("shard").orderBy("ok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    packed = (
        base.withColumn(
            "seq_id",
            F.col("shard") * F.lit(1 << 32)
            + F.floor(
                F.coalesce(F.sum("toks").over(w_p), F.lit(0))
                / CONTEXT_TOKENS
            ).cast("long"),
        )
        .groupBy("seq_id")
        .agg(F.sum("toks").alias("seq_tokens"))
    )

    def _agg(df, n_name, tk_name, tok_col="toks"):
        return df.agg(
            F.count("*").cast("long").alias(n_name),
            F.coalesce(F.sum(tok_col), F.lit(0)).cast("long").alias(tk_name),
        )

    with_toks = lambda ids: d0.join(ids, "doc_id", "left_semi")  # noqa: E731
    row = (
        _agg(d0, "n0", "tk0")
        .crossJoin(_agg(ed, "n1", "tk1"))
        .crossJoin(_agg(with_toks(kb), "n2", "tk2"))
        .crossJoin(_agg(with_toks(tr), "n3", "tk3"))
        .crossJoin(_agg(with_toks(cl), "n4", "tk4"))
        .crossJoin(_agg(packed, "n5", "tk5", tok_col="seq_tokens"))
    )
    return row.selectExpr(
        """stack(6,
            '0_input',             n0, CAST(0 AS BIGINT), tk0,
            '1_exact_dedup',       n1, n0 - n1,           tk1,
            '2_neardup_keep_best', n2, n1 - n2,           tk2,
            '3_train_split',       n3, n2 - n3,           tk3,
            '4_decontaminated',    n4, n3 - n4,           tk4,
            '5_packed',            n5, CAST(0 AS BIGINT), tk5
        ) AS (stage, n_units, n_removed, n_tokens)"""
    )


O_PIPELINE_CURATION_REPORT = f"""
WITH RECURSIVE
d0 AS (SELECT doc_id, text,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
       FROM documents),
keyed AS (
  SELECT doc_id, text, toks,
         md5(list_aggregate(list_sort(list_distinct(string_split(text, ' '))),
                            'string_agg', ' ')) AS k
  FROM d0),
ed AS (SELECT doc_id, text, toks FROM keyed
       QUALIFY row_number() OVER (PARTITION BY k ORDER BY doc_id) = 1),
dt AS (SELECT DISTINCT doc_id,
              unnest(list_distinct(string_split(text, ' '))) AS token
       FROM ed),
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
  SELECT doc_id, doc_id FROM ed
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
                   t -> t IN ({_STOPWORDS_SQL}))) AS n_stop,
               length(text) AS n_chars
        FROM ed)),
kb AS (
  SELECT c.doc_id FROM comp c JOIN q USING (doc_id)
  QUALIFY row_number() OVER (PARTITION BY comp
                             ORDER BY quality_score_x1e4 DESC,
                                      doc_id ASC) = 1),
tr AS (SELECT doc_id FROM kb WHERE {_BUCKET_SQL} < {TRAIN_END}),
tsh AS (
  SELECT DISTINCT d.doc_id,
         unnest(list_transform(range(1, len(string_split(d.text, ' '))),
                i -> string_split(d.text, ' ')[i] || ' '
                     || string_split(d.text, ' ')[i + 1])) AS shingle
  FROM d0 d JOIN tr USING (doc_id)
  WHERE len(string_split(d.text, ' ')) >= 2),
esh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(string_split(text, ' '))),
                i -> string_split(text, ' ')[i] || ' '
                     || string_split(text, ' ')[i + 1])) AS shingle
  FROM d0
  WHERE {_BUCKET_SQL} >= {VAL_END}
    AND len(string_split(text, ' ')) >= 2),
ev_sz AS (SELECT doc_id, count(*) AS eval_sz FROM esh GROUP BY 1),
cont AS (
  SELECT DISTINCT train_doc AS doc_id
  FROM (SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc,
               count(*) AS inter
        FROM tsh t JOIN esh e ON t.shingle = e.shingle
        GROUP BY 1, 2) o
  JOIN ev_sz ON o.eval_doc = ev_sz.doc_id
  WHERE o.inter / ev_sz.eval_sz >= {CONTAMINATION_THRESHOLD}),
cl AS (SELECT doc_id FROM tr
       WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
pbase AS (
  SELECT d.doc_id, d.toks, md5(d.doc_id::VARCHAR) AS ok,
         CAST(('0x' || substring(md5(d.doc_id::VARCHAR), 1, 1))::BIGINT
              AS BIGINT) AS shard
  FROM d0 d JOIN cl USING (doc_id)),
pcum AS (
  SELECT shard, toks, ok,
         COALESCE(sum(toks) OVER (PARTITION BY shard ORDER BY ok
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start
  FROM pbase),
packed AS (
  SELECT shard * {1 << 32}
           + CAST(tok_start // {CONTEXT_TOKENS} AS BIGINT) AS seq_id,
         CAST(sum(toks) AS BIGINT) AS seq_tokens
  FROM pcum GROUP BY 1),
a0 AS (SELECT CAST(count(*) AS BIGINT) n, CAST(COALESCE(sum(toks), 0) AS BIGINT) tk FROM d0),
a1 AS (SELECT CAST(count(*) AS BIGINT) n, CAST(COALESCE(sum(toks), 0) AS BIGINT) tk FROM ed),
a2 AS (SELECT CAST(count(*) AS BIGINT) n, CAST(COALESCE(sum(toks), 0) AS BIGINT) tk
       FROM d0 WHERE doc_id IN (SELECT doc_id FROM kb)),
a3 AS (SELECT CAST(count(*) AS BIGINT) n, CAST(COALESCE(sum(toks), 0) AS BIGINT) tk
       FROM d0 WHERE doc_id IN (SELECT doc_id FROM tr)),
a4 AS (SELECT CAST(count(*) AS BIGINT) n, CAST(COALESCE(sum(toks), 0) AS BIGINT) tk
       FROM d0 WHERE doc_id IN (SELECT doc_id FROM cl)),
a5 AS (SELECT CAST(count(*) AS BIGINT) n, CAST(COALESCE(sum(seq_tokens), 0) AS BIGINT) tk
       FROM packed)
SELECT '0_input' AS stage, a0.n AS n_units, CAST(0 AS BIGINT) AS n_removed,
       a0.tk AS n_tokens FROM a0
UNION ALL SELECT '1_exact_dedup', a1.n, a0.n - a1.n, a1.tk FROM a0, a1
UNION ALL SELECT '2_neardup_keep_best', a2.n, a1.n - a2.n, a2.tk FROM a1, a2
UNION ALL SELECT '3_train_split', a3.n, a2.n - a3.n, a3.tk FROM a2, a3
UNION ALL SELECT '4_decontaminated', a4.n, a3.n - a4.n, a4.tk FROM a3, a4
UNION ALL SELECT '5_packed', a5.n, CAST(0 AS BIGINT), a5.tk FROM a5
"""


QUERIES = {
    "freq_cms": q_freq_cms,
    "pii_scrub": q_pii_scrub,
    "decontaminate_eval": q_decontaminate_eval,
    "vocab_prune": q_vocab_prune,
    "zipf_topk": q_zipf_topk,
    "embed_feature_hash": q_embed_feature_hash,
    "pipeline_curation_report": q_pipeline_curation_report,
}

ORACLES = {
    "freq_cms": O_FREQ_CMS,
    "pii_scrub": O_PII_SCRUB,
    "decontaminate_eval": O_DECONTAMINATE_EVAL,
    "vocab_prune": O_VOCAB_PRUNE,
    "zipf_topk": O_ZIPF_TOPK,
    "embed_feature_hash": O_EMBED_FEATURE_HASH,
    "pipeline_curation_report": O_PIPELINE_CURATION_REPORT,
}
