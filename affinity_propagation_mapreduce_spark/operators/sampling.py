"""Training-pipeline sampling / splitting / packing operators (⊕ rows).

A 100 TB pretraining pipeline needs *deterministic* sampling: a random
`sample()` is irreproducible across retried tasks and unverifiable
against an oracle.  Every operator here keys its decision on an md5
bucket of the stable document id — the same row is kept/placed
identically on every engine, every retry, every partition layout:

    bucket(doc_id) = int(md5(cast(doc_id as string))[:8], 16) % 1000

md5 over the decimal string renders identically in Spark
(``F.md5`` after an implicit string→binary cast) and DuckDB
(``md5(doc_id::VARCHAR)``), so each query is hash-checkable end-to-end.

Scale notes (100 TB):
- every operator is a narrow projection + filter over the scan except the
  final small aggregate — no shuffle until the counts; the md5 predicate
  does not block column pruning (`.explain` shows the parquet scan reads
  only the referenced columns);
- `split_train_val_test` / `sample_hash` are pure map-side — they
  pipeline into whatever consumes them with zero extra stages;
- `pack_sequences` needs a global order; it is declared at context-window
  granularity to shard by `seq_id` downstream (each packed sequence is
  independent).  The single global window here is the oracle-scale
  formulation; the scale path orders within salted ranges first (see
  PLANS.md).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources import table

N_BUCKETS = 1000
SAMPLE_KEEP = 100        # sample_hash: keep bucket < 100 → 10% Bernoulli
TRAIN_END, VAL_END = 800, 900   # 80 / 10 / 10 split
CONTEXT_TOKENS = 256     # pack_sequences window (tokens, whitespace)

# per-language mixture epochs: upweight low-resource languages 2×,
# keep English at 1× (the classic rebalanced-pretraining mixture shape)
MIX_EPOCHS = {"en": 1, "de": 2, "es": 2, "fr": 2, "zh": 2}


def _bucket(col):
    """Deterministic md5 bucket in [0, N_BUCKETS) — portable bigint."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long") % N_BUCKETS
    )


_BUCKET_SQL = (
    "CAST(('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS BIGINT)"
    f" % {N_BUCKETS}"
)


# --- S1 deterministic Bernoulli sample ------------------------------------

def q_sample_hash(spark, sf_dir):
    """10% reproducible corpus sample: keep rows whose md5 bucket < 100.

    Map-side only — the filter sits directly on the scan, column pruning
    intact; no shuffle, no RNG state, identical keep-set on every engine
    and every retry."""
    docs = table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    return (
        docs.select("doc_id", "source", "lang", "n_chars",
                    b.alias("bucket"))
        .filter(F.col("bucket") < SAMPLE_KEEP)
    )


O_SAMPLE_HASH = f"""
SELECT doc_id, source, lang, n_chars, {_BUCKET_SQL} AS bucket
FROM documents
WHERE {_BUCKET_SQL} < {SAMPLE_KEEP}
"""


# --- S2 stratified sampling by language -----------------------------------

# keep-rate per 1000 by language: downsample the high-resource majority,
# keep everything low-resource (the curation knob of a mixture pipeline)
STRATA_RATES = {"en": 300, "de": 1000, "es": 1000, "fr": 1000, "zh": 1000}
_DEFAULT_RATE = 500


def q_sample_stratified(spark, sf_dir):
    """Per-language keep rates via the same md5 bucket; reports achieved
    vs configured rates per stratum.  The rate lookup is a CASE
    expression (broadcast-free, codegen'd); the only shuffle is the
    final tiny per-language aggregate."""
    docs = table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    rate = F.lit(_DEFAULT_RATE)
    for lang, r in STRATA_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    kept = (b < rate).cast("long")
    return (
        docs.select("lang", rate.alias("rate_permille"), kept.alias("kept"),
                    F.col("n_chars"))
        .groupBy("lang", "rate_permille")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("kept").alias("n_kept"),
            F.sum(F.col("kept") * F.col("n_chars")).alias("kept_chars"),
        )
    )


_RATE_SQL = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {r}" for lang, r in STRATA_RATES.items()
) + f" ELSE {_DEFAULT_RATE} END"

O_SAMPLE_STRATIFIED = f"""
SELECT lang,
       {_RATE_SQL} AS rate_permille,
       count(*) AS n_total,
       -- CAST: DuckDB integer sum() yields HUGEINT, which the driver's
       -- type-sensitive value hash rejects against Spark's BIGINT
       CAST(sum(CASE WHEN {_BUCKET_SQL} < {_RATE_SQL} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN {_BUCKET_SQL} < {_RATE_SQL} THEN n_chars ELSE 0 END)
            AS BIGINT) AS kept_chars
FROM documents
GROUP BY 1, 2
"""


# --- S3 train/val/test split ----------------------------------------------

def q_split_train_val_test(spark, sf_dir):
    """Deterministic 80/10/10 split on the md5 bucket.  A document's
    split never changes with data growth (bucket is a pure function of
    doc_id) — the property that keeps eval sets uncontaminated across
    corpus refreshes.  Map-side label + tiny aggregate."""
    docs = table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    split = (
        F.when(b < TRAIN_END, F.lit("train"))
        .when(b < VAL_END, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


O_SPLIT_TRAIN_VAL_TEST = f"""
SELECT CASE WHEN {_BUCKET_SQL} < {TRAIN_END} THEN 'train'
            WHEN {_BUCKET_SQL} < {VAL_END} THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM documents
GROUP BY 1
"""


# --- S4 corpus mixture with per-language epochs ---------------------------

def q_corpus_mixture(spark, sf_dir):
    """Rebalanced mixture: each language is repeated MIX_EPOCHS[lang]
    times (upsampling-by-epoch, the standard pretraining rebalance),
    instances distinguished by an epoch index.  Spark side is
    explode(sequence(...)) — a narrow generator, no shuffle until the
    final count; repeats never materialize the text column N times in
    the scan (only after the generator, and here only ids are kept)."""
    docs = table(spark, sf_dir, "documents")
    epochs = F.lit(1)
    for lang, e in MIX_EPOCHS.items():
        epochs = F.when(F.col("lang") == lang, F.lit(e)).otherwise(epochs)
    inst = docs.select(
        "lang", "doc_id", "n_chars",
        F.explode(F.sequence(F.lit(1), epochs)).alias("epoch"),
    )
    return inst.groupBy("lang").agg(
        F.count("*").alias("n_instances"),
        F.countDistinct("doc_id").alias("n_docs"),
        # long, matching the oracle's BIGINT epochs from range()
        F.max("epoch").cast("long").alias("max_epoch"),
        F.sum("n_chars").alias("instance_chars"),
    )


_EPOCH_SQL = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {e}" for lang, e in MIX_EPOCHS.items()
) + " ELSE 1 END"

O_CORPUS_MIXTURE = f"""
SELECT lang,
       count(*) AS n_instances,
       count(DISTINCT doc_id) AS n_docs,
       max(epoch) AS max_epoch,
       CAST(sum(n_chars) AS BIGINT) AS instance_chars
FROM (
  SELECT d.lang, d.doc_id, d.n_chars, gs.epoch
  FROM documents d,
       LATERAL (SELECT unnest(range(1, ({_EPOCH_SQL}) + 1)) AS epoch) gs
)
GROUP BY 1
"""


# --- S5 concat-and-chunk sequence packing ---------------------------------

def q_pack_sequences(spark, sf_dir):
    """Concat-and-chunk packing: shuffle documents into md5 order,
    running-sum their whitespace token counts, and cut sequences every
    CONTEXT_TOKENS — the classic pretraining packing (concatenate the
    shuffled corpus, slice into context windows).  seq_id is
    floor(exclusive_cumsum / window): a doc belongs to the window its
    first token lands in.  Output is per-sequence occupancy — the
    packing-efficiency report every pipeline needs.

    Scale: the global window is the oracle-sf formulation; at 100 TB the
    same cumsum runs per shard (order within md5 ranges, carry shard
    offsets — two tiny jobs), since sequences never straddle shard
    boundaries by construction."""
    docs = table(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("long")
    order_key = F.md5(F.col("doc_id").cast("string"))
    w = (
        Window.orderBy(order_key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    with_seq = docs.select(
        "doc_id", toks.alias("toks"), order_key.alias("ok")
    ).withColumn(
        "seq_id",
        # floor-div, NOT cast(x/y): DuckDB CAST(double AS BIGINT) rounds
        # half-to-even while Spark's cast truncates — floor agrees everywhere
        F.floor(
            F.coalesce(F.sum("toks").over(w), F.lit(0)) / CONTEXT_TOKENS
        ).cast("long"),
    )
    return with_seq.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("toks").alias("seq_tokens"),
        F.min("ok").alias("first_key"),
    )


def q_pack_sequences_sharded(spark, sf_dir):
    """Scale twin of pack_sequences: shard the corpus by the first hex
    digit of the md5 order key (16 deterministic ranges) and pack each
    shard independently — sequences never straddle shards, so the window
    is PARTITIONED (16 parallel cumsums) instead of a single global
    orderBy.  This is the formulation that runs at 100 TB: every shard
    is an independent packing job, seq_id = shard * 2^32 + local_seq
    keeps ids globally unique, and the only coordination is the hash
    that defined the shards.  Asserted in test_plans.py: the window
    carries a partition spec (no single-partition global sort)."""
    docs = table(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("long")
    order_key = F.md5(F.col("doc_id").cast("string"))
    base = docs.select(
        "doc_id", toks.alias("toks"), order_key.alias("ok"),
        F.conv(F.substring(order_key, 1, 1), 16, 10)
        .cast("long").alias("shard"),
    )
    w = (
        Window.partitionBy("shard").orderBy("ok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    with_seq = base.withColumn(
        "seq_id",
        F.col("shard") * F.lit(1 << 32)
        + F.floor(
            F.coalesce(F.sum("toks").over(w), F.lit(0)) / CONTEXT_TOKENS
        ).cast("long"),
    )
    return with_seq.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("toks").alias("seq_tokens"),
        F.min("ok").alias("first_key"),
    )


O_PACK_SEQUENCES_SHARDED = f"""
WITH ordered AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
         md5(doc_id::VARCHAR) AS ok,
         CAST(('0x' || substring(md5(doc_id::VARCHAR), 1, 1))::BIGINT
              AS BIGINT) AS shard
  FROM documents
), cum AS (
  SELECT doc_id, toks, ok, shard,
         COALESCE(sum(toks) OVER (PARTITION BY shard ORDER BY ok
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start
  FROM ordered
)
SELECT shard * {1 << 32} + CAST(tok_start // {CONTEXT_TOKENS} AS BIGINT)
         AS seq_id,
       count(*) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS seq_tokens,
       min(ok) AS first_key
FROM cum
GROUP BY 1
"""


O_PACK_SEQUENCES = f"""
WITH ordered AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
         md5(doc_id::VARCHAR) AS ok
  FROM documents
), cum AS (
  SELECT doc_id, toks, ok,
         COALESCE(sum(toks) OVER (ORDER BY ok
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start
  FROM ordered
)
SELECT CAST(tok_start // {CONTEXT_TOKENS} AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS seq_tokens,
       min(ok) AS first_key
FROM cum
GROUP BY 1
"""


QUERIES = {
    "sample_hash": q_sample_hash,
    "sample_stratified": q_sample_stratified,
    "split_train_val_test": q_split_train_val_test,
    "corpus_mixture": q_corpus_mixture,
    "pack_sequences": q_pack_sequences,
    "pack_sequences_sharded": q_pack_sequences_sharded,
}

ORACLES = {
    "sample_hash": O_SAMPLE_HASH,
    "sample_stratified": O_SAMPLE_STRATIFIED,
    "split_train_val_test": O_SPLIT_TRAIN_VAL_TEST,
    "corpus_mixture": O_CORPUS_MIXTURE,
    "pack_sequences": O_PACK_SEQUENCES,
    "pack_sequences_sharded": O_PACK_SEQUENCES_SHARDED,
}
