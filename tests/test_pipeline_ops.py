"""Invariant tests for the round-8 LLM-pipeline additions: chunking,
span-level dedup, keep-best canonicalization, and unigram LM scoring.

Cross-engine value parity is covered by the driver/check_parity hash gate
(all four keys have DuckDB oracles); these tests pin the *semantic*
invariants the hashes can't express — coverage/overlap laws, per-component
survivor counts, and consistency with sibling operators.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from affinity_propagation_mapreduce_spark.operators import textops
from tests.conftest import SF_SMALL


def test_doc_chunk_covers_every_token_with_fixed_stride(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_toks")
    )
    chunks = textops.q_doc_chunk(spark, SF_SMALL)
    w, s = textops.CHUNK_TOKENS, textops.CHUNK_STRIDE
    per_doc = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.max(F.col("start_tok") + F.col("n_chunk_tokens")).alias("covered"),
        F.min("start_tok").alias("first_start"),
    )
    joined = per_doc.join(docs, "doc_id")
    bad = joined.where(
        (F.col("covered") != F.col("n_toks"))  # chunks end exactly at the doc end
        | (F.col("first_start") != 0)
        | (F.col("n_chunks") != F.ceil(F.col("n_toks") / s).cast("long"))
    ).count()
    assert bad == 0
    # a chunk is shorter than W only when it abuts the end of its doc
    short_not_tail = (
        chunks.join(docs, "doc_id")
        .where(
            (F.col("n_chunk_tokens") != w)
            & (F.col("start_tok") + F.col("n_chunk_tokens") != F.col("n_toks"))
        )
        .count()
    )
    assert short_not_tail == 0
    assert chunks.where(F.col("n_chunk_tokens") == w).count() > 0


def test_span_dedup_consistent_with_token_counts(spark):
    k = textops.SPAN_K
    res = textops.q_span_dedup(spark, SF_SMALL)
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_toks")
    )
    # n_grams == n_toks - K + 1 for every doc long enough
    bad = (
        res.join(docs, "doc_id")
        .where(F.col("n_grams") != F.col("n_toks") - (k - 1))
        .count()
    )
    assert bad == 0
    rows = res.agg(
        F.sum((F.col("n_dup_grams") > F.col("n_grams")).cast("long")).alias("over"),
        F.max("max_gram_docs").alias("mx"),
        F.sum("n_dup_grams").alias("dups"),
    ).collect()[0]
    assert rows.over == 0  # dup grams never exceed total grams
    assert rows.mx >= 1
    assert rows.dups > 0  # the corpus genuinely contains cross-doc spans


def test_dedup_keep_best_one_survivor_per_component(spark):
    res = textops.q_dedup_keep_best(spark, SF_SMALL).cache()
    try:
        per_comp = res.groupBy("comp").agg(
            F.sum("keep").alias("kept"), F.count("*").alias("sz")
        )
        assert per_comp.where(F.col("kept") != 1).count() == 0
        # the survivor has the max quality score in its component
        best = res.groupBy("comp").agg(F.max("quality_score_x1e4").alias("best"))
        bad = (
            res.where(F.col("keep") == 1)
            .join(best, "comp")
            .where(F.col("quality_score_x1e4") != F.col("best"))
            .count()
        )
        assert bad == 0
        # multi-doc components exist (the corpus has near-dups) and keep < all
        multi = per_comp.where(F.col("sz") > 1).count()
        assert multi > 0
    finally:
        res.unpersist()


def test_retention_cohort_offset_zero_is_full(spark):
    from affinity_propagation_mapreduce_spark.operators import events

    res = events.q_retention_cohort(spark, SF_SMALL).cache()
    try:
        # by construction every user is active in their own cohort week
        zero = res.where(F.col("week_offset") == 0)
        assert zero.where(F.col("n_active") != F.col("n_cohort")).count() == 0
        assert zero.where(F.col("retention_x1e4") != 10000).count() == 0
        # no cell exceeds its cohort, offsets are non-negative
        assert res.where(
            (F.col("n_active") > F.col("n_cohort")) | (F.col("week_offset") < 0)
        ).count() == 0
    finally:
        res.unpersist()


def test_event_transitions_counts_and_row_normalization(spark):
    from affinity_propagation_mapreduce_spark.operators import events

    res = events.q_event_transitions(spark, SF_SMALL).cache()
    try:
        ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
        n_events = ev.count()
        n_users = ev.select("user_id").distinct().count()
        # each user's first event has no predecessor
        total = res.agg(F.sum("n")).collect()[0][0]
        assert total == n_events - n_users
        sums = (
            res.groupBy("from_type")
            .agg(F.sum("prob_x1e4").alias("s"))
            .collect()
        )
        for r in sums:  # row-normalized up to per-cell rounding
            assert abs(r.s - 10000) <= len(sums)
    finally:
        res.unpersist()


def test_scd2_intervals_partition_active_days(spark):
    from pyspark.sql import Window

    from affinity_propagation_mapreduce_spark.operators import events

    res = events.q_scd2_user_tiers(spark, SF_SMALL).cache()
    try:
        ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
        user_days = (
            ev.select("user_id", F.date_trunc("day", "ts").alias("d"))
            .distinct()
            .count()
        )
        # intervals tile the observed user-days exactly
        assert res.agg(F.sum("n_days")).collect()[0][0] == user_days
        assert res.where(F.col("valid_from") > F.col("valid_to")).count() == 0
        # consecutive intervals of one user never share a tier (else they
        # would have been one island) and never overlap
        w = Window.partitionBy("user_id").orderBy("valid_from")
        lagged = res.select(
            "user_id",
            "tier",
            "valid_from",
            "valid_to",
            F.lag("tier").over(w).alias("prev_tier"),
            F.lag("valid_to").over(w).alias("prev_to"),
        ).where(F.col("prev_tier").isNotNull())
        assert lagged.where(F.col("prev_tier") == F.col("tier")).count() == 0
        assert lagged.where(F.col("prev_to") >= F.col("valid_from")).count() == 0
    finally:
        res.unpersist()


def test_lm_unigram_score_matches_token_count_and_bounds(spark):
    res = textops.q_lm_unigram_score(spark, SF_SMALL)
    tc = textops.q_token_count(spark, SF_SMALL).select("doc_id", "ws_tokens")
    bad = (
        res.join(tc, "doc_id")
        .where(F.col("n_tokens") != F.col("ws_tokens"))
        .count()
    )
    assert bad == 0
    # NLL under a unigram LM is bounded by [0, ln(total_tokens)]
    import math

    total = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select(F.explode(F.split("text", " ")))
        .count()
    )
    row = res.agg(
        F.min("avg_neg_logprob").alias("mn"), F.max("avg_neg_logprob").alias("mx")
    ).collect()[0]
    assert 0.0 < row.mn <= row.mx <= math.log(total) + 1e-9


def test_bm25_topk_invariants(spark):
    """BM25 top-N: scores positive and sorted; per-term contribution
    bounded by idf·(k1+1); a doc hitting all query terms with higher tf
    and shorter length than another must not score lower (monotonicity
    is checked indirectly via the exhaustive rescoring below)."""
    import math

    res = textops.q_bm25_topk(spark, SF_SMALL).collect()
    assert 0 < len(res) <= textops.BM25_TOP_N
    scores = [r.bm25 for r in res]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    assert all(1 <= r.n_terms_hit <= len(textops.BM25_QUERY) for r in res)
    # independent numpy rescoring of the full corpus reproduces the top-N
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    toks = {r.doc_id: r.text.split(" ") for r in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    k1, b = textops.BM25_K1, textops.BM25_B
    expect = []
    for doc_id, tt in toks.items():
        score, hits = 0.0, 0
        for q in textops.BM25_QUERY:
            tf = tt.count(q)
            if tf == 0:
                continue
            df = sum(1 for t2 in toks.values() if q in t2)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            dl = len(tt)
            score += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / avgdl))
            hits += 1
        if hits:
            expect.append((round(score, 4), doc_id, hits))
    expect.sort(key=lambda x: (-x[0], x[1]))
    top = expect[: textops.BM25_TOP_N]
    got = [(r.bm25, r.doc_id, r.n_terms_hit) for r in res]
    assert got == [(s, d, h) for s, d, h in top]


def test_dedup_incremental_subset_and_split_law(spark):
    """Incremental pairs must (a) be cross-split (new batch × index),
    (b) be a subset of the exact ngram-Jaccard pair relation with
    identical jaccard values, and (c) never pair two new docs."""
    from affinity_propagation_mapreduce_spark.operators.sampling import _bucket

    res = textops.q_dedup_incremental(spark, SF_SMALL).collect()
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    buckets = {
        r.doc_id: r.b
        for r in docs.select(
            "doc_id", _bucket(F.col("doc_id")).alias("b")
        ).collect()
    }
    exact = {
        (r.doc_lo, r.doc_hi): r.jaccard
        for r in textops.q_dedup_ngram_jaccard(spark, SF_SMALL).collect()
    }
    for r in res:
        assert buckets[r.new_doc_id] < textops.INCR_NEW_BUCKETS
        assert buckets[r.old_doc_id] >= textops.INCR_NEW_BUCKETS
        key = (min(r.new_doc_id, r.old_doc_id), max(r.new_doc_id, r.old_doc_id))
        assert key in exact
        assert abs(exact[key] - r.jaccard) < 1e-9
