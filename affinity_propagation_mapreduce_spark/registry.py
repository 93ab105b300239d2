"""Central query/oracle registry — the single source for
__spark_entry__.py, tests, and bench.py.

Each operator module contributes QUERIES / ORACLES dicts; names are the
SURVEY.md §2 operator ids.  A name present in QUERIES but absent from
ORACLES is a declared rows-only check (non-SQL-expressible op).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_OPERATOR_MODULES = [
    "affinity_propagation_mapreduce_spark.operators.relational",
    "affinity_propagation_mapreduce_spark.operators.sampling",
    "affinity_propagation_mapreduce_spark.operators.curation",
    "affinity_propagation_mapreduce_spark.operators.semistructured",
    "affinity_propagation_mapreduce_spark.operators.events",
    "affinity_propagation_mapreduce_spark.operators.udfops",
    "affinity_propagation_mapreduce_spark.operators.multimodal",
    "affinity_propagation_mapreduce_spark.operators.vector",
    "affinity_propagation_mapreduce_spark.operators.textops",
    "affinity_propagation_mapreduce_spark.operators.ap",
]


# The driver's correctness gate walks queries() in insertion order under a
# hard 50-ENTRY cap (r1/r2/r3 each recorded exactly 50 rows regardless of
# per-entry cost — the cap is count-based, not time-based).  Rotation
# policy, round 4: the 13 keys no round has ever checked go first, then
# every key not yet driver-proven (i.e. anything added this round —
# membership in _PROVEN is the discriminator, so new operators need no
# registry edit), then the proven tail re-proves as budget allows.
_PRIORITY = [
    # --- never driver-checked through round 3 ---
    "funnel_conversion", "ewma_smooth", "resample_ffill",
    "udf_map_in_arrow", "udtf_lateral_tokenize",
    "media_decode_features", "media_frame_sample",
    "dedup_embed_cosine_ivf", "dedup_ngram_jaccard", "pagerank_neardup",
    "token_count", "doc_fingerprint", "ap_assign_sparse",
]


def _load() -> tuple[dict, dict]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for modname in _OPERATOR_MODULES:
        try:
            mod = importlib.import_module(modname)
        except ModuleNotFoundError:
            continue  # module not built yet (incremental rounds)
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {modname}")
            queries[name] = fn
        oracles.update(getattr(mod, "ORACLES", {}))
    # never-checked keys first, then anything not yet driver-proven (new
    # operators land here automatically), then the proven tail.  Rows-only
    # keys record "err no_oracle" if the driver reaches them — that is the
    # declared weaker check, not a failure.
    prio = {k: i for i, k in enumerate(_PRIORITY)}
    names = sorted(
        queries,
        key=lambda k: (
            0 if k in prio else (1 if k not in _PROVEN else 2),
            prio.get(k, 0),
        ),
    )
    queries = {k: queries[k] for k in names}
    return queries, oracles


# Keys with a green driver row in CORRECTNESS_r01/r02/r03.json (rows_match
# with no error) — already proven; they take the tail slots of the rotation.
_PROVEN = frozenset({
    # r2 green (relational / sampling / curation front block)
    "scan_project_filter", "pivot_status", "unpivot_metrics",
    "pricing_summary", "join_inner_equi", "join_broadcast_star",
    "join_left_outer", "join_semi", "join_anti", "join_range_theta",
    "join_asof", "join_cross_small", "agg_distinct", "agg_distinct_kmv",
    "fuzzy_name_match", "agg_grouping_sets", "agg_percentiles", "agg_stats",
    "agg_conditional", "win_rank_topk_per_group", "win_lag_lead",
    "win_frame_moving", "win_ntile_pctrank", "sort_limit_topk", "set_union",
    "set_intersect", "set_except", "set_intersect_all", "set_except_all",
    "profile_columns", "hist_equiwidth", "scalar_string", "scalar_datetime",
    "scalar_math", "scalar_conditional_null", "subquery_scalar_in",
    "sample_hash", "pii_scrub", "decontaminate_eval", "zipf_topk",
    # r3 green (AP core, C/D/E/F/G families, r2 fixes, extension reps)
    "ap_similarity", "ap_preference", "ap_responsibility", "ap_availability",
    "ap_iterate_once", "ap_exemplars", "ap_assign", "ap_cluster_stats",
    "ap_convergence", "ap_pref_sweep", "json_extract", "array_ops",
    "explode_unnest", "map_struct_ops", "tok_wordcount", "tfidf_topterms",
    "ngrams_bigram", "dedup_exact", "dedup_near_jaccard", "text_profile",
    "knn_cosine_topk", "dist_histogram", "label_centroids", "win_tumbling",
    "win_sliding", "sessionize", "late_data_watermark", "dedup_stateful",
    "topk_users_window", "udf_scalar_pandas", "udaf_grouped_agg",
    "udtf_grouped_map", "join_full_outer", "agg_distinct_approx",
    "mad_outliers", "sample_stratified", "split_train_val_test",
    "corpus_mixture", "pack_sequences", "pack_sequences_sharded",
    "vocab_prune", "embed_feature_hash", "dedup_near_minhash",
    "dedup_components", "dedup_embed_cosine", "knn_cosine_ivf",
    "lang_id_ngram", "text_quality_score", "media_profile",
    "media_fingerprint",
    # r1 green not re-listed above
    "dedup_simhash",
})


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _load()[0]


def oracle_sql() -> dict[str, str]:
    q, o = _load()
    return {name: sql for name, sql in o.items() if name in q}
