"""Driver-style parity: every declared query vs its DuckDB oracle at the
driver's exact sf0.01.  Mirrors the t2 correctness gate (SURVEY.md §5.2.1).

Runs at sf0.01 — NOT sf0.001 — for every key: round 2's mad_outliers
driver hash FAIL was a .885 rounding boundary that only exists at sf0.01,
so a smaller sf is not a faithful mirror of the gate."""

from __future__ import annotations

import pytest

from affinity_propagation_mapreduce_spark import registry
from affinity_propagation_mapreduce_spark.plans.verify import compare

from .conftest import SF_T2

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()

# Declared rows-only keys (non-SQL-expressible, SURVEY.md §2): the ONLY
# names allowed to lack an oracle.  A new QUERIES key missing from ORACLES
# fails test_every_query_has_oracle unless deliberately added here —
# the registration-miss class that shipped join_full_outer unverified in
# round 2 (oracle written, never registered).
ROWS_ONLY = {
    "ap_assign_sparse",        # sparse AP: no bounded-depth SQL equivalent
    "dedup_embed_cosine_ivf",  # IVF-approximate by design
    "agg_percentiles_approx",  # GK sketch: no DuckDB mirror
    "stream_batch_equiv_sessionize",  # runs a real structured stream
    "knn_cosine_ivf_trained",  # iterative centroid training: no SQL mirror
    "knn_cosine_pq",           # Lloyd-trained PQ codebooks: no SQL mirror
    "knn_cosine_ivfpq",        # composed trained quantizers: no SQL mirror
    "knn_cosine_served",       # persisted-index serving: trained quantizers
    "ann_index_stats",         # build-integrity gate over the same layout
    "ann_index_incremental",   # append round-trip gate, idempotent batches
    "ann_recall_gate",         # recall floor gate over approximate paths
    "ivf_dup_subset_gate",     # bitwise subset gate, raises on violation
    "stream_batch_equiv_gate",  # runs the five remaining streaming twins
    "ann_index_stream_ingest",  # real structured stream folds the index
    "ann_index_partial_compact",  # budgeted partial-fold gate on the layout
    "ann_index_migrate",       # quantizer retrain/cutover round-trip gate
    "media_decode_jpeg",       # lossy codec: no SQL mirror of decoded sums
}

AP_KEYS = sorted(k for k in QUERIES if k.startswith("ap_"))
FAST_KEYS = sorted(k for k in QUERIES if not k.startswith("ap_"))


def test_oracle_sf_n_matches_testdata(spark):
    """Static oracle SQL embeds nlist evaluated at ORACLE_SF_N while the
    Spark side computes it from the live row count — they only agree if
    this constant matches the actual sf0.01 embeddings table.  The
    driver regenerates testdata every round; this tripwire turns a
    silent hash divergence (knn_cosine_ivf, ap_assign_sparse_checked)
    into an actionable round-start failure."""
    from affinity_propagation_mapreduce_spark.operators.ivf import ORACLE_SF_N
    from affinity_propagation_mapreduce_spark.sources import table

    n = table(spark, SF_T2, "embeddings").count()
    assert n == ORACLE_SF_N, (
        f"sf0.01 embeddings has {n} rows but ORACLE_SF_N={ORACLE_SF_N}: "
        "update operators/ivf.py and re-verify the IVF-family oracles"
    )


def test_every_query_has_oracle():
    missing = sorted(k for k in QUERIES if k not in ORACLES and k not in ROWS_ONLY)
    assert not missing, f"queries without a registered oracle: {missing}"
    stale = sorted(k for k in ROWS_ONLY if k in ORACLES or k not in QUERIES)
    assert not stale, f"ROWS_ONLY entries that now have oracles / vanished: {stale}"


@pytest.mark.parametrize("name", FAST_KEYS)
def test_parity_small(spark, name):
    if name not in ORACLES:  # rows-only contract: must run and return rows
        assert QUERIES[name](spark, SF_T2).count() >= 0
        return
    rep = compare(name, QUERIES[name](spark, SF_T2), ORACLES[name], SF_T2)
    assert rep.ok, f"{name}: {rep.detail} {rep.mismatches[:2]}"


@pytest.mark.parametrize("name", AP_KEYS)
def test_parity_ap_t2(spark, name):
    if name not in ORACLES:  # rows-only (ap_assign_sparse)
        assert QUERIES[name](spark, SF_T2).count() >= 0
        return
    rep = compare(name, QUERIES[name](spark, SF_T2), ORACLES[name], SF_T2)
    assert rep.ok, f"{name}: {rep.detail} {rep.mismatches[:2]}"
