"""Driver-style parity: every declared query vs its DuckDB oracle at
sf0.001 (fast), plus the AP kernel family at the driver's sf0.01.
Mirrors the t2 correctness gate (SURVEY.md §5.2.1)."""

from __future__ import annotations

import pytest

from affinity_propagation_mapreduce_spark import registry
from affinity_propagation_mapreduce_spark.plans.verify import compare

from .conftest import SF_SMALL, SF_T2

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()

# AP queries run the full 250k-pair kernel even at sf0.001 (embeddings is
# 500 rows at both sfs) — run the AP family at the driver's exact sf0.01
# instead of twice.  The round-1 driver hash FAIL (ap_iterate_once) was a
# query this file didn't cover: EVERY ap_* key runs here now, at the
# driver's sf, so a parity bug in the family cannot ship silently again.
# The shared kernel/state cache (ap.py) keeps the family's total cost at
# roughly one kernel + two iteration chains.
AP_KEYS = sorted(k for k in QUERIES if k.startswith("ap_"))
FAST_KEYS = sorted(k for k in QUERIES if not k.startswith("ap_"))


@pytest.mark.parametrize("name", FAST_KEYS)
def test_parity_small(spark, name):
    if name not in ORACLES:  # rows-only contract: must run and return rows
        assert QUERIES[name](spark, SF_SMALL).count() >= 0
        return
    rep = compare(name, QUERIES[name](spark, SF_SMALL), ORACLES[name], SF_SMALL)
    assert rep.ok, f"{name}: {rep.detail} {rep.mismatches[:2]}"


@pytest.mark.parametrize("name", AP_KEYS)
def test_parity_ap_t2(spark, name):
    if name not in ORACLES:  # rows-only (ap_assign_sparse)
        assert QUERIES[name](spark, SF_T2).count() >= 0
        return
    rep = compare(name, QUERIES[name](spark, SF_T2), ORACLES[name], SF_T2)
    assert rep.ok, f"{name}: {rep.detail} {rep.mismatches[:2]}"
