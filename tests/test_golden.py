"""Golden-hash regression pins (SURVEY.md §5.2.4): order-insensitive
value hashes of representative queries, pinned at round 1.  A change here
means result SEMANTICS changed — update only with a reasoned commit."""

from __future__ import annotations

import hashlib

import pytest

from affinity_propagation_mapreduce_spark import registry
from affinity_propagation_mapreduce_spark.plans.verify import _rows

GOLDEN = [
    ("ap_assign", "/root/testdata/sf0.001", "c94d5ad7001bf1a5ed36344c8f7fce54"),
    ("ap_exemplars", "/root/testdata/sf0.01", "5bda8b9b9aab6e4a2e91cbbb2d3d2ee1"),
    ("pricing_summary", "/root/testdata/sf0.01", "1e4c298a9af175c50b2ce604803a2733"),
    ("dedup_exact", "/root/testdata/sf0.01", "c3b300220f993ef064f051074a68b153"),
    ("knn_cosine_topk", "/root/testdata/sf0.01", "cfa63b980c6de561a73384f38d728cca"),
    ("sessionize", "/root/testdata/sf0.01", "c0bc26c20db36023978ec009c01f1bb8"),
    ("doc_fingerprint", "/root/testdata/sf0.01", "2b57c0c23632cf1957224e9dfead18ba"),
]


@pytest.mark.parametrize("name,sf_dir,expected", GOLDEN)
def test_golden_hash(spark, name, sf_dir, expected):
    pdf = registry.queries()[name](spark, sf_dir).toPandas()
    got = hashlib.md5(repr(_rows(pdf)).encode()).hexdigest()
    assert got == expected, f"{name}@{sf_dir}: {got} != pinned {expected}"
