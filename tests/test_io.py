"""Source/sink round-trips (sources/io.py) + partition-pruning layout."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from affinity_propagation_mapreduce_spark.sources import io as eio
from affinity_propagation_mapreduce_spark.sources import table

from .conftest import SF_SMALL


def test_points_csv_roundtrip(spark):
    emb = (
        table(spark, SF_SMALL, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .limit(50)
    )
    with tempfile.TemporaryDirectory() as d:
        eio.write_points_csv(emb, f"{d}/pts")
        back = eio.read_points_csv(spark, f"{d}/pts", dims=64)
        want = {(r.vec_id, tuple(r.embedding)) for r in emb.collect()}
        got = {(r.vec_id, tuple(r.embedding)) for r in back.collect()}
        assert got == want


def test_jsonl_roundtrip(spark):
    docs = table(spark, SF_SMALL, "documents").select("doc_id", "lang", "n_chars")
    with tempfile.TemporaryDirectory() as d:
        eio.write_jsonl(docs, f"{d}/docs")
        back = eio.read_jsonl(
            spark, f"{d}/docs", "doc_id LONG, lang STRING, n_chars LONG"
        )
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, docs.collect())
        )


def test_partitioned_parquet_prunes(spark):
    docs = table(spark, SF_SMALL, "documents")
    with tempfile.TemporaryDirectory() as d:
        eio.write_partitioned_parquet(
            docs, f"{d}/bylang", partition_by=["lang"], sort_within=["doc_id"]
        )
        back = spark.read.parquet(f"{d}/bylang")
        sub = back.where(F.col("lang") == "en")
        plan = sub._jdf.queryExecution().executedPlan().toString()
        # partition filter must reach the scan, not a post-filter
        assert "PartitionFilters: [isnotnull(lang" in plan, plan
        want = docs.where(F.col("lang") == "en").count()
        assert sub.count() == want


def test_labels_export(spark):
    from affinity_propagation_mapreduce_spark.operators import ap

    # T=1 yields an empty exemplar set on this data (messages still near
    # zero) and hence an empty labeling — use T=3 like entry()
    labels = ap.cluster(spark, SF_SMALL, iterations=3)
    with tempfile.TemporaryDirectory() as d:
        eio.write_labels(labels, f"{d}/labels")
        back = spark.read.option("header", True).csv(
            f"{d}/labels", inferSchema=True
        )
        assert back.count() == 500
        assert set(back.columns) == {"vec_id", "exemplar"}
