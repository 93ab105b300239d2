"""Semi-structured operators: JSON / arrays / maps (SURVEY.md §2 C-rows).

Declared over `events` (JSON ``props``, verified single-key shape
``{"k": int}`` — FIXTURES.md fact 6) and `embeddings` (``array<float>``).
Array folds are kept sequential where values feed comparisons so both
engines agree bitwise; per-dimension stats round at 6 (group-sum drift
~1e-11 vs grid 1e-6).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources import table


# --- C1 JSON extraction + typed cast + group ------------------------------

def q_json_extract(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(k.alias("k_val"), "value")
        .groupBy("k_val")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


O_JSON_EXTRACT = """
SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
       count(*) AS n_events,
       ROUND(sum(value), 4) AS sum_value
FROM events GROUP BY 1
"""

# --- C2 array ops: size / element_at / slice / sorted array_agg -----------

def q_array_ops(spark, sf_dir):
    """Per ground-truth label: sorted id list + slices/element access.
    collect_list is made deterministic by array_sort (contract: sorted
    for determinism, SURVEY.md C2).  The array-valued columns are
    serialized to comma-joined strings at the output boundary: the
    driver's pandas canonicalizer cannot hash Python lists (round-1
    ERROR), and '1,2,3' hashes identically everywhere while the array
    machinery (collect_list/array_sort/slice/element_at) is still the
    thing under test."""
    emb = table(spark, sf_dir, "embeddings")
    ids = F.array_sort(F.collect_list("vec_id"))

    def _csv(col):
        return F.array_join(F.transform(col, lambda x: x.cast("string")), ",")

    return (
        emb.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            ids.alias("ids_sorted"),
        )
        .select(
            "label",
            "n_vecs",
            _csv("ids_sorted").alias("ids_csv"),
            F.element_at("ids_sorted", 1).alias("first_id"),
            _csv(F.slice("ids_sorted", 1, 3)).alias("first3_csv"),
            F.size("ids_sorted").cast("long").alias("n_ids"),
        )
    )


O_ARRAY_OPS = """
WITH g AS (
  SELECT label, count(*) AS n_vecs,
         list_sort(list(vec_id)) AS ids_sorted
  FROM embeddings GROUP BY label)
SELECT label, n_vecs,
       list_aggregate(list_transform(ids_sorted, x -> CAST(x AS VARCHAR)),
                      'string_agg', ',') AS ids_csv,
       ids_sorted[1] AS first_id,
       list_aggregate(list_transform(ids_sorted[1:3], x -> CAST(x AS VARCHAR)),
                      'string_agg', ',') AS first3_csv,
       CAST(len(ids_sorted) AS BIGINT) AS n_ids
FROM g
"""

# --- C3 explode / unnest (UDTF-shaped: 1 row -> 64 rows) -------------------

def q_explode_unnest(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select("vec_id", F.col("pos").cast("long").alias("dim"), F.col("col").alias("val"))
    return exploded.groupBy("dim").agg(
        F.round(F.avg("val"), 6).alias("avg_val"),
        F.round(F.stddev_samp("val"), 6).alias("std_val"),
    )


O_EXPLODE = """
WITH x AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings)
SELECT dim, ROUND(avg(val), 6) AS avg_val,
       ROUND(stddev_samp(val), 6) AS std_val
FROM x GROUP BY dim
"""

# --- C4 map / struct build + read-back -------------------------------------

def q_map_struct_ops(spark, sf_dir):
    """Build a per-user map event_type -> count via map_from_entries, then
    read entries back (explode) — proves the map machinery while emitting
    hashable value rows (map literals don't hash across engines)."""
    ev = table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("type_counts")
    )
    return as_map.select(
        "user_id",
        F.size("type_counts").cast("long").alias("n_types"),
        F.explode("type_counts").alias("event_type", "n_events"),
    )


O_MAP_STRUCT = """
WITH per_type AS (
  SELECT user_id, event_type, count(*) AS n_events
  FROM events GROUP BY user_id, event_type)
SELECT user_id,
       count(*) OVER (PARTITION BY user_id) AS n_types,
       event_type, n_events
FROM per_type
"""


# --- (⊕ r4) schema-on-read: typed from_json struct projection ---------------

def q_json_typed_struct(spark, sf_dir):
    """Schema-on-read over the JSON column: ``from_json`` with an
    explicit schema parses props ONCE into a typed struct (vs
    get_json_object's per-path re-parse in C1), then projects typed
    fields, flags corrupt/missing keys, and aggregates per decile
    bucket.  At scale the single parse + struct projection is the
    cheap shape when multiple fields come from one JSON payload."""
    ev = table(spark, sf_dir, "events")
    parsed = ev.select(
        F.from_json("props", "k BIGINT").alias("p"), "event_type"
    )
    k = F.col("p.k")
    return (
        parsed.select(
            (k % 10).alias("k_decile"),
            k.isNull().cast("int").alias("is_missing"),
            "event_type",
        )
        .groupBy("k_decile", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("is_missing").cast("long").alias("n_missing"),
        )
    )


O_JSON_TYPED = """
WITH parsed AS (
  SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, event_type
  FROM events)
SELECT k % 10 AS k_decile, event_type, count(*) AS n_events,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM parsed GROUP BY 1, 2
"""


QUERIES = {
    "json_extract": q_json_extract,
    "json_typed_struct": q_json_typed_struct,
    "array_ops": q_array_ops,
    "explode_unnest": q_explode_unnest,
    "map_struct_ops": q_map_struct_ops,
}

ORACLES = {
    "json_extract": O_JSON_EXTRACT,
    "json_typed_struct": O_JSON_TYPED,
    "array_ops": O_ARRAY_OPS,
    "explode_unnest": O_EXPLODE,
    "map_struct_ops": O_MAP_STRUCT,
}
