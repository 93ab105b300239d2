"""UDF / UDAF / UDTF surface (SURVEY.md §2 G-rows).

These rows exist to prove the Arrow-batched Python path — scalar
pandas_udf (G1), grouped-agg pandas_udf (G2), applyInPandas grouped-map
(G3).  Their oracles are the equivalent pure-SQL math: hash parity shows
the UDF machinery computes the declared relational semantics.

numpy reductions (np.dot, np.mean) use pairwise/BLAS accumulation —
NOT the oracle's sequential fold — so every UDF output is rounded at 6
(drift ~1e-13 vs grid 1e-6).  Row-at-a-time Python UDFs are deliberately
absent: Arrow-batched is the only sane Python path at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..sources import table


def _emb(spark, sf_dir):
    return table(spark, sf_dir, "embeddings")


@F.pandas_udf(DoubleType())
def l2_norm_udf(embs: pd.Series) -> pd.Series:
    """Arrow-batched L2 norm, fully vectorized: one (batch × dims) numpy
    matrix op per Arrow batch — no per-row Python (`Series.apply` is a
    Python loop inside the batch, 10-50× slower for wide batches)."""
    mat = np.stack(embs.to_numpy()).astype("f8")
    return pd.Series(np.sqrt(np.einsum("ij,ij->i", mat, mat)))


@F.pandas_udf(DoubleType())
def mean_udaf(values: pd.Series) -> float:
    """Grouped-agg pandas UDF (UDAF shape): numpy mean of the group."""
    return float(np.mean(values.to_numpy(dtype="f8")))


# --- G1 scalar pandas UDF -----------------------------------------------------

def q_udf_scalar_pandas(spark, sf_dir):
    return _emb(spark, sf_dir).select(
        "vec_id", F.round(l2_norm_udf("embedding"), 6).alias("norm")
    )


_NORM_SQL = (
    "sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x),"
    " (a, b) -> a + b))"
)

O_UDF_SCALAR = f"""
SELECT vec_id, ROUND({_NORM_SQL}, 6) AS norm FROM embeddings
"""

# --- G2 grouped-agg pandas UDF (UDAF) ----------------------------------------

def q_udaf_grouped_agg(spark, sf_dir):
    emb = _emb(spark, sf_dir).withColumn("norm", l2_norm_udf("embedding"))
    return emb.groupBy("label").agg(
        F.round(mean_udaf("norm"), 6).alias("mean_norm")
    )


O_UDAF = f"""
SELECT label, ROUND(avg({_NORM_SQL}), 6) AS mean_norm
FROM embeddings GROUP BY label
"""

# --- G3 grouped-map applyInPandas (UDTF / gapply shape) ----------------------

def q_udtf_grouped_map(spark, sf_dir):
    """Per-label z-score of the vector norms via applyInPandas.  The norm
    itself comes from the JVM sequential fold (bitwise = oracle); the
    pandas stage contributes the grouped mean/std — the grouped-map
    machinery under test."""
    sq_norm = F.aggregate(
        F.transform(F.col("embedding").cast("array<double>"), lambda x: x * x),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    emb = _emb(spark, sf_dir).select(
        "vec_id", "label", F.sqrt(sq_norm).alias("norm")
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        norms = pdf["norm"].to_numpy(dtype="f8")
        mu = norms.mean()
        sd = norms.std(ddof=1)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "label": pdf["label"],
                "z_norm": (norms - mu) / sd,
            }
        )

    # round JVM-side at 5 (np.round is half-to-even; and numpy-vs-SQL moment
    # drift ~1e-9 sits exactly on a 1e-6 half-boundary for one sf0.01 row)
    return emb.groupBy("label").applyInPandas(
        zscore, schema="vec_id long, label int, z_norm double"
    ).select("vec_id", "label", F.round("z_norm", 5).alias("z_norm"))


O_UDTF = f"""
WITH n AS (SELECT vec_id, label, {_NORM_SQL} AS norm FROM embeddings)
SELECT vec_id, label,
       ROUND((norm - avg(norm) OVER (PARTITION BY label))
             / stddev_samp(norm) OVER (PARTITION BY label), 5) AS z_norm
FROM n
"""


# --- G4 mapInArrow: the lowest-overhead Python batch path --------------------

def q_udf_map_in_arrow(spark, sf_dir):
    """Per-vector element sum via ``mapInArrow`` — the Python interop
    path with the least conversion overhead (RecordBatch in, RecordBatch
    out; no pandas materialization).  The sum accumulates
    dimension-sequentially in float64, the same IEEE add order as the
    engine's ``F.aggregate`` fold and DuckDB's ``list_reduce`` — bitwise
    parity, no rounding."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")

    def batch_sum(batches):
        for rb in batches:
            col = rb.column(1)
            flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
            n_rows = len(col)
            mat = flat.astype("f8").reshape(n_rows, -1)
            acc = np.zeros(n_rows, dtype="f8")
            for j in range(mat.shape[1]):  # sequential over dims == fold
                acc += mat[:, j]
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), pa.array(acc, type=pa.float64())],
                names=["vec_id", "esum"],
            )

    return emb.mapInArrow(batch_sum, schema="vec_id long, esum double")


O_MAP_IN_ARROW = """
SELECT vec_id,
       list_reduce(CAST(embedding AS DOUBLE[]), (a, b) -> a + b) AS esum
FROM embeddings
"""

# --- G5 Python UDTF (lateral table function, Arrow-optimized) ----------------

def q_udtf_lateral_tokenize(spark, sf_dir):
    """Positional tokenizer as a true Python UDTF (Spark 4 ``@udtf``)
    applied laterally: one input doc row → one output row per token with
    its position.  Registered and invoked through SQL LATERAL, the
    declared UDTF surface beyond the grouped-map shape (G3)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string", useArrow=True)
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    spark.udtf.register("tokenize_udtf", Tokenize)
    table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf_in")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM docs_udtf_in d, LATERAL tokenize_udtf(d.text) t
        """
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")


O_UDTF_LATERAL = """
SELECT doc_id,
       CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS BIGINT) AS pos,
       unnest(string_split(text, ' ')) AS token
FROM documents
"""


QUERIES = {
    "udf_scalar_pandas": q_udf_scalar_pandas,
    "udaf_grouped_agg": q_udaf_grouped_agg,
    "udtf_grouped_map": q_udtf_grouped_map,
    "udf_map_in_arrow": q_udf_map_in_arrow,
    "udtf_lateral_tokenize": q_udtf_lateral_tokenize,
}

ORACLES = {
    "udf_scalar_pandas": O_UDF_SCALAR,
    "udaf_grouped_agg": O_UDAF,
    "udtf_grouped_map": O_UDTF,
    "udf_map_in_arrow": O_MAP_IN_ARROW,
    "udtf_lateral_tokenize": O_UDTF_LATERAL,
}
