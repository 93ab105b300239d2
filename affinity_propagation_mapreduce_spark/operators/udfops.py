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


QUERIES = {
    "udf_scalar_pandas": q_udf_scalar_pandas,
    "udaf_grouped_agg": q_udaf_grouped_agg,
    "udtf_grouped_map": q_udtf_grouped_map,
}

ORACLES = {
    "udf_scalar_pandas": O_UDF_SCALAR,
    "udaf_grouped_agg": O_UDAF,
    "udtf_grouped_map": O_UDTF,
}
