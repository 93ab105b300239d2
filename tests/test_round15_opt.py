"""Round-15 optimization pins: physical-shape changes must be
value-invisible.

Each optimization this round restructures HOW something is computed
(block counts, fused single-task branches, scan-free state generation)
while the produced relation must stay bitwise identical.  These tests
pin that equivalence directly against the distributed formulations the
optimizations replaced."""

from __future__ import annotations

from .conftest import SF_SMALL, SF_T2


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fused_candidate_graph_bitwise_equals_distributed(spark):
    """_knn_candidate_pairs_fused (one task, zero exchanges) must emit
    exactly the relation the distributed pipeline (ivf cell kernels →
    dedup → window top-k → symmetrize → dedup) emits — bitwise s,
    same pair set."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from affinity_propagation_mapreduce_spark.operators import ap

    k = 32
    n = ap._n_points(spark, SF_SMALL)
    assert n <= ap._BLOCKED().SPARSE_FUSED_MAX_N  # gate engages here
    fused = ap._knn_candidate_pairs_fused(spark, SF_SMALL, k, n)

    # the distributed formulation the fused branch replaced
    pairs = ap.ivf_candidate_pairs(spark, SF_SMALL, per_point_topk=k)
    sym = pairs.dropDuplicates(["i", "k"])
    w = Window.partitionBy("i").orderBy(F.desc("s"), F.asc("k"))
    topk = (
        sym.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("i", "k", "s")
    )
    back = topk.unionByName(
        topk.select(F.col("k").alias("i"), F.col("i").alias("k"), "s")
    )
    dist = back.dropDuplicates(["i", "k"])

    assert _rows(fused) == _rows(dist)


def test_knn_candidate_pairs_routes_fused_below_gate(spark):
    """Below the gate the public entry returns the single-task plan (no
    Exchange in the physical plan); the distributed path keeps its
    shuffles."""
    from affinity_propagation_mapreduce_spark.operators import ap

    plan = ap.knn_candidate_pairs(spark, SF_T2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan


def test_r_block_masked_max_equals_partition(spark):
    """The masked-max second-largest in _r_block must be bitwise equal to
    the np.partition formulation it replaced (r15 optimization: the
    partition materialized a sorted-split copy of the block per call —
    1.7 s vs 0.04 s on a 2000² block), including duplicated-maximum rows
    where the 'second largest' is the maximum itself."""
    import numpy as np

    from affinity_propagation_mapreduce_spark.operators import ap_dense

    rng = np.random.default_rng(7)
    lam = ap_dense.DAMPING
    for shape in ((50, 50), (17, 403)):
        s = rng.standard_normal(shape)
        r = rng.standard_normal(shape)
        a = rng.standard_normal(shape)
        # plant duplicated row maxima: the masked max must still return
        # the max value (one instance blanked, the duplicate remains)
        a[3] = s[3] = 1.0
        got = ap_dense._r_block(s, r, a, lam)
        n = shape[1]
        asv = a + s
        arg1 = asv.argmax(1)
        rows = np.arange(shape[0])
        m1 = asv[rows, arg1]
        m2 = np.partition(asv, n - 2, axis=1)[:, n - 2]
        excl = np.repeat(m1[:, None], n, axis=1)
        excl[rows, arg1] = m2
        want = lam * r + (1 - lam) * (s - excl)
        assert np.array_equal(got, want)


def test_table_rows_matches_count(spark):
    """Footer-metadata row counts must equal the Spark count for every
    table the gates consult."""
    from affinity_propagation_mapreduce_spark.sources import table
    from affinity_propagation_mapreduce_spark.sources.tables import table_rows

    for name in ("embeddings", "documents"):
        assert table_rows(SF_SMALL, name) == table(spark, SF_SMALL, name).count()


def test_model_memo_invalidates_on_meta_rewrite(spark, tmp_path):
    """The serving-model memo must return the NEW model after any
    mutation that rewrites meta.json (here: a direct rewrite bumping the
    mtime fingerprint), and identical arrays on a clean hit."""
    import json
    import os
    import time

    import numpy as np

    from affinity_propagation_mapreduce_spark.operators import ann_index as ann
    from affinity_propagation_mapreduce_spark.sources import table

    path = str(tmp_path / "memo-layout")
    ann.build_ann_index(
        spark, SF_SMALL, path=path,
        emb_raw=table(spark, SF_SMALL, "embeddings"),
    )
    m1 = ann.load_ann_model(spark, path)
    m2 = ann.load_ann_model(spark, path)  # memo hit
    assert m1[0] == m2[0]
    assert np.array_equal(m1[1], m2[1]) and np.array_equal(m1[2], m2[2])
    # returned meta is a caller-owned copy: mutating it must not leak
    m2[0]["n"] = -1
    assert ann.load_ann_model(spark, path)[0]["n"] != -1
    # meta.json rewrite (new mtime) invalidates the memo
    mp = os.path.join(path, "meta.json")
    with open(mp) as fh:
        meta = json.load(fh)
    meta["n"] = 12345
    time.sleep(0.01)
    with open(mp, "w") as fh:
        json.dump(meta, fh)
    assert ann.load_ann_model(spark, path)[0]["n"] == 12345
