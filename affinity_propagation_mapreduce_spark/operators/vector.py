"""Vector similarity-search operators (SURVEY.md §2 E-rows) over
`embeddings` — the ANN/similarity surface the north star adds.

All dot products / norms / squared distances are *sequential* float64
folds (``F.aggregate`` over ``zip_with``), bitwise-identical to DuckDB's
``list_reduce`` — so cosine scores and L2 distances hash exactly with no
rounding, and top-k selections agree without tolerance games.

Scale path: ``knn_cosine_topk`` prunes candidates to the (broadcast)
query set before any pairwise math — the all-pairs shape only ever
touches |Q|·N rows, not N².  For N beyond memory, the same kernel runs
per-bucket after an LSH/IVF partitioner (see textops.q_dedup_near_minhash
for the banded-LSH candidate pattern)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources import table
from .ivf import ORACLE_SF_N, cost_balanced_nlist

N_QUERIES = 10  # fixed query ids 0..9 (deterministic contract)
TOP_K = 5
HIST_ID_RANGE = 100  # E2: pairwise distances over vec_id < 100


def _emb(spark, sf_dir) -> DataFrame:
    return table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label"
    )


def _fold_sum(arr_col):
    """Sequential left fold sum — bitwise reproducible cross-engine."""
    return F.aggregate(arr_col, F.lit(0.0), lambda acc, v: acc + v)


def _dot(a, b):
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def _sq_l2(a, b):
    return _fold_sum(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)))


# --- E1 brute-force cosine top-k for a fixed query set ----------------------

def q_knn_cosine_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    norms = emb.select(
        "vec_id",
        "emb",
        F.sqrt(_fold_sum(F.transform("emb", lambda x: x * x))).alias("nrm"),
    )
    q = norms.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cand = norms.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
    scored = (
        cand.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", F.col("rn").cast("long").alias("rn"))
    )


O_KNN = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x),
                          (a, b) -> a + b)) AS nrm
  FROM embeddings),
q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm
      FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         list_reduce(list_transform(list_zip(q.q_emb, c.emb), p -> p[1]*p[2]),
                     (a, b) -> a + b) / (q.q_nrm * c.nrm) AS cosine
  FROM q JOIN e c ON q.query_id <> c.vec_id)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER w AS BIGINT) AS rn
FROM scored
WINDOW w AS (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC)
QUALIFY row_number() OVER w <= {TOP_K}
"""

# --- E1b filtered exact top-k (the filtered-ANN oracle path) -----------------

# qualifying-neighbor predicate for the declared filtered-search key:
# label % 3 == 0 keeps 4 of the 10 balanced ground-truth classes
# (~40% selectivity — under the pre/post crossover, so the coded rule
# picks the pre-filter and the gate exercises a real widened-probe scan)
FILTER_LABEL_MOD = 3


def exact_knn_cosine_filtered(spark, sf_dir, k: int = TOP_K):
    """Exact filter→rank top-k: q_knn_cosine_topk with the CANDIDATE
    side restricted to the metadata predicate (label % FILTER_LABEL_MOD
    == 0).  SQL-expressible — the hashed oracle path that anchors the
    approximate filtered serving in ann_index.serve_topk_filtered."""
    emb = _emb(spark, sf_dir)
    norms = emb.select(
        "vec_id",
        "emb",
        "label",
        F.sqrt(_fold_sum(F.transform("emb", lambda x: x * x))).alias("nrm"),
    )
    q = norms.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cand = norms.where(F.col("label") % FILTER_LABEL_MOD == 0).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
    scored = (
        cand.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rn").cast("long").alias("rn"))
    )


O_KNN_FILTERED = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x),
                          (a, b) -> a + b)) AS nrm
  FROM embeddings),
q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm
      FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         list_reduce(list_transform(list_zip(q.q_emb, c.emb), p -> p[1]*p[2]),
                     (a, b) -> a + b) / (q.q_nrm * c.nrm) AS cosine
  FROM q JOIN e c ON q.query_id <> c.vec_id AND c.label % {FILTER_LABEL_MOD} = 0)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER w AS BIGINT) AS rn
FROM scored
WINDOW w AS (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC)
QUALIFY row_number() OVER w <= {TOP_K}
"""

# --- E2 pairwise L2 distance histogram --------------------------------------

def q_dist_histogram(spark, sf_dir):
    emb = _emb(spark, sf_dir).where(F.col("vec_id") < HIST_ID_RANGE)
    a = emb.select(F.col("vec_id").alias("i"), F.col("emb").alias("ea"))
    b = emb.select(F.col("vec_id").alias("k"), F.col("emb").alias("eb"))
    dist = F.sqrt(_sq_l2(F.col("ea"), F.col("eb")))
    return (
        a.crossJoin(b)
        .where(F.col("i") < F.col("k"))
        .select(F.floor(dist * 4).cast("long").alias("dist_bucket"))
        .groupBy("dist_bucket")
        .agg(F.count("*").alias("n_pairs"))
    )


O_DIST_HIST = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings WHERE vec_id < {HIST_ID_RANGE}),
pairs AS (
  SELECT CAST(floor(4 * sqrt(list_reduce(
           list_transform(list_zip(a.emb, b.emb), p -> (p[1]-p[2])*(p[1]-p[2])),
           (x, y) -> x + y))) AS BIGINT) AS dist_bucket
  FROM e a JOIN e b ON a.vec_id < b.vec_id)
SELECT dist_bucket, count(*) AS n_pairs FROM pairs GROUP BY dist_bucket
"""

# --- E3 per-label centroids + distance to own centroid ----------------------

def q_label_centroids(spark, sf_dir):
    """AP quality cross-check against ground-truth labels: centroid by
    per-dimension mean, then each point's L2 distance to its centroid.
    Centroid means and the 64-term distance sum are group aggregations
    (engine-ordered) → round 6 on both sides."""
    emb = _emb(spark, sf_dir)
    exploded = emb.select(
        "vec_id", "label", F.posexplode("emb")
    ).select("vec_id", "label", F.col("pos").alias("dim"), F.col("col").alias("val"))
    centroids = exploded.groupBy("label", "dim").agg(F.avg("val").alias("cval"))
    joined = exploded.join(centroids, ["label", "dim"])
    sq = (F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))
    return (
        joined.groupBy("vec_id", "label")
        .agg(F.round(F.sqrt(F.sum(sq)), 6).alias("dist_to_centroid"))
    )


O_CENTROIDS = """
WITH x AS (
  SELECT vec_id, label,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings),
c AS (SELECT label, dim, avg(val) AS cval FROM x GROUP BY label, dim)
SELECT x.vec_id, x.label,
       ROUND(sqrt(sum((x.val - c.cval) * (x.val - c.cval))), 6) AS dist_to_centroid
FROM x JOIN c ON x.label = c.label AND x.dim = c.dim
GROUP BY x.vec_id, x.label
"""


# --- E4 IVF-bucketed ANN (rows-only; the beyond-memory scale path) ----------

N_PROBE = 4  # buckets probed per query


def _ivf_knn(spark, sf_dir, coarse):
    """IVF-style approximate top-k against an arbitrary coarse quantizer
    ``coarse`` (cell, c_emb, c_nrm): every vector is indexed in its
    nearest cell; each query probes only its N_PROBE nearest cells, so
    the pairwise work drops from |Q|·N to |Q|·nprobe·N/nlist.  At 100 TB
    the cell id is the shuffle/partition key — queries and candidates
    co-locate per cell and no task sees the full corpus."""
    emb = _emb(spark, sf_dir)
    norms = emb.select(
        "vec_id",
        "emb",
        F.sqrt(_fold_sum(F.transform("emb", lambda x: x * x))).alias("nrm"),
    )
    return _ivf_knn_frames(norms, coarse, F.col("vec_id") < N_QUERIES)


def _coarse_topn_cells(norms, coarse, n_probe):
    """Arrow-batched coarse assignment: for every vector the ``n_probe``
    nearest cells by (cosine DESC, cell ASC), BITWISE-equal to the
    declarative ``crossJoin + fold-dot + row_number`` formulation the
    oracle mirrors:

    * the dot product accumulates SEQUENTIALLY over dimensions
      (``acc = acc + x_j·y_j`` for j = 0..d−1, vectorized across the
      row batch) — the identical float64 operation sequence per
      (vector, cell) as ``F.aggregate(zip_with(...))``, so every
      ``cell_cos`` is the same double;
    * ties break by a STABLE argsort on −cos over cell-ascending
      columns — exactly ``row_number() OVER (ORDER BY cos DESC,
      cell ASC)``.

    Why not the crossJoin itself: higher-order-function lambdas are
    interpreted per element (never codegen'd), so the N·nlist coarse
    pass costs ~5·10⁹ interpreted evals at N=200k (measured 471 s
    end-to-end); this kernel does the same math in numpy at memory
    bandwidth (measured 35 s end-to-end, identical hashes).  The
    centroid collect is O(nlist·d) = O(√N) — the same order as the
    broadcast it replaces."""
    import numpy as np

    rows = coarse.select("cell", "c_emb", "c_nrm").collect()
    rows.sort(key=lambda r: r.cell)
    cells = np.array([r.cell for r in rows], dtype="i8")
    cmat = np.array([list(r.c_emb) for r in rows], dtype="f8")
    cnrm = np.array([r.c_nrm for r in rows], dtype="f8")
    k = min(n_probe, len(cells))
    schema = (
        "vec_id long, emb array<double>, nrm double, "
        "cell long, cell_cos double, crn int"
    )

    # bound per-task transient memory regardless of quantizer size:
    # three (chunk × nlist) matrices coexist at peak (the score matrix
    # reused in place for cos, its negation for the stable argsort, and
    # argsort's int64 index matrix) — 8M doubles each ⇒ ~192 MB.  At
    # nlist = 20k (N ≈ 10⁸) an unchunked 10k-row Arrow batch would
    # instead allocate multiple 1.6 GB matrices per task.
    chunk_rows = max(256, 8_000_000 // max(1, len(cells)))

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            for lo in range(0, len(pdf), chunk_rows):
                part = pdf.iloc[lo : lo + chunk_rows]
                if len(part) == 0:
                    continue
                x = np.array([list(e) for e in part["emb"]], dtype="f8")
                nrm = part["nrm"].to_numpy(dtype="f8")
                acc = np.zeros((len(part), len(cells)), dtype="f8")
                for j in range(x.shape[1]):  # sequential over dims = the fold
                    acc += x[:, j : j + 1] * cmat[:, j]
                cos = np.divide(acc, nrm[:, None] * cnrm[None, :], out=acc)
                neg = np.negative(cos)
                idx = np.argsort(neg, axis=1, kind="stable")[:, :k]
                del neg
                b = len(part)
                yield pd.DataFrame(
                    {
                        "vec_id": part["vec_id"].to_numpy().repeat(k),
                        "emb": [e for e in part["emb"] for _ in range(k)],
                        "nrm": nrm.repeat(k),
                        "cell": cells[idx].reshape(b * k),
                        "cell_cos": np.take_along_axis(cos, idx, axis=1)
                        .reshape(b * k),
                        "crn": np.tile(np.arange(1, k + 1, dtype="i4"), b),
                    }
                )

    return norms.select("vec_id", "emb", "nrm").mapInPandas(kernel, schema)


def _ivf_knn_frames(norms, coarse, is_query):
    """Core IVF top-k pipeline over prepared frames: ``norms`` is
    (vec_id, emb, nrm), ``coarse`` is (cell, c_emb, c_nrm), ``is_query``
    a boolean Column selecting the query rows."""
    ranked = _coarse_topn_cells(norms, coarse, N_PROBE).localCheckpoint(
        eager=False  # one coarse pass feeds both consumers below
    )
    assignment = ranked.where(F.col("crn") == 1).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
        "cell",
    )
    probes = ranked.where((F.col("crn") <= N_PROBE) & is_query).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        "cell",
    )
    cos = _dot(F.col("q_emb"), F.col("n_emb")) / (F.col("q_nrm") * F.col("n_nrm"))
    cand = probes.join(assignment, "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", cos.alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", F.col("rn").cast("long").alias("rn"))
    )


def _lowid_coarse(spark, sf_dir, nlist):
    """The nlist lowest-id vectors as pseudo-centroids — deterministic,
    training-free, and exactly mirrorable in oracle SQL."""
    emb = _emb(spark, sf_dir)
    return (
        emb.where(F.col("vec_id") < nlist)
        .select(
            F.col("vec_id").alias("cell"),
            F.col("emb").alias("c_emb"),
            F.sqrt(_fold_sum(F.transform("emb", lambda x: x * x))).alias("c_nrm"),
        )
    )


def _trained_coarse(spark, sf_dir, nlist):
    """Sampled-Lloyd trained centroids (operators/ivf.py) as a coarse
    DataFrame — the production quantizer for clustered data; not
    oracle-mirrorable (iterative), so used by rows-only paths and the
    recall comparison test."""
    from .ivf import train_centroids

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = train_centroids(emb, nlist)
    rows = [
        (i, [float(x) for x in c], float((c * c).sum() ** 0.5))
        for i, c in enumerate(cent)
    ]
    return spark.createDataFrame(
        rows, "cell long, c_emb array<double>, c_nrm double"
    )


def q_knn_cosine_ivf(spark, sf_dir):
    """IVF approximate top-k with the lowest-id coarse quantizer and a
    cost-balanced nlist = sqrt(nprobe·N) (operators/ivf.py): coarse
    scoring is O(N·sqrt(N)) and cells hold ~sqrt(N/nprobe) members, so
    no stage is quadratic — the earlier fixed nlist=16 meant O(N)-sized
    cells and an O(N²/16) within-cell join.  The whole pipeline is
    deterministic fold arithmetic with id tie-breaks, so the oracle
    mirrors the same approximation and the gate hash-checks it; recall
    vs the exact `knn_cosine_topk` (and vs the trained quantizer) is
    asserted in tests."""
    from .ivf import corpus_rows, cost_balanced_nlist

    nlist = cost_balanced_nlist(corpus_rows(spark, sf_dir), N_PROBE)
    return _ivf_knn(spark, sf_dir, _lowid_coarse(spark, sf_dir, nlist))


def knn_cosine_ivf_trained(spark, sf_dir):
    """Production-quality variant: same IVF pipeline over sampled-Lloyd
    trained centroids.  No SQL mirror (training is iterative); recall vs
    exact is asserted in test_ann_recall."""
    from .ivf import corpus_rows, cost_balanced_nlist

    nlist = cost_balanced_nlist(corpus_rows(spark, sf_dir), N_PROBE)
    return _ivf_knn(spark, sf_dir, _trained_coarse(spark, sf_dir, nlist))


# the in-query recall gate runs the exact O(N²) top-k as its reference,
# so it is size-gated to verification scale (driver runs at sf0.01,
# N=500; tests at sf0.001) — above it the standalone ann_recall_gate and
# the growth-law tests carry the quality contract
_TRAINED_GATE_MAX_N = 5_000


def q_knn_cosine_ivf_trained(spark, sf_dir):
    """Rows-only, SELF-VERIFYING (r7 verdict #5): the declared query now
    computes recall against the exact brute-force top-k in-query and
    RAISES below RECALL_FLOORS['knn_cosine_ivf_trained'] — a collapsed
    quantizer turns the driver row red instead of passing a silent
    rows-only check.  Result rows/schema are identical to the raw
    variant."""
    from .ivf import corpus_rows

    res = knn_cosine_ivf_trained(spark, sf_dir)
    if corpus_rows(spark, sf_dir) <= _TRAINED_GATE_MAX_N:
        res = res.localCheckpoint(eager=False)  # gate + result: one compute
        exact = q_knn_cosine_topk(spark, sf_dir).select(
            "query_id", "neighbor_id"
        )
        n = exact.count()
        hit = exact.join(
            res.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        ).count()
        floor = RECALL_FLOORS["knn_cosine_ivf_trained"]
        if n == 0 or hit / n < floor:
            raise AssertionError(
                f"trained IVF recall collapsed: {hit}/{n} vs floor {floor}"
            )
    return res


O_KNN_IVF_NLIST = cost_balanced_nlist(ORACLE_SF_N, N_PROBE)

O_KNN_IVF = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x),
                          (a, b) -> a + b)) AS nrm
  FROM embeddings),
coarse AS (
  SELECT vec_id AS cell, emb AS c_emb, nrm AS c_nrm FROM e
  WHERE vec_id < {O_KNN_IVF_NLIST}),
scored_cells AS (
  SELECT e.vec_id, e.emb, e.nrm, c.cell,
         list_reduce(list_transform(list_zip(e.emb, c.c_emb), z -> z[1]*z[2]),
                     (a, b) -> a + b) / (e.nrm * c.c_nrm) AS cell_cos
  FROM e CROSS JOIN coarse c),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cell_cos DESC, cell ASC) AS crn
  FROM scored_cells),
assignment AS (
  SELECT vec_id AS neighbor_id, emb AS n_emb, nrm AS n_nrm, cell
  FROM ranked WHERE crn = 1),
probes AS (
  SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm, cell
  FROM ranked WHERE crn <= {N_PROBE} AND vec_id < {N_QUERIES}),
cand AS (
  SELECT DISTINCT p.query_id, a.neighbor_id,
         list_reduce(list_transform(list_zip(p.q_emb, a.n_emb), z -> z[1]*z[2]),
                     (x, y) -> x + y) / (p.q_nrm * a.n_nrm) AS cosine
  FROM probes p JOIN assignment a USING (cell)
  WHERE p.query_id <> a.neighbor_id)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER w AS BIGINT) AS rn
FROM cand
WINDOW w AS (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC)
QUALIFY row_number() OVER w <= {TOP_K}
"""


# --- (⊕ r8) E6 product-quantized ANN (PQ + ADC: the memory-compression path) -

PQ_M = 16        # subspaces over d=64 → 4 dims per sub-quantizer
PQ_KSUB = 256    # codewords per subspace (8 bits/code — the standard PQ byte)
PQ_TRAIN_SAMPLE = 4096
IVFPQ_QUERY_PROBE = 8   # query-side cells probed by knn_cosine_ivfpq
PQ_SHORTLIST = 50       # ADC survivors per query fed to exact re-ranking ...
PQ_SHORTLIST_FRAC = 2500  # ... grown to N/2500 at scale: the shortlist must
                          # out-resolve ADC ties inside dense clusters
                          # (measured on the 500k synth corpus: recall@5
                          # 0.24 at shortlist=50 vs 0.96 at 200)
_PQ_GATE_MAX_N = 5_000


def _pq_train_codebooks(spark, sf_dir, emb=None):
    """Deterministic per-subspace Lloyd codebooks on an md5-ordered
    sample — the PQ analogue of ivf.train_centroids (same bounded-sample
    shortcut, same lowest-id init, empty cells keep their codeword).
    Driver cost is O(sample·d) bytes; the returned codebooks are
    M·KSUB·(d/M) doubles (= d·KSUB, ~16 KB here) — broadcastable at any
    corpus size.  ``emb`` (vec_id, embedding) overrides the corpus
    (incremental index builds train on their base subset)."""
    import numpy as np

    if emb is None:
        emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    from .ivf import md5_sample_rows

    # scale-safe sampler: hash-threshold pre-filter, sample identical
    # to the plain orderBy+limit (see md5_sample_rows)
    rows = md5_sample_rows(emb, PQ_TRAIN_SAMPLE)
    pts = np.array([list(r.embedding) for r in rows], dtype="f8")
    d = pts.shape[1]
    # adapt the subspace count to the dimension: PQ_M when it divides d
    # with >=2 dims per subspace (d=64 -> 16x4), else the largest such
    # divisor (scale corpora are d=16 -> 8x2; the earlier >=4 rule gave
    # them only 4 subspaces and recall collapsed to 0.08 at N=500k).
    # ABOVE d=64 the subspace width must stay at 2 (r11 offline sweep on
    # the 1M d=128 corpus: recall@5 0.96 at dsub=2 vs 0.30 at dsub=4 and
    # 0.04 at dsub=8 — per-subspace ADC distortion grows with width
    # while the discriminating signal thins with d; d<=64 keeps the
    # measured-good PQ_M cap, 0.92-0.96 recall to 50M vectors).  Code
    # bytes grow to d/2 (d=128 -> 64 B vs 512 B raw f4: ~7x, still
    # shortlist+rerank-bounded).
    m_eff = d // 2 if d > 64 else PQ_M
    while m_eff > 1 and (d % m_eff != 0 or d // m_eff < 2):
        m_eff //= 2
    # an odd (or otherwise 2-indivisible) d > 64 collapses the halving
    # loop to m_eff=1, i.e. ONE d-wide "subspace" — recall death by
    # construction (the exact failure the dsub=2 rule exists to prevent).
    # Refuse loudly rather than build a recall-dead index; callers with
    # odd-d corpora should pad to even d upstream (advice r11 / verdict
    # what's-wrong #3).
    if d > 64 and m_eff < d // 4:
        raise ValueError(
            f"PQ subspace rule degenerates at d={d} (m_eff={m_eff}, "
            f"dsub={d // m_eff}): d is not divisible into 2-dim "
            "subspaces; pad the embedding to an even/composite "
            "dimension before indexing"
        )
    dsub = d // m_eff
    k = min(PQ_KSUB, len(pts))
    books = np.empty((m_eff, k, dsub), dtype="f8")
    for m in range(m_eff):
        sub = pts[:, m * dsub : (m + 1) * dsub]
        cent = sub[:k].copy()
        for _ in range(4):
            d2 = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2.0 * sub @ cent.T
                + (cent * cent).sum(axis=1)[None, :]
            )
            assign = d2.argmin(axis=1)
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[m] = cent
    return books


def knn_cosine_pq(spark, sf_dir):
    """PQ/ADC shortlist + exact re-rank top-k (the Jégou et al. 2011
    search recipe): every corpus vector is compressed to PQ_M
    sub-quantizer byte codes plus its true norm (16 + 8 B vs 512 B of
    float64 — a ~21× memory cut), each query scores the WHOLE corpus
    through an (M × KSUB) lookup table of query-sub × codeword dot
    products (asymmetric distance computation — no decompression, no
    candidate join), and only the per-query ADC shortlist
    (max(PQ_SHORTLIST, N/PQ_SHORTLIST_FRAC) survivors — sized to
    out-resolve ADC ties inside dense clusters) is re-ranked with the
    exact fold cosine.

    100 TB story: this is the path when even the IVF cells don't fit —
    the compressed scan is embarrassingly parallel over code partitions,
    the codebooks + 10-query LUTs broadcast (~40 KB), the kernel emits
    only each partition's per-query shortlist (shuffle is
    O(partitions · |Q| · shortlist) rows regardless of N), and the
    exact re-rank touches |Q| · shortlist vectors — the full-precision
    corpus is read only for the shortlist join.  Composable with the
    IVF coarse stage (probe cells, then ADC within) — kept single-stage
    here so the quality gate isolates the quantization error.

    Rows-only by declaration (codebook training is iterative Lloyd, not
    SQL-expressible); encode+scan determinism and truncation-safety are
    pinned in tests/test_round8.py, recall in the self-verifying wrapper
    and ann_recall_gate."""
    import numpy as np

    from .ivf import corpus_rows

    shortlist = max(PQ_SHORTLIST, corpus_rows(spark, sf_dir) // PQ_SHORTLIST_FRAC)
    books = _pq_train_codebooks(spark, sf_dir)  # (M, k, dsub)
    emb = _emb(spark, sf_dir)
    norms = emb.select(
        "vec_id",
        "emb",
        F.sqrt(_fold_sum(F.transform("emb", lambda x: x * x))).alias("nrm"),
    )
    qrows = (
        norms.where(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "emb", "nrm")
        .collect()
    )
    qrows.sort(key=lambda r: r.vec_id)
    qids = np.array([r.vec_id for r in qrows], dtype="i8")
    qmat = np.array([list(r.emb) for r in qrows], dtype="f8")
    qnrm = np.array([r.nrm for r in qrows], dtype="f8")
    m_, k_, dsub = books.shape
    # per-query ADC lookup tables: lut[q, m, c] = <q_sub_m, codeword_mc>
    lut = np.einsum("qmd,mcd->qmc", qmat.reshape(len(qids), m_, dsub), books)
    schema = "query_id long, neighbor_id long, pq_cosine double"

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array([list(e) for e in pdf["emb"]], dtype="f8")
            nrm = pdf["nrm"].to_numpy(dtype="f8")
            ids = pdf["vec_id"].to_numpy(dtype="i8")
            xs = x.reshape(len(x), m_, dsub)
            # encode: nearest codeword per subspace (ties → lowest code)
            codes = np.empty((len(x), m_), dtype="i8")
            for m in range(m_):
                d2 = (
                    (xs[:, m] * xs[:, m]).sum(axis=1, keepdims=True)
                    - 2.0 * xs[:, m] @ books[m].T
                    + (books[m] * books[m]).sum(axis=1)[None, :]
                )
                codes[:, m] = d2.argmin(axis=1)
            # ADC: approx dot = sum_m lut[q, m, codes[:, m]]
            approx = np.zeros((len(qids), len(x)), dtype="f8")
            for m in range(m_):  # fixed m-order: deterministic float sum
                approx += lut[:, m, codes[:, m]]
            cos = approx / (qnrm[:, None] * nrm[None, :])
            out_q, out_n, out_s = [], [], []
            for qi in range(len(qids)):
                row = cos[qi]
                mask = ids != qids[qi]
                cand_ids, cand = ids[mask], row[mask]
                # per-partition top-shortlist under the global
                # (cos DESC, id ASC) order — the global window keeps
                # exactly these survivors (same truncation-safety
                # argument as ivf_candidate_pairs(per_point_topk))
                order = np.lexsort((cand_ids, -cand))[:shortlist]
                out_q.append(np.full(len(order), qids[qi], dtype="i8"))
                out_n.append(cand_ids[order])
                out_s.append(cand[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "pq_cosine": np.concatenate(out_s),
                }
            )

    scored = norms.select("vec_id", "emb", "nrm").mapInPandas(kernel, schema)
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("pq_cosine"), F.asc("neighbor_id")
    )
    shortlist_df = (
        scored.withColumn("prn", F.row_number().over(w_adc))
        .where(F.col("prn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(spark, norms, shortlist_df, qids, qmat, qnrm)


# pair-broadcast rerank band: above the shortlist-broadcast cap the old
# fallback was a keyed shuffle join — which shuffles the FULL-PRECISION
# side by neighbor_id (at 10M×d=768 the raw store is ~30 GB f4, cast to
# f8 for the join = ~60 GB of shuffle write; measured: it filled this
# box's disk quota before returning a row, and at 100 TB it would
# reshuffle the serving store for EVERY bulk batch).  Up to this many
# (query, neighbor) pairs the rerank instead broadcasts the pair set
# (two int arrays, ~12 B/pair → ~1.4 GB at the cap) + the query matrix
# and scores pairs IN PLACE with one vectorized pass over the store's
# own partitions — zero shuffle of full-precision bytes; only the
# scored candidates (|pairs| × 24 B) move to the final top-k window.
#
# The cap is a DRIVER-MEMORY budget, stated explicitly (advice r12 #4):
# the pair collect materializes ~16 B/pair of pandas (two int64
# columns, plus a transient Arrow batch of the same order) and the
# pickled broadcast adds ~12 B/pair — so the band is sized so collect +
# broadcast stay under ~3.4 GB driver RSS on a 128 GiB box.  A
# shortlist_rows estimate past the cap falls back to the keyed shuffle
# join BEFORE any collect happens — the guard is pre-collect by
# construction, there is no post-collect failure path to handle.
_PAIR_RERANK_DRIVER_BUDGET_BYTES = 2 << 30
_PAIR_RERANK_MAX_PAIRS = min(120_000_000, _PAIR_RERANK_DRIVER_BUDGET_BYTES // 16)

# end-to-end cost of ONE broadcast pair, in store-shuffle-equivalent
# bytes.  The raw footprint is ~12 B broadcast + ~16 B collect, but the
# pair path also pays a SERIAL driver stage (toPandas collect + pickle
# + rebroadcast) the shuffle path doesn't — so the constant that
# predicts the measured crossover is much larger than the footprint.
# Calibrated on three measured anchors (BASELINE.md):
#   d=16,  20M, |Q|=10k: join 128 s vs in-place 207 s  → join wins
#   d=128, 10M, |Q|=10k: join 109.3 s vs in-place 110.7 s → TIE
#   d=768, 10M, |Q|=10k: join fills the disk vs in-place 509 s
# The tie pins the crossover: store_bytes = pairs·C at d=128 gives
# C = 10M·(8·128+32) / 40M ≈ 264; shipped as 270 so the measured-tied
# d=128 shape lands on the join side (its join leg read 1.3% faster)
# and the in-place band starts just above it.  (The old C=48 placed
# the crossover at d≈20 and sent d=128 to the in-place band — measured
# harmless there, but wrong-side for d∈[20,128].)
_PAIR_RERANK_PAIR_COST_BYTES = 270


def _pair_rerank_inplace(spark, norms, shortlist_df, qids, qmat, qnrm,
                         k: int = TOP_K):
    """Bulk exact rerank that reads the full-precision store IN PLACE:
    the (query, neighbor) pair set is collected (Arrow) and broadcast
    sorted by neighbor_id; one mapInPandas pass over ``norms`` locates
    each partition row's pairs by binary search, gathers the query rows
    from the broadcast matrix, and scores cosine vectorized (einsum).
    Full-precision vectors NEVER shuffle — the per-batch moving data is
    the scored candidate list, not the store.

    TIE SEMANTICS (declared, advice r12 #4): cosine here is numpy
    einsum over recomputed norms, NOT the sequential JVM fold the join
    path uses — same real-number arithmetic, different f8 association,
    so scores can differ at the ~1e-15 level and a pair of EXACTLY
    tied-by-value neighbors can order differently than the join path
    before the (cosine DESC, id ASC) tie-break resolves them.  The
    bulk band is therefore approximate-tie: rank-identical except
    possibly at float-coincidence boundaries (the in-place≡join test
    asserts 1e-9 score agreement and observed rank equality on real
    data).  Callers needing the bitwise fold contract (the declared
    hashed exact queries) never route here — the band only engages for
    bulk serves past the broadcast cap."""
    import numpy as np
    import pandas as pd

    pairs = shortlist_df.select("query_id", "neighbor_id").toPandas()
    if not len(pairs):
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rn long"
        )
    nb = pairs["neighbor_id"].to_numpy(dtype="i8")
    qd = pairs["query_id"].to_numpy(dtype="i8")
    order = np.argsort(nb, kind="stable")
    nb_sorted = nb[order]
    qids_arr = np.asarray(qids, dtype="i8")
    qorder = np.argsort(qids_arr, kind="stable")
    qpos = qorder[
        np.searchsorted(qids_arr[qorder], qd[order])
    ].astype("i4")
    bc = spark.sparkContext.broadcast(
        (
            nb_sorted,
            qpos,
            np.asarray(qmat, dtype="f8"),
            np.asarray(qnrm, dtype="f8"),
            qids_arr,
        )
    )

    def kernel(batches):
        nbs, qp, qm, qn, qi = bc.value
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype="i8")
            lo = np.searchsorted(nbs, ids, side="left")
            hi = np.searchsorted(nbs, ids, side="right")
            cnt = hi - lo
            sel = np.nonzero(cnt)[0]
            if not len(sel):
                continue
            reps = cnt[sel]
            total = int(reps.sum())
            # pair slot indices: for selected row r, slots lo[r]..hi[r]
            starts = np.cumsum(reps) - reps
            slot = (
                np.arange(total)
                - np.repeat(starts, reps)
                + np.repeat(lo[sel], reps)
            )
            pos = np.repeat(np.arange(len(sel)), reps)
            xm = np.array(
                [np.asarray(e, dtype="f8") for e in pdf["emb"].iloc[sel]]
            )
            xn = np.sqrt((xm * xm).sum(axis=1))
            qrow = qp[slot]
            cos = np.einsum("ij,ij->i", qm[qrow], xm[pos]) / (
                qn[qrow] * xn[pos]
            )
            yield pd.DataFrame(
                {
                    "query_id": qi[qrow],
                    "neighbor_id": np.repeat(ids[sel], reps),
                    "cosine": cos,
                }
            )

    scored = norms.select("vec_id", "emb").mapInPandas(
        kernel, "query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rn").cast("long").alias("rn"),
        )
    )


def _exact_rerank(spark, norms, shortlist_df, qids, qmat, qnrm,
                  shortlist_rows: int | None = None,
                  store_rows: int | None = None,
                  k: int = TOP_K):
    """Exact top-k over an ADC shortlist: only the shortlist rows touch
    full-precision vectors (a key-join against the corpus), cosine is
    the JVM fold (bitwise = the declared exact queries), final top-k by
    (cosine DESC, id ASC).

    The neighbor norm is recomputed POST-join from the joined embedding
    (identical fold arithmetic → identical doubles): projecting the
    precomputed ``nrm`` column through the join would make the corpus
    scan evaluate the interpreted fold for EVERY row — at N=1M that one
    column dominated the serving wall — while post-join it runs on
    |Q|·shortlist rows only.

    ``shortlist_rows``: the caller's |Q|·shortlist estimate, which picks
    one of THREE join shapes:

    * ≤ 8M rows (interactive) — broadcast the shortlist side, turning
      the store join map-side (without the hint the planner shuffled
      the CORPUS against a few-thousand-row shortlist: ~29 GB of
      shuffle at 10M×d=768 for a |Q|=10 batch).
    * bulk, WHEN the in-place economics win — ``_pair_rerank_inplace``:
      the pair set broadcasts, the full-precision store is scored IN
      PLACE and never shuffles.  What the in-place pass saves is the
      store shuffle, and what it costs is collecting + broadcasting the
      pair set — so it runs only when ``store_rows``·row-bytes exceeds
      the pair set's end-to-end cost (pairs ×
      _PAIR_RERANK_PAIR_COST_BYTES — calibrated on the measured
      d=16/128/768 anchors, see the constant).  At 10M×d=768 the
      keyed shuffle moved ~60 GB of f8 store bytes per batch and filled
      the disk → in-place wins by 30×; at 20M×d=16 the store is a cheap
      2.6 GB shuffle and the pair band measured SLOWER (207 s vs 128 s)
      → the join keeps it.  Band capped at _PAIR_RERANK_MAX_PAIRS.
    * otherwise — keyed shuffle join: the honest cost for a narrow
      store, a missing estimate, or a pair set past the broadcast cap."""
    qdf = spark.createDataFrame(
        [(int(i), list(map(float, e)), float(n)) for i, e, n in
         zip(qids, qmat, qnrm)],
        "query_id long, q_emb array<double>, q_nrm double",
    )
    d = len(qmat[0]) if len(qids) else 0
    sl = shortlist_df
    if shortlist_rows is not None and shortlist_rows <= 8_000_000:
        sl = F.broadcast(sl)
    elif (
        shortlist_rows is not None
        and shortlist_rows <= _PAIR_RERANK_MAX_PAIRS
        and store_rows is not None
        and store_rows * (8 * d + 32)
        > shortlist_rows * _PAIR_RERANK_PAIR_COST_BYTES
    ):
        return _pair_rerank_inplace(
            spark, norms, shortlist_df, qids, qmat, qnrm, k=k
        )
    cand = (
        sl.join(
            norms.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("emb").alias("n_emb"),
            ),
            "neighbor_id",
        )
        .join(F.broadcast(qdf), "query_id")
        .withColumn(
            "n_nrm", F.sqrt(_fold_sum(F.transform("n_emb", lambda x: x * x)))
        )
    )
    cos_exact = _dot(F.col("q_emb"), F.col("n_emb")) / (
        F.col("q_nrm") * F.col("n_nrm")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cand.select("query_id", "neighbor_id", cos_exact.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rn").cast("long").alias("rn"),
        )
    )


def knn_cosine_ivfpq(spark, sf_dir):
    """IVF-PQ (the FAISS IVFPQ search shape): trained coarse cells
    prune WHICH vectors each query scores, PQ/ADC compresses HOW each
    surviving vector is scored, and the exact re-rank polishes the
    shortlist.  Composition of this engine's two ANN quantizers:

    * coarse stage — sampled-Lloyd centroids (ivf.train_centroids) with
      the cost-balanced nlist = sqrt(nprobe·N); each corpus vector gets
      its HOME cell via the two-level quantizer (O(sqrt(nlist)) per
      point past 64 cells), each query probes its N_PROBE nearest
      cells.  A vector is ADC-scored ONLY against the queries probing
      its home cell — the scan work drops from |Q|·N (flat PQ) by the
      probed fraction.
    * fine stage — the same PQ codebooks/LUT arithmetic as
      knn_cosine_pq, computed batch-locally in ONE mapInPandas pass:
      no corpus shuffle at all (the cell id never has to become a
      shuffle key because per-batch per-query top-shortlist truncation
      is survivor-safe under the global (score DESC, id ASC) window).
    * exact re-rank of the per-query shortlist (shared _exact_rerank).

    100 TB: one compressed corpus scan with O(partitions·|Q|·shortlist)
    emitted rows, centroid + codebook + LUT broadcasts of O(sqrt(N)·d)
    bytes.  Rows-only (both quantizers train iteratively); recall floor
    enforced in-query at verification scale."""
    import numpy as np

    from .ivf import (
        TWO_LEVEL_MIN,
        build_two_level,
        corpus_rows,
        cost_balanced_nlist,
        train_centroids,
    )

    n_corpus = corpus_rows(spark, sf_dir)
    shortlist = max(PQ_SHORTLIST, n_corpus // PQ_SHORTLIST_FRAC)
    nlist = cost_balanced_nlist(n_corpus, N_PROBE)
    emb_raw = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent_mat = train_centroids(emb_raw, nlist)
    sup_ch = build_two_level(cent_mat) if len(cent_mat) >= TWO_LEVEL_MIN else None
    books = _pq_train_codebooks(spark, sf_dir)
    m_, k_, dsub = books.shape

    emb = _emb(spark, sf_dir)
    norms = emb.select(
        "vec_id",
        "emb",
        F.sqrt(_fold_sum(F.transform("emb", lambda x: x * x))).alias("nrm"),
    )
    qrows = (
        norms.where(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "emb", "nrm")
        .collect()
    )
    qrows.sort(key=lambda r: r.vec_id)
    qids = np.array([r.vec_id for r in qrows], dtype="i8")
    qmat = np.array([list(r.emb) for r in qrows], dtype="f8")
    qnrm = np.array([r.nrm for r in qrows], dtype="f8")
    lut = np.einsum("qmd,mcd->qmc", qmat.reshape(len(qids), m_, dsub), books)

    # driver-side probe map (|Q| x nprobe — tiny): which queries probe
    # each cell.  Same L2 geometry as the corpus home-cell assignment.
    # Query-side probing is O(|Q|) driver work, so it widens cheaply:
    # 2x the corpus-side N_PROBE buys back most of the recall the
    # home-cell pruning costs (the FAISS nprobe knob).
    d2q = (
        (qmat * qmat).sum(axis=1, keepdims=True)
        - 2.0 * qmat @ cent_mat.T
        + (cent_mat * cent_mat).sum(axis=1)[None, :]
    )
    n_probe = min(IVFPQ_QUERY_PROBE, len(cent_mat))
    probe_order = np.argsort(d2q, axis=1, kind="stable")[:, :n_probe]
    cell_to_q: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for c in probe_order[qi]:
            cell_to_q.setdefault(int(c), []).append(qi)
    bc = spark.sparkContext.broadcast((cent_mat, sup_ch, books, lut, cell_to_q))
    schema = "query_id long, neighbor_id long, pq_cosine double"

    def kernel(batches):
        import pandas as pd

        c_mat, sc, bks, lut_, c2q = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array([list(e) for e in pdf["emb"]], dtype="f8")
            nrm = pdf["nrm"].to_numpy(dtype="f8")
            ids = pdf["vec_id"].to_numpy(dtype="i8")
            if sc is not None:
                from .ivf import two_level_cells

                order, _pd2, _ = two_level_cells(x, c_mat, sc[0], sc[1], 1)
                home = order[:, 0]
            else:
                d2 = (
                    (x * x).sum(axis=1, keepdims=True)
                    - 2.0 * x @ c_mat.T
                    + (c_mat * c_mat).sum(axis=1)[None, :]
                )
                home = d2.argmin(axis=1)
            # encode ONLY the rows that live in a probed cell — the
            # others can never be scored, and the probed fraction is
            # ~nprobe·|Q|/nlist of the batch at scale
            probed = np.isin(home, np.fromiter(c2q, dtype="i8"))
            if not probed.any():
                continue
            x, nrm, ids, home = x[probed], nrm[probed], ids[probed], home[probed]
            xs = x.reshape(len(x), m_, dsub)
            codes = np.empty((len(x), m_), dtype="i8")
            for m in range(m_):
                d2c = (
                    (xs[:, m] * xs[:, m]).sum(axis=1, keepdims=True)
                    - 2.0 * xs[:, m] @ bks[m].T
                    + (bks[m] * bks[m]).sum(axis=1)[None, :]
                )
                codes[:, m] = d2c.argmin(axis=1)
            out_q, out_n, out_s = [], [], []
            for c in np.unique(home):
                probing = c2q.get(int(c))
                if not probing:
                    continue
                sel = home == c
                c_ids, c_codes, c_nrm = ids[sel], codes[sel], nrm[sel]
                for qi in probing:
                    adc = np.zeros(len(c_ids), dtype="f8")
                    for m in range(m_):
                        adc += lut_[qi, m, c_codes[:, m]]
                    adc = adc / (qnrm[qi] * c_nrm)
                    mask = c_ids != qids[qi]
                    cand_ids, cand = c_ids[mask], adc[mask]
                    keep = np.lexsort((cand_ids, -cand))[:shortlist]
                    out_q.append(np.full(len(keep), qids[qi], dtype="i8"))
                    out_n.append(cand_ids[keep])
                    out_s.append(cand[keep])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "pq_cosine": np.concatenate(out_s),
                }
            )

    scored = norms.select("vec_id", "emb", "nrm").mapInPandas(kernel, schema)
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("pq_cosine"), F.asc("neighbor_id")
    )
    shortlist_df = (
        scored.withColumn("prn", F.row_number().over(w_adc))
        .where(F.col("prn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(spark, norms, shortlist_df, qids, qmat, qnrm)


def q_knn_cosine_ivfpq(spark, sf_dir):
    """Rows-only, SELF-VERIFYING: recall vs the exact top-k enforced
    in-query at verification scale (cell pruning AND codebook collapse
    both trip it)."""
    from .ivf import corpus_rows

    res = knn_cosine_ivfpq(spark, sf_dir)
    if corpus_rows(spark, sf_dir) <= _PQ_GATE_MAX_N:
        res = res.localCheckpoint(eager=False)
        exact = q_knn_cosine_topk(spark, sf_dir).select(
            "query_id", "neighbor_id"
        )
        n = exact.count()
        hit = exact.join(
            res.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        ).count()
        floor = RECALL_FLOORS["knn_cosine_ivfpq"]
        if n == 0 or hit / n < floor:
            raise AssertionError(
                f"IVF-PQ recall collapsed: {hit}/{n} vs floor {floor}"
            )
    return res


def q_knn_cosine_pq(spark, sf_dir):
    """Rows-only, SELF-VERIFYING (the r7-verdict gate pattern): at
    verification scale the declared query computes recall against the
    exact brute-force top-k in-query and RAISES below
    RECALL_FLOORS['knn_cosine_pq'] — a collapsed codebook turns the
    driver row red instead of passing a silent rows-only check."""
    from .ivf import corpus_rows

    res = knn_cosine_pq(spark, sf_dir)
    if corpus_rows(spark, sf_dir) <= _PQ_GATE_MAX_N:
        res = res.localCheckpoint(eager=False)  # gate + result: one compute
        exact = q_knn_cosine_topk(spark, sf_dir).select(
            "query_id", "neighbor_id"
        )
        n = exact.count()
        hit = exact.join(
            res.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        ).count()
        floor = RECALL_FLOORS["knn_cosine_pq"]
        if n == 0 or hit / n < floor:
            raise AssertionError(
                f"PQ recall collapsed: {hit}/{n} vs floor {floor}"
            )
    return res


# --- E5 embedding-cosine near-dup -------------------------------------------

COSINE_DUP_TAU = 0.4  # data-calibrated: max pairwise cosine here is 0.51
                      # (synthetic embeddings have no true near-dups;
                      # real pipelines run 0.95+ — threshold is a knob)


def q_dedup_embed_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (i < k, cosine >= tau).
    Cosine is the bitwise-portable sequential fold → hashed oracle.
    This all-pairs form is the oracle-sf declaration ONLY; the scale
    path is ``q_dedup_embed_cosine_ivf`` below (same semantics, IVF
    cell-bucketed candidates, no crossJoin — subset + recall asserted in
    tests/test_ann_recall.py)."""
    emb = _emb(spark, sf_dir)
    norms = emb.select(
        "vec_id",
        "emb",
        F.sqrt(_fold_sum(F.transform("emb", lambda x: x * x))).alias("nrm"),
    )
    a = norms.select(
        F.col("vec_id").alias("i"), F.col("emb").alias("ea"), F.col("nrm").alias("na")
    )
    b = norms.select(
        F.col("vec_id").alias("k"), F.col("emb").alias("eb"), F.col("nrm").alias("nb")
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(b)
        .where(F.col("i") < F.col("k"))
        .select("i", "k", cos.alias("cosine"))
        .where(F.col("cosine") >= COSINE_DUP_TAU)
    )


O_EMBED_DUP = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x),
                          (a, b) -> a + b)) AS nrm
  FROM embeddings)
SELECT a.vec_id AS i, b.vec_id AS k,
       list_reduce(list_transform(list_zip(a.emb, b.emb), p -> p[1]*p[2]),
                   (x, y) -> x + y) / (a.nrm * b.nrm) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_reduce(list_transform(list_zip(a.emb, b.emb), p -> p[1]*p[2]),
                  (x, y) -> x + y) / (a.nrm * b.nrm) >= {COSINE_DUP_TAU}
"""


# --- (⊕ r8) embed-dedup canonicalization: pairs → components → survivor -----

def q_dedup_embed_components(spark, sf_dir):
    """The canonicalization step of the EMBEDDING dedup pipeline (the
    vector mirror of textops D5c): connected components over the cosine
    >= tau pair graph, component id = min vec_id, survivor = the vector
    equal to its component id.  Iterative min-label propagation —
    symmetrized checkpointed edges, per-vertex min per round,
    O(component diameter) rounds (near-dup components are near-cliques);
    at 100 TB the identical loop runs over the IVF twin's pair output
    instead of the all-pairs oracle form.  Deterministic (min) → hashed
    against a DuckDB recursive-CTE oracle."""
    pairs = q_dedup_embed_cosine(spark, sf_dir).select("i", "k")
    ids = _emb(spark, sf_dir).select("vec_id")
    edges = (
        pairs.select(F.col("i").alias("src"), F.col("k").alias("dst"))
        .unionByName(
            pairs.select(F.col("k").alias("src"), F.col("i").alias("dst"))
        )
        .localCheckpoint(eager=False)
    )
    labels = ids.select("vec_id", F.col("vec_id").alias("comp"))
    while True:
        nbr_min = (
            edges.join(labels, edges["src"] == labels["vec_id"])
            .groupBy(F.col("dst").alias("vec_id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, "vec_id", "left")
            .select(
                "vec_id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("comp", "old_comp"), "vec_id"
            )
            .where(F.col("comp") != F.col("old_comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        "vec_id",
        "comp",
        (F.col("vec_id") == F.col("comp")).cast("long").alias("is_canonical"),
    )


# the oracle replays the same pair predicate, then closes components
# with a recursive CTE — structure mirrors textops.O_DEDUP_COMPONENTS
O_EMBED_COMPONENTS = f"""
WITH RECURSIVE e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]),
                                         x -> x*x),
                          (a, b) -> a + b)) AS nrm
  FROM embeddings),
pairs AS (
  SELECT a.vec_id AS i, b.vec_id AS k
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_reduce(list_transform(list_zip(a.emb, b.emb), p -> p[1]*p[2]),
                    (x, y) -> x + y) / (a.nrm * b.nrm) >= {COSINE_DUP_TAU}),
edges AS (SELECT i AS src, k AS dst FROM pairs
          UNION ALL
          SELECT k AS src, i AS dst FROM pairs),
reach(vec_id, comp) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT ed.dst, r.comp FROM reach r JOIN edges ed ON r.vec_id = ed.src)
SELECT vec_id, min(comp) AS comp,
       CAST(vec_id = min(comp) AS BIGINT) AS is_canonical
FROM reach GROUP BY vec_id
"""


# --- E5b IVF-bucketed embed-cosine near-dup (the 100 TB path) ---------------

DUP_NPROBE = 8  # near-threshold pairs are loosely clustered → probe wide


def q_dedup_embed_cosine_ivf(spark, sf_dir):
    """Rows-only scale twin of ``dedup_embed_cosine``: same
    cosine >= tau semantics, but candidate pairs are restricted to
    IVF-co-resident ones — every point is indexed in its home (nearest)
    cell and probes its DUP_NPROBE nearest cells, the exact cosine runs
    per cell, and the cell id is the shuffle key.  With the
    cost-balanced nlist = sqrt(nprobe·N) (operators/ivf.py) both the
    coarse scoring and the within-cell work are O(N^1.5) — never the
    crossJoin's N²; no task ever sees the full corpus.  Centroids are
    sampled-Lloyd trained (this is a rows-only path, so no SQL mirror
    constrains the quantizer).

    Cosine is accumulated dimension-sequentially (same IEEE add order as
    the declared query's fold), so any pair present in both is bitwise
    identical — the subset property in tests is exact, not tolerant."""
    import numpy as np
    import pandas as pd

    from .ivf import TWO_LEVEL_MIN, build_two_level, train_centroids

    from .ivf import corpus_rows

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    nlist = cost_balanced_nlist(corpus_rows(spark, sf_dir), DUP_NPROBE)
    cent_mat = train_centroids(emb, nlist)
    cent_ids = np.arange(len(cent_mat), dtype="i8")
    sup_ch = build_two_level(cent_mat) if len(cent_mat) >= TWO_LEVEL_MIN else None
    bc = spark.sparkContext.broadcast((cent_ids, cent_mat, sup_ch))
    nprobe = min(DUP_NPROBE, len(cent_ids))

    def assign_cells(batches):
        c_ids, c_mat, sc = bc.value
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype="i8")
            pts = np.stack(pdf["embedding"].to_numpy()).astype("f8")
            if sc is not None:
                from .ivf import two_level_cells

                order, probe_d2, _ = two_level_cells(
                    pts, c_mat, sc[0], sc[1], nprobe
                )
            else:
                d2 = (
                    (pts * pts).sum(axis=1, keepdims=True)
                    - 2.0 * pts @ c_mat.T
                    + (c_mat * c_mat).sum(axis=1)[None, :]
                )
                order = np.argpartition(d2, nprobe - 1, axis=1)[:, :nprobe]
                probe_d2 = np.take_along_axis(d2, order, axis=1)
            home_pos = np.argmin(probe_d2, axis=1)
            is_home = (
                order == order[np.arange(len(ids)), home_pos][:, None]
            ).ravel()
            yield pd.DataFrame(
                {
                    "cell": c_ids[order].ravel(),
                    "vec_id": np.repeat(ids, nprobe),
                    "is_home": is_home,
                    "embedding": np.repeat(pdf["embedding"].to_numpy(), nprobe),
                }
            )

    par = spark.sparkContext.defaultParallelism
    roles = emb.repartition(par).mapInPandas(
        assign_cells,
        schema="cell long, vec_id long, is_home boolean, embedding array<float>",
    )

    def cell_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        mem = pdf[pdf["is_home"]]
        if not len(mem):
            return pd.DataFrame({"i": [], "k": [], "cosine": []})
        p_ids = pdf["vec_id"].to_numpy(dtype="i8")
        m_ids = mem["vec_id"].to_numpy(dtype="i8")
        p_mat = np.stack(pdf["embedding"].to_numpy()).astype("f8")
        m_mat = np.stack(mem["embedding"].to_numpy()).astype("f8")
        d = p_mat.shape[1]
        # dimension-sequential accumulation == the engine's fold order
        dot = np.zeros((len(p_ids), len(m_ids)), dtype="f8")
        p_nrm2 = np.zeros(len(p_ids), dtype="f8")
        m_nrm2 = np.zeros(len(m_ids), dtype="f8")
        for j in range(d):
            dot += p_mat[:, j, None] * m_mat[None, :, j]
            p_nrm2 += p_mat[:, j] * p_mat[:, j]
            m_nrm2 += m_mat[:, j] * m_mat[:, j]
        cos = dot / (np.sqrt(p_nrm2)[:, None] * np.sqrt(m_nrm2)[None, :])
        lo = np.repeat(p_ids, len(m_ids))
        hi = np.tile(m_ids, len(p_ids))
        c = cos.ravel()
        keep = (lo != hi) & (c >= COSINE_DUP_TAU)
        lo, hi, c = lo[keep], hi[keep], c[keep]
        swap = lo > hi
        lo[swap], hi[swap] = hi[swap], lo[swap]
        out = pd.DataFrame({"i": lo, "k": hi, "cosine": c})
        return out.drop_duplicates(["i", "k"])

    return (
        roles.groupBy("cell")
        .applyInPandas(cell_kernel, schema="i long, k long, cosine double")
        .dropDuplicates(["i", "k"])
    )


# --- (⊕ r4) random-hyperplane LSH candidate generation + exact verify -------

LSH_BANDS = 8
LSH_PLANES_PER_BAND = 3
LSH_DIM = 64  # embedding dimensionality (FIXTURES.md)


def _lsh_signs() -> list[list[float]]:
    """Deterministic Rademacher (±1) hyperplanes: sign(p, d) from the
    parity of the first md5 nibble of "p|d".  Both engines consume these
    as embedded literals, so the bucketing — and therefore the
    approximation itself — is reproducible anywhere md5 exists."""
    import hashlib

    planes = []
    for p in range(LSH_BANDS * LSH_PLANES_PER_BAND):
        row = []
        for d in range(LSH_DIM):
            nib = int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0], 16)
            row.append(1.0 if nib % 2 == 0 else -1.0)
        planes.append(row)
    return planes


_LSH_PLANES = _lsh_signs()


def q_ann_lsh_cosine(spark, sf_dir):
    """Near-dup pairs via random-hyperplane LSH: each vector gets an
    8-band × 3-bit signature (sign of the dot with 24 fixed ±1
    hyperplanes); candidates are pairs agreeing on ALL bits of ANY band;
    exact cosine >= tau verifies candidates.  The banded OR keeps recall
    high (~90% at this tau) while the per-band equi-join touches only
    bucket-mates — the 100 TB shape, same family as the minhash LSH but
    for dense embeddings.  Every stage is deterministic, so the oracle
    replicates the approximation bit-for-bit (hash-checked like
    knn_cosine_ivf)."""
    from ..sources.tables import dup_cut, table_rows

    emb = _emb(spark, sf_dir)
    n_emb = table_rows(sf_dir, "embeddings")
    # size-gated dup cut (r16): norms feeds the banded signature build
    # AND both verify-join sides (ea/eb) — the interpreted norm fold
    # would otherwise run three times over the corpus (r15, guide §2.4)
    norms = dup_cut(
        emb.select(
            "vec_id",
            "emb",
            F.sqrt(_fold_sum(F.transform("emb", lambda x: x * x))).alias("nrm"),
        ),
        n_emb,
    )
    band_cols = []
    for b in range(LSH_BANDS):
        bits = []
        for j in range(LSH_PLANES_PER_BAND):
            plane = _LSH_PLANES[b * LSH_PLANES_PER_BAND + j]
            dot = _dot(F.col("emb"), F.array(*[F.lit(v) for v in plane]))
            bits.append((dot >= 0).cast("int") * (2 ** j))
        bucket = bits[0]
        for extra in bits[1:]:
            bucket = bucket + extra
        band_cols.append(F.struct(F.lit(b).alias("band"), bucket.alias("bucket")))
    # size-gated dup cut (r16): sig's per-band dot folds are the
    # expensive part and both self-join sides read it (r15, guide §2.4)
    sig = dup_cut(
        norms.select(
            "vec_id", F.explode(F.array(*band_cols)).alias("s")
        ).select(
            "vec_id",
            F.col("s.band").alias("band"),
            F.col("s.bucket").alias("bucket"),
        ),
        n_emb,
    )
    a = sig.alias("a")
    b_ = sig.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("i"), F.col("b.vec_id").alias("k"))
        .distinct()
    )
    ea = norms.select(
        F.col("vec_id").alias("i"), F.col("emb").alias("ea"), F.col("nrm").alias("na")
    )
    eb = norms.select(
        F.col("vec_id").alias("k"), F.col("emb").alias("eb"), F.col("nrm").alias("nb")
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(ea, "i")
        .join(eb, "k")
        .select("i", "k", cos.alias("cosine"))
        .where(F.col("cosine") >= COSINE_DUP_TAU)
    )


def _lsh_oracle_sql() -> str:
    def arr(plane):
        return "[" + ", ".join(str(v) for v in plane) + "]"

    band_rows = []
    for b in range(LSH_BANDS):
        bits = []
        for j in range(LSH_PLANES_PER_BAND):
            plane = _LSH_PLANES[b * LSH_PLANES_PER_BAND + j]
            dot = (
                f"list_reduce(list_transform(list_zip(emb, {arr(plane)}),"
                " p -> p[1]*p[2]), (x, y) -> x + y)"
            )
            bits.append(f"(CASE WHEN {dot} >= 0 THEN {2 ** j} ELSE 0 END)")
        band_rows.append(
            f"SELECT vec_id, {b} AS band, {' + '.join(bits)} AS bucket FROM e"
        )
    sigs = "\nUNION ALL\n".join(band_rows)
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x),
                          (a, b) -> a + b)) AS nrm
  FROM embeddings),
sig AS ({sigs}),
cand AS (
  SELECT DISTINCT a.vec_id AS i, b.vec_id AS k
  FROM sig a JOIN sig b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT i, k,
       list_reduce(list_transform(list_zip(ea.emb, eb.emb), p -> p[1]*p[2]),
                   (x, y) -> x + y) / (ea.nrm * eb.nrm) AS cosine
FROM cand JOIN e ea ON cand.i = ea.vec_id JOIN e eb ON cand.k = eb.vec_id
WHERE list_reduce(list_transform(list_zip(ea.emb, eb.emb), p -> p[1]*p[2]),
                  (x, y) -> x + y) / (ea.nrm * eb.nrm) >= {COSINE_DUP_TAU}
"""


O_ANN_LSH = _lsh_oracle_sql()


# --- (⊕ r6) driver-visible quality gates for the approximate paths ----------
#
# Floors are structural-breakage detectors, far below the measured values
# (sf0.01, round-6 testdata: ivf 0.84, trained 0.50, lsh-pairs 0.93,
# ivf-dup 0.88) so a testdata regeneration can't flake them, but a broken
# quantizer/banding (recall collapse toward 0) raises inside the driver's
# correctness run instead of only in pytest.

RECALL_FLOORS = {
    "knn_cosine_ivf": 0.5,     # tests/test_ann_recall.py floor
    "knn_cosine_ivf_trained": 0.3,  # lowid is rigged in its own favor on
                                    # unclustered ids (see test_trained_*)
    "ann_lsh_cosine_pairs": 0.75,
    "knn_cosine_pq": 0.5,  # measured 0.98 at sf0.001/sf0.01 (ADC
                           # shortlist=50 + exact re-rank)
    "knn_cosine_ivfpq": 0.3,  # cell pruning stacks on PQ error; floor
                              # is the structural-collapse detector
    "knn_cosine_served": 0.3,  # persisted-index serving path shares the
                               # IVF-PQ error model (operators/ann_index.py)
}
IVF_DUP_RECALL_FLOOR = 0.5


def q_ann_recall_gate(spark, sf_dir):
    """Rows-only ANN quality gate, driver-visible (r5 verdict #4): recall
    of each approximate similarity path against its exact counterpart,
    computed with distributed semi-joins (no driver-side set math beyond
    the final per-method scalars).  RAISES below RECALL_FLOORS — so a
    quality regression turns the driver row red — and returns one row per
    method with scalar columns only (the driver's canonicalizer crashes
    on arrays)."""
    # checkpoint both exact pipelines: each feeds one count + semi-joins
    # per method, and re-running the exact top-k / N² pair scan per
    # action would triple the gate's cost
    exact_knn = (
        q_knn_cosine_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    exact_pairs = (
        q_dedup_embed_cosine(spark, sf_dir)
        .select("i", "k")
        .localCheckpoint(eager=False)
    )
    n_exact_knn = exact_knn.count()
    n_exact_pairs = exact_pairs.count()
    if n_exact_knn == 0:
        # the exact reference always has query rows — an empty reference
        # is itself the structural breakage this gate exists to catch,
        # so raise loudly instead of reporting vacuous recall
        raise AssertionError("exact knn reference returned zero rows")
    # runtime import: ann_index imports this module at load time, so the
    # serving path joins the gate via a deferred import (r9)
    from .ann_index import knn_cosine_served

    out = []
    for method, fn in (
        ("knn_cosine_ivf", q_knn_cosine_ivf),
        ("knn_cosine_ivf_trained", knn_cosine_ivf_trained),
        ("knn_cosine_pq", knn_cosine_pq),
        ("knn_cosine_ivfpq", knn_cosine_ivfpq),
        ("knn_cosine_served", knn_cosine_served),
    ):
        hit = exact_knn.join(
            fn(spark, sf_dir).select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        ).count()
        out.append((method, n_exact_knn, hit, round(hit / n_exact_knn, 4)))
    lsh_hit = exact_pairs.join(
        q_ann_lsh_cosine(spark, sf_dir).select("i", "k"),
        ["i", "k"],
        "left_semi",
    ).count()
    out.append(
        (
            "ann_lsh_cosine_pairs",
            n_exact_pairs,
            lsh_hit,
            round(lsh_hit / n_exact_pairs, 4) if n_exact_pairs else 1.0,
        )
    )
    for method, n_exact, n_hit, recall in out:
        if recall < RECALL_FLOORS[method]:
            raise AssertionError(
                f"{method} recall {recall} below floor "
                f"{RECALL_FLOORS[method]} ({n_hit}/{n_exact})"
            )
    return spark.createDataFrame(
        out, "method string, n_exact long, n_hit long, recall double"
    )


def q_ivf_dup_subset_gate(spark, sf_dir):
    """Rows-only correctness gate for the IVF dedup scale twin (r5
    verdict #4): every pair `dedup_embed_cosine_ivf` emits must exist in
    the exact operator's output with a BITWISE-equal cosine (both sides
    accumulate dimension-sequentially, so `=` is exact, not tolerant),
    and recall must clear a structural floor.  RAISES on any violation;
    returns the one-row summary."""
    # checkpoint: the exact N² pair scan feeds both the outer join and
    # the trailing count
    exact = (
        q_dedup_embed_cosine(spark, sf_dir)
        .select("i", "k", F.col("cosine").alias("cosine_exact"))
        .localCheckpoint(eager=False)
    )
    approx = q_dedup_embed_cosine_ivf(spark, sf_dir)
    joined = approx.join(exact, ["i", "k"], "left_outer")
    agg = joined.agg(
        F.count("*").alias("n_approx"),
        F.sum(
            F.when(F.col("cosine_exact").isNull(), 1).otherwise(0)
        ).alias("n_not_subset"),
        F.sum(
            F.when(
                F.col("cosine_exact").isNotNull()
                & (F.col("cosine") != F.col("cosine_exact")),
                1,
            ).otherwise(0)
        ).alias("n_bitwise_mismatch"),
    ).collect()[0]
    n_exact = exact.count()
    recall = agg.n_approx / n_exact if n_exact else 1.0
    if agg.n_not_subset or agg.n_bitwise_mismatch:
        raise AssertionError(
            f"ivf dup twin violated subset/bitwise property: "
            f"{agg.n_not_subset} pairs outside exact set, "
            f"{agg.n_bitwise_mismatch} cosine mismatches"
        )
    if recall < IVF_DUP_RECALL_FLOOR:
        raise AssertionError(
            f"ivf dup recall {recall:.3f} below {IVF_DUP_RECALL_FLOOR}"
        )
    return spark.createDataFrame(
        [
            (
                int(n_exact),
                int(agg.n_approx),
                int(agg.n_not_subset),
                int(agg.n_bitwise_mismatch),
                round(recall, 4),
            )
        ],
        "n_exact long, n_approx long, n_not_subset long, "
        "n_bitwise_mismatch long, recall double",
    )


# --- (⊕ r8) embedding drift between deterministic corpus halves -------------

def centroid_drift_frames(emb_a, emb_b):
    """Per-label centroid L2 distance between two embedding frames —
    the base-vs-new-batch drift monitor an index append should consult
    before trusting frozen quantizers (ann_index.append_ann_index's
    documented caveat; measured drill in tools/ann_drift_run.py).
    Same aggregation shape as q_embedding_drift — explode → per-label
    per-dim mean, map-side combinable, |labels|·d aggregate rows —
    with the md5-parity axis replaced by the frame identity, because a
    shifted APPEND BATCH distributes evenly across md5 halves and is
    invisible to the one-corpus split by construction.

    Inputs: frames with (label, emb array<double>) columns.  Returns
    (label, n_a, n_b, centroid_drift)."""

    def _cent(df, side):
        x = df.select("label", F.posexplode("emb")).select(
            "label", F.col("pos").alias("dim"), F.col("col").alias("val")
        )
        return x.groupBy("label", "dim").agg(
            F.avg("val").alias(f"cval_{side}")
        )

    sizes = (
        emb_a.groupBy("label").agg(F.count("*").alias("n_a"))
        .join(emb_b.groupBy("label").agg(F.count("*").alias("n_b")), "label", "full_outer")
        .na.fill(0, ["n_a", "n_b"])
    )
    # FULL-outer centroid join (advice r10 #3): a label present in only
    # one frame — a brand-new cluster appearing in an append batch is
    # the strongest drift signal there is — must surface, not vanish
    # into an inner join.  One-sided labels report drift = +inf (the
    # sentinel alerting thresholds always trip on) with the missing
    # side's n at 0.
    d = F.col("cval_a") - F.col("cval_b")
    one_sided = F.sum(
        F.when(
            F.col("cval_a").isNull() | F.col("cval_b").isNull(), 1
        ).otherwise(0)
    )
    drift = (
        _cent(emb_a, "a")
        .join(_cent(emb_b, "b"), ["label", "dim"], "full_outer")
        .groupBy("label")
        .agg(
            F.when(one_sided > 0, F.lit(float("inf")))
            .otherwise(F.round(F.sqrt(F.sum(d * d)), 6))
            .alias("centroid_drift")
        )
    )
    return drift.join(sizes, "label", "full_outer").select(
        "label", "n_a", "n_b", "centroid_drift"
    )


def q_embedding_drift(spark, sf_dir):
    """Distribution-drift check an embedding pipeline runs before
    trusting an index refresh: split the corpus into two deterministic
    halves (md5 parity of vec_id — portable, seedless), compute each
    label's per-half centroid, and report the L2 distance between the
    half-centroids plus half sizes.  Near-zero drift = the halves are
    exchangeable; a hot label whose halves diverge flags ingestion skew.

    Scale shape: one explode → (label, half, dim) mean aggregation
    (map-side combinable, output |labels|·|halves|·d rows) and a
    |labels|-row join — nothing pairwise anywhere.  Centroid means are
    group sums (engine-ordered) → round 6 on both sides, the
    label_centroids convention."""
    emb = _emb(spark, sf_dir)
    half = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 2
    )
    x = emb.select(
        "vec_id", "label", half.alias("half"), F.posexplode("emb")
    ).select("vec_id", "label", "half", F.col("pos").alias("dim"),
             F.col("col").alias("val"))
    cent = x.groupBy("label", "half", "dim").agg(F.avg("val").alias("cval"))
    sizes = (
        emb.select("label", half.alias("half"))
        .groupBy("label")
        .agg(
            F.sum((F.col("half") == 0).cast("long")).alias("n_half0"),
            F.sum((F.col("half") == 1).cast("long")).alias("n_half1"),
        )
    )
    a, b = cent.where("half = 0").alias("a"), cent.where("half = 1").alias("b")
    d2 = (F.col("a.cval") - F.col("b.cval")) * (F.col("a.cval") - F.col("b.cval"))
    drift = (
        a.join(b, (F.col("a.label") == F.col("b.label"))
               & (F.col("a.dim") == F.col("b.dim")))
        .groupBy(F.col("a.label").alias("label"))
        .agg(F.round(F.sqrt(F.sum(d2)), 6).alias("centroid_drift"))
    )
    return drift.join(sizes, "label").select(
        "label", "n_half0", "n_half1", "centroid_drift"
    )


_HALF_SQL = "CAST(('0x' || substring(md5(vec_id::VARCHAR), 1, 8))::BIGINT AS BIGINT) % 2"

O_EMBED_DRIFT = f"""
WITH e AS (
  SELECT vec_id, label, {_HALF_SQL} AS half,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings),
c AS (SELECT label, half, dim, avg(val) AS cval FROM e GROUP BY 1, 2, 3),
sizes AS (
  SELECT label,
         CAST(sum(CASE WHEN {_HALF_SQL} = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_half0,
         CAST(sum(CASE WHEN {_HALF_SQL} = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_half1
  FROM embeddings GROUP BY label),
drift AS (
  SELECT a.label, ROUND(sqrt(sum((a.cval - b.cval) * (a.cval - b.cval))), 6)
           AS centroid_drift
  FROM c a JOIN c b ON a.label = b.label AND a.dim = b.dim
                    AND a.half = 0 AND b.half = 1
  GROUP BY a.label)
SELECT label, n_half0, n_half1, centroid_drift
FROM drift JOIN sizes USING (label)
"""


QUERIES = {
    "knn_cosine_topk": q_knn_cosine_topk,
    "ann_lsh_cosine": q_ann_lsh_cosine,
    "dedup_embed_cosine": q_dedup_embed_cosine,
    "dedup_embed_cosine_ivf": q_dedup_embed_cosine_ivf,  # rows-only scale twin
    "knn_cosine_ivf": q_knn_cosine_ivf,
    # rows-only (sampled-Lloyd training is iterative, no SQL mirror) but
    # self-verifying: raises below the recall floor at verification scale
    "knn_cosine_ivf_trained": q_knn_cosine_ivf_trained,
    "knn_cosine_pq": q_knn_cosine_pq,
    "knn_cosine_ivfpq": q_knn_cosine_ivfpq,
    "dist_histogram": q_dist_histogram,
    "label_centroids": q_label_centroids,
    # rows-only driver-visible quality gates: raise on recall collapse /
    # subset violation, so approximation regressions go red in the gate
    "ann_recall_gate": q_ann_recall_gate,
    "ivf_dup_subset_gate": q_ivf_dup_subset_gate,
    "embedding_drift": q_embedding_drift,
    "dedup_embed_components": q_dedup_embed_components,
}

ORACLES = {
    "knn_cosine_topk": O_KNN,
    "ann_lsh_cosine": O_ANN_LSH,
    "knn_cosine_ivf": O_KNN_IVF,
    "dedup_embed_cosine": O_EMBED_DUP,
    "dist_histogram": O_DIST_HIST,
    "label_centroids": O_CENTROIDS,
    "embedding_drift": O_EMBED_DRIFT,
    "dedup_embed_components": O_EMBED_COMPONENTS,
}
