"""Blocked dense Affinity-Propagation engine (the MR-AP row/column jobs
as Arrow-vectorized block kernels).

The coordinate-format engine in ``ap.py`` is the semantic reference: every
pass is relational algebra the DuckDB oracle mirrors CTE-for-CTE.  It is
also job-heavy — each damped iteration costs three full scans of the O(N²)
coordinate state (top-2 window aggregate, column-stats aggregate, checkpoint
projection), and at bench scale (N=2000 → 4M rows × 5 iterations) the
per-job fixed costs dominate: ~3 s/iteration of which <0.1 s is arithmetic.

This module is the SAME algorithm in the shape the MR-AP paper actually
describes — a row-parallel responsibility job and a column-stats reduce —
with the matrix stored as row blocks:

* state = one DataFrame row per point i: ``(i, s[N], r[N], a[N])``
  (arrays ordered by ascending vec_id), hash-partitioned into blocks whose
  size is bounded by ``_TARGET_BLOCK_BYTES`` — block *count* grows as N²,
  block *size* stays constant, so the layout scales like any other
  fixed-split relation;
* the responsibility update is row-local (``_r_block`` — bitwise the
  formulation of ``ap_numpy_oracle.iterate``, itself proven equal to the
  coordinate passes in tests/test_ap_numpy.py);
* the availability update needs only two N-vectors of column statistics:
  per-partition partials (rows sorted by i → deterministic numpy pairwise
  sums) are collected (O(blocks·N) bytes), combined on the driver in
  block order, and broadcast back — the classic MR column job;
* one iteration = ONE tiny stats-collect job + ONE update/checkpoint job,
  both 100% Arrow-vectorized numpy, ~0.3 s instead of ~3 s.

Float parity: s is computed with the same sequential per-dimension
accumulation as ``ap.similarity_off_diagonal`` (bitwise equal to DuckDB's
``list_reduce`` fold), the responsibility update is selection arithmetic
(bitwise), and availability depends on group sums whose ordering already
differs between any two engines — outputs that expose it are rounded to 3
decimals on both sides (ap.py module docstring).  The median preference
reuses the interpolation formula proven bitwise-equal to
``percentile(s, 0.5)`` (ap._median_preference_fast).

Scale gate: the driver-side pieces are O(N²) values for the median and
O(blocks·N) for the stats combine, so the path is gated at
``BLOCKED_MAX_N`` (same ceiling as ap._FAST_MEDIAN_MAX_N); above it the
coordinate engine and the sparse/IVF path (``ap.cluster_sparse``) take
over — dense N² state is the small-N regime by construction.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table

DAMPING = 0.5
BLOCKED_MAX_N = 10_000  # N² doubles must be driver-collectable for the median
_TARGET_BLOCK_BYTES = 64 << 20  # per-task state footprint bound (3 N-arrays/row)

_STATE_SCHEMA = "i long, s array<double>, r array<double>, a array<double>"


def _n_blocks(spark: SparkSession, n: int) -> int:
    par = spark.sparkContext.defaultParallelism
    row_bytes = 3 * n * 8
    by_mem = (n * row_bytes + _TARGET_BLOCK_BYTES - 1) // _TARGET_BLOCK_BYTES
    return min(n, max(par, int(by_mem)))


def _r_block(s: np.ndarray, r: np.ndarray, a: np.ndarray, lam: float) -> np.ndarray:
    """Damped responsibility update for a block of rows — the exact
    ``ap_numpy_oracle.iterate`` formulation (row-local, so identical on
    blocks and on the full matrix)."""
    n = s.shape[1]
    asv = a + s
    arg1 = asv.argmax(1)
    rows = np.arange(s.shape[0])
    m1 = asv[rows, arg1]
    m2 = np.partition(asv, n - 2, axis=1)[:, n - 2]  # 2nd largest incl dups
    excl = np.repeat(m1[:, None], n, axis=1)
    excl[rows, arg1] = m2
    return lam * r + (1 - lam) * (s - excl)


def _stack(col) -> np.ndarray:
    return np.stack(col.to_numpy())


class DenseAP:
    """Per-(application, sf_dir) blocked engine instance.  Owns the
    embedding broadcast, the checkpointed zero state, and the preference
    scalars; iteration chains are built on demand."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        import pandas as pd  # noqa: F401  (Arrow path)

        self.spark = spark
        self.sf_dir = sf_dir
        emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        rows = emb.collect()  # the small O(N·d) dimension table
        order = np.argsort(np.array([r.vec_id for r in rows], dtype="i8"))
        self.ids = np.array([rows[j].vec_id for j in order], dtype="i8")
        mat = np.array([rows[j].embedding for j in order], dtype="f8")
        self.n = len(self.ids)
        self.bc = spark.sparkContext.broadcast((self.ids, mat))
        self.nb = _n_blocks(spark, self.n)
        self._state0: DataFrame | None = None
        self._prefs: dict[str, float] = {}

    # -- zero state ----------------------------------------------------

    def state0(self) -> DataFrame:
        """(i, s row, r=0, a=0) with the RAW diagonal (s(i,i) = -0.0);
        kernels patch the diagonal to the preference at use, so one zero
        state serves every (pref, lam) chain."""
        if self._state0 is not None:
            return self._state0
        bc = self.bc

        def sim_kernel(batches):
            import pandas as pd

            ids_b, m_b = bc.value
            nd = m_b.shape[1]
            nn = len(ids_b)
            for pdf in batches:
                if not len(pdf):
                    continue
                ai = pdf["vec_id"].to_numpy(dtype="i8")
                av = _stack(pdf["embedding"]).astype("f8")
                acc = np.zeros((len(ai), nn), dtype="f8")
                for d in range(nd):  # sequential over dims == the fold
                    diff = av[:, d, None] - m_b[None, :, d]
                    acc += diff * diff
                z = np.zeros((len(ai), nn), dtype="f8")
                yield pd.DataFrame(
                    {"i": ai, "s": list(-acc), "r": list(z), "a": list(z)}
                )

        emb = table(self.spark, self.sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        self._state0 = (
            emb.repartition(self.nb, "vec_id")
            .mapInPandas(sim_kernel, schema=_STATE_SCHEMA)
            .localCheckpoint(eager=True)
        )
        return self._state0

    # -- preference ----------------------------------------------------

    def _offdiag(self) -> np.ndarray:
        pdf = self.state0().select("i", "s").toPandas()
        iv = pdf["i"].to_numpy(dtype="i8")
        s = _stack(pdf["s"])
        di = np.searchsorted(self.ids, iv)
        mask = np.ones(s.shape, dtype=bool)
        mask[np.arange(len(iv)), di] = False
        return s[mask]

    def pref_value(self, kind: str = "median") -> float:
        """Exact preference scalar: interpolated median (the
        ap._median_preference_fast formula — bitwise equal to
        ``percentile(s, 0.5)``) or exact min.  Both scalars derive from
        one collect whose O(N²) value array is dropped immediately — at
        the gate boundary it is ~800 MB, too much to pin on the driver
        for the engine instance's lifetime."""
        if kind not in self._prefs:
            vals = self._offdiag()
            self._prefs["min"] = float(vals.min())
            m = vals.size
            pos = 0.5 * (m - 1)
            lo = int(pos)
            part = np.partition(vals, [lo, lo + 1] if lo + 1 < m else [lo])
            lower, upper = part[lo], part[min(lo + 1, m - 1)]
            self._prefs["median"] = float(lower + (upper - lower) * (pos - lo))
        return self._prefs[kind]

    # -- iteration -----------------------------------------------------

    def _col_stats(self, state: DataFrame, pref: float, lam: float):
        """The MR column job: per-partition partial column sums of
        max(0, r_new) (diagonal excluded) plus the new diagonal
        responsibilities, combined on the driver in deterministic block
        order.  O(blocks·N) bytes collected — the N² state never moves."""
        bc = self.bc

        def stats_kernel(batches):
            import pandas as pd

            ids_b, _ = bc.value
            frames = list(batches)
            if not frames:
                return
            pdf = pd.concat(frames)
            if not len(pdf):
                return
            iv = pdf["i"].to_numpy(dtype="i8")
            order = np.argsort(iv)  # deterministic row order per block
            iv = iv[order]
            s = _stack(pdf["s"])[order]
            r = _stack(pdf["r"])[order]
            a = _stack(pdf["a"])[order]
            rows = np.arange(len(iv))
            di = np.searchsorted(ids_b, iv)
            s[rows, di] = pref
            r_new = _r_block(s, r, a, lam)
            diag_r = r_new[rows, di].copy()
            rp = np.maximum(r_new, 0.0)
            rp[rows, di] = 0.0
            yield pd.DataFrame(
                {
                    "min_i": [int(iv.min())],
                    "colsum": [rp.sum(0)],  # pairwise over sorted rows
                    "diag_i": [iv],
                    "diag_r": [diag_r],
                }
            )

        parts = state.mapInPandas(
            stats_kernel,
            schema="min_i long, colsum array<double>, "
            "diag_i array<long>, diag_r array<double>",
        ).collect()
        parts.sort(key=lambda row: row.min_i)
        colsum = np.sum(
            np.stack([np.asarray(p.colsum, dtype="f8") for p in parts]), axis=0
        )
        rkk = np.empty(self.n, dtype="f8")
        for p in parts:
            rkk[np.searchsorted(self.ids, np.asarray(p.diag_i, dtype="i8"))] = (
                np.asarray(p.diag_r, dtype="f8")
            )
        return self.spark.sparkContext.broadcast((colsum, rkk))

    def _update(
        self, state: DataFrame, stats_bc, pref: float, lam: float
    ) -> DataFrame:
        """One full damped iteration given the broadcast column stats:
        recompute r_new (identical ``_r_block`` call as the stats kernel —
        cheaper than a second O(N²) materialization), apply the
        availability update, emit the next state with the diagonal s
        patched to the preference."""
        bc = self.bc

        def update_kernel(batches):
            import pandas as pd

            ids_b, _ = bc.value
            colsum, rkk = stats_bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                iv = pdf["i"].to_numpy(dtype="i8")
                s = _stack(pdf["s"])
                r = _stack(pdf["r"])
                a = _stack(pdf["a"])
                rows = np.arange(len(iv))
                di = np.searchsorted(ids_b, iv)
                s[rows, di] = pref
                r_new = _r_block(s, r, a, lam)
                rp = np.maximum(r_new, 0.0)
                rp[rows, di] = 0.0
                a_hat = np.minimum(0.0, rkk[None, :] + colsum[None, :] - rp)
                a_hat[rows, di] = colsum[di]
                a_new = lam * a + (1 - lam) * a_hat
                yield pd.DataFrame(
                    {"i": iv, "s": list(s), "r": list(r_new), "a": list(a_new)}
                )

        return state.mapInPandas(update_kernel, schema=_STATE_SCHEMA)

    def chain(
        self,
        iterations: int,
        lam: float = DAMPING,
        pref: str = "median",
        retain: bool = True,
    ) -> list[DataFrame]:
        """States after iterations 1..T.  ``retain=True`` checkpoints each
        lazily and keeps all (A9 reads every step — small-N only);
        ``retain=False`` keeps exactly one eager copy pinned, releasing
        the previous iteration's blocks (the ap.iterate() discipline),
        and returns only the final state."""
        p = self.pref_value(pref)
        jsc = self.spark.sparkContext._jsc

        def _ckpt_id(df: DataFrame) -> int:
            return df._jdf.queryExecution().analyzed().rdd().id()

        state = self.state0()
        states: list[DataFrame] = []
        prev_id: int | None = None
        for _ in range(iterations):
            stats_bc = self._col_stats(state, p, lam)
            state = self._update(state, stats_bc, p, lam)
            if retain:
                state = state.localCheckpoint(eager=False)
                states.append(state)
            else:
                state = state.localCheckpoint(eager=True)
                if prev_id is not None:
                    rdd = jsc.getPersistentRDDs().get(prev_id)
                    if rdd is not None:
                        rdd.unpersist()
                prev_id = _ckpt_id(state)
        return states if retain else [state]

    # -- consumers -----------------------------------------------------

    def exemplars(self, state: DataFrame) -> DataFrame:
        """{k : a(k,k) + r(k,k) > 0} as a (exemplar long) DataFrame."""
        bc = self.bc

        def ex_kernel(batches):
            import pandas as pd

            ids_b, _ = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                iv = pdf["i"].to_numpy(dtype="i8")
                r = _stack(pdf["r"])
                a = _stack(pdf["a"])
                rows = np.arange(len(iv))
                di = np.searchsorted(ids_b, iv)
                keep = (a[rows, di] + r[rows, di]) > 0
                yield pd.DataFrame({"exemplar": iv[keep]})

        return state.mapInPandas(ex_kernel, schema="exemplar long")

    def assign(self, state: DataFrame) -> DataFrame:
        """label(i) = argmax over exemplars k of s(i,k), ties to lowest k,
        exemplars labeled as themselves (the ap.assign semantics).  The
        exemplar set is collected (tiny) and broadcast into a row-local
        kernel — no N² relation is rebuilt for the final argmax."""
        ex = np.sort(
            np.array(
                [r.exemplar for r in self.exemplars(state).collect()],
                dtype="i8",
            )
        )
        bc = self.bc
        ex_bc = self.spark.sparkContext.broadcast(ex)

        def assign_kernel(batches):
            import pandas as pd

            ids_b, _ = bc.value
            exb = ex_bc.value
            if len(exb) == 0:
                return
            e_di = np.searchsorted(ids_b, exb)
            for pdf in batches:
                if not len(pdf):
                    continue
                iv = pdf["i"].to_numpy(dtype="i8")
                s = _stack(pdf["s"])
                vals = s[:, e_di]
                lab = exb[vals.argmax(1)]  # first occurrence == lowest k
                member = np.isin(iv, exb)
                lab[member] = iv[member]
                yield pd.DataFrame({"vec_id": iv, "exemplar": lab})

        return state.mapInPandas(
            assign_kernel, schema="vec_id long, exemplar long"
        )

    def coordinate_view(self, state: DataFrame) -> DataFrame:
        """Explode a blocked state to the coordinate relation
        (i, k, s, r, a) for consumers written against the reference
        engine (A4/A5/A9 at chain scale)."""
        bc = self.bc

        def explode_kernel(batches):
            import pandas as pd

            ids_b, _ = bc.value
            nn = len(ids_b)
            for pdf in batches:
                if not len(pdf):
                    continue
                iv = pdf["i"].to_numpy(dtype="i8")
                s = _stack(pdf["s"])
                r = _stack(pdf["r"])
                a = _stack(pdf["a"])
                yield pd.DataFrame(
                    {
                        "i": np.repeat(iv, nn),
                        "k": np.tile(ids_b, len(iv)),
                        "s": s.ravel(),
                        "r": r.ravel(),
                        "a": a.ravel(),
                    }
                )

        return state.mapInPandas(
            explode_kernel, schema="i long, k long, s double, r double, a double"
        )

    def off_diagonal(self) -> DataFrame:
        """Coordinate off-diagonal similarity (i, k, s) from the blocked
        zero state — same values as ap.similarity_off_diagonal."""
        view = self.coordinate_view(self.state0())
        return view.where(F.col("i") != F.col("k")).select("i", "k", "s")
