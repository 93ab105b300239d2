"""Above-testdata text-dedup execution — the MinHash twin of
tools/above_gate_run.py.

The banded-LSH pipeline (textops.q_dedup_near_minhash) is hash-verified
at sf0.01 and growth-law-bounded in CI, but — like the AP paths before
round 8 — had never RUN at a corpus size where the broadcast-verify gate
trips and the keyed-shuffle verify branch is the live one.  This runner
synthesizes an N-doc corpus WITH SPARK (no driver-side row loop: tokens
are deterministic functions of (base_id, position) via xxhash64, every
20th doc a one-token mutation of its predecessor → fixed ~5% true-dup
rate) and times the real operator end-to-end.

  python tools/text_scale_run.py 100000
  python tools/text_scale_run.py 500000

Prints one JSON line: wall seconds, emitted pair count, docs/sec.
Measured results are recorded in BASELINE.md §above-gate.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from affinity_propagation_mapreduce_spark.operators import textops
from affinity_propagation_mapreduce_spark.session import get_spark

VOCAB = 5_000
DOC_TOKENS = 30
DUP_STEP = 20  # every 20th doc mutates its predecessor → ~5% dup rate


def synth_docs(spark, n: int):
    """Distributed deterministic corpus, same dup structure as
    tests/test_growth_law.py::_synthetic_docs but generated on executors:
    doc i%step==1 shares base_id with doc i-1 and flips one position."""
    base = F.col("id") - (F.col("id") % DUP_STEP == 1).cast("long")
    mut_pos = F.pmod(F.xxhash64(F.col("id"), F.lit("mut")), F.lit(DOC_TOKENS))
    is_mut = (F.col("id") % DUP_STEP == 1).cast("long")
    tok = (
        "transform(sequence(0, {m}), j -> concat('w', pmod(xxhash64(base_id,"
        " j), {v}) + CASE WHEN is_mut = 1 AND j = mut_pos THEN {v} ELSE 0"
        " END))".format(m=DOC_TOKENS - 1, v=VOCAB)
    )
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            base.alias("base_id"),
            is_mut.alias("is_mut"),
            mut_pos.alias("mut_pos"),
        )
        .select("doc_id", F.concat_ws(" ", F.expr(tok)).alias("text"))
    )


def pipeline(n: int) -> None:
    """The composed curation DAG at scale (r13 verdict "next" #5 done
    criterion): run pipeline_curation_report_scaled — the banded-
    MinHash formulation of the hashed pipeline_curation_report key —
    over an N-doc synthetic corpus and print the per-stage ledger +
    wall.  python tools/text_scale_run.py --pipeline 2000000"""
    from affinity_propagation_mapreduce_spark.operators.curation import (
        pipeline_curation_report_scaled,
    )

    spark = get_spark("text-scale-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    # r15 measured NEGATIVE result: scaling shuffle partitions with n
    # (tried max(32, n // 50k)) does NOT move the >6M-doc spill
    # ceiling — the binding term is total shuffle-WRITE volume of the
    # shingle-explode stage (∝ corpus), not sorter merge passes, so
    # partition count only changes file granularity.  The ceiling is a
    # disk-provisioning fact: ~5 GB scratch per 1M docs (BASELINE.md
    # §curation growth law).
    docs = synth_docs(spark, n).localCheckpoint(eager=True)
    t0 = time.time()
    rows = sorted(
        pipeline_curation_report_scaled(spark, docs).collect(),
        key=lambda r: r.stage,
    )
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "op": "pipeline_curation_report_scaled",
                "n_docs": n,
                "wall_sec": round(wall, 1),
                "docs_per_sec": round(n / wall),
                "stages": [
                    {
                        "stage": r.stage,
                        "n_units": r.n_units,
                        "n_removed": r.n_removed,
                        "n_tokens": r.n_tokens,
                    }
                    for r in rows
                ],
            }
        ),
        flush=True,
    )


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--pipeline":
        pipeline(int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000)
        return 0
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("text-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_docs(spark, n).localCheckpoint(eager=True)  # exclude synth cost
    t0 = time.time()
    span_rows = textops.q_span_dedup(spark, sf_dir=None, docs=docs).count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "op": "span_dedup",
                "n_docs": n,
                "wall_sec": round(wall, 1),
                "rows": span_rows,
                "docs_per_sec": round(n / wall),
            }
        ),
        flush=True,
    )
    for branch, bv in (("broadcast_verify", True), ("shuffle_verify", False)):
        # forcing the broadcast branch past the production gate collects
        # the whole shingle dimension to the driver and trips
        # spark.driver.maxResultSize (found by running N=5M) — the auto
        # path switches branches at the gate, so above it only the
        # shuffle branch is a real execution mode
        if bv and n > textops._MINHASH_BROADCAST_MAX_DOCS:
            print(
                json.dumps(
                    {
                        "op": "dedup_near_minhash",
                        "branch": branch,
                        "n_docs": n,
                        "skipped": "above _MINHASH_BROADCAST_MAX_DOCS — "
                        "auto path uses shuffle_verify",
                    }
                ),
                flush=True,
            )
            continue
        t0 = time.time()
        pairs = textops.q_dedup_near_minhash(
            spark, sf_dir=None, broadcast_verify=bv, docs=docs
        ).count()
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "op": "dedup_near_minhash",
                    "branch": branch,
                    "n_docs": n,
                    "wall_sec": round(wall, 1),
                    "pairs": pairs,
                    "docs_per_sec": round(n / wall),
                    "true_dups": n // DUP_STEP,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
