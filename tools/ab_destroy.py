"""Warm-session A/B: per-iteration Broadcast.destroy() vs no-op.

Round-7 added `stats_bc.destroy()` inside both fused AP loops
(ap_dense.py); the round-7 driver bench regressed ap_assign +40% and
ap_assign_sparse +36%.  This measures the destroy cost in ONE warm JVM
(the host has 1.3-2x neighbor-load variance across sessions, so only a
same-session alternating A/B is trustworthy).  Alternates
A(destroy)/B(noop) x ROUNDS and prints per-arm minima.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.broadcast import Broadcast

from affinity_propagation_mapreduce_spark import registry
from affinity_propagation_mapreduce_spark.operators import ap
from affinity_propagation_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 3
QUERIES = ["ap_assign", "ap_assign_sparse"]

real_destroy = Broadcast.destroy


def run_once(spark, qs, name):
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rdd in jsc.getPersistentRDDs().values():
        rdd.unpersist()
    ap.clear_cache()
    t0 = time.monotonic()
    qs[name](spark, SF_DIR).count()
    return time.monotonic() - t0


def main():
    spark = get_spark("ab-destroy")
    qs = registry.queries()
    for q in QUERIES:  # warmup (JIT, testdata cache, python workers)
        run_once(spark, qs, q)
    res = {q: {"A": [], "B": []} for q in QUERIES}
    for r in range(ROUNDS):
        for arm in ("A", "B"):
            Broadcast.destroy = real_destroy if arm == "A" else (lambda self, blocking=False: None)
            for q in QUERIES:
                dt = run_once(spark, qs, q)
                res[q][arm].append(round(dt, 3))
                print(f"round {r} arm {arm} {q}: {dt:.3f}s", flush=True)
    Broadcast.destroy = real_destroy
    for q in QUERIES:
        a, b = min(res[q]["A"]), min(res[q]["B"])
        print(f"{q}: destroy(min)={a:.3f}s noop(min)={b:.3f}s delta={a-b:+.3f}s  all={res[q]}")


if __name__ == "__main__":
    main()
