"""Run the driver-style parity check locally.

Usage: python tools/check_parity.py [name ...]   (default: all declared)
       SPARK_GRAFT_SF_DIR overrides the sf dir (default sf0.01).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from affinity_propagation_mapreduce_spark import registry
from affinity_propagation_mapreduce_spark.plans.verify import compare
from affinity_propagation_mapreduce_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("parity-check")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = registry.queries(), registry.oracle_sql()
    names = sys.argv[1:] or list(qs)
    failed = []
    for name in names:
        t0 = time.time()
        if name not in oracles:
            n = qs[name](spark, sf_dir).count()
            print(f"{name:28s} ROWS-ONLY rows={n}  ({time.time()-t0:.1f}s)")
            continue
        try:
            rep = compare(name, qs[name](spark, sf_dir), oracles[name], sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} ERROR {type(exc).__name__}: {exc}")
            failed.append(name)
            continue
        status = "OK" if rep.ok else "FAIL"
        print(f"{name:28s} {status} rows={rep.spark_rows}  ({time.time()-t0:.1f}s) {rep.detail}")
        if not rep.ok:
            failed.append(name)
            for a, b in rep.mismatches:
                print(f"    spark={a}\n    duck ={b}")
    print(f"\n{len(names)-len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
