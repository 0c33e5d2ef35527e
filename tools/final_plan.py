"""Post-execution (AQE-final) plan dumper (measurement tool).

`explain()` under AQE shows the INITIAL plan; exchange/stage reuse and
join-strategy switches only appear in the final adaptive plan after the
query has run. This runs the named entries to completion via the noop
sink and prints the executed plan, so duplicated-subtree diagnoses are
made against what actually ran. Pure diagnostics; never part of the
driver contract.

Usage: python tools/final_plan.py name1 [name2 ...]
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from union_indexer_node_spark import queries as q
    from union_indexer_node_spark.session import get_spark

    spark = get_spark(app_name="final_plan")
    reg = q.registry()
    # validate up front (ADVICE r15): an unknown name used to surface as
    # a bare KeyError with no usable message
    valid = set(reg) | set(bench.EXTRA_BENCH)
    unknown = [n for n in names if n not in valid]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        print(f"valid names: {sorted(valid)}", file=sys.stderr)
        spark.stop()
        sys.exit(2)
    try:
        for n in names:
            fn = bench.EXTRA_BENCH[n] if n in bench.EXTRA_BENCH else reg[n].fn
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            print(f"==== {n} (executed/final adaptive plan) ====")
            print(df._jdf.queryExecution().executedPlan().toString())
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
