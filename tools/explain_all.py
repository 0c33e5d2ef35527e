#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for every bench entry into
plans/<tag>/<name>_<suffix>.txt (optimization-round deliverable, and
the plan-audit input: Exchange count, join strategy, PushedFilters /
ReadSchema, BatchEvalPython/ArrowEvalPython nodes).

Usage:
    python tools/explain_all.py --tag r15 --suffix before [name ...]

With no names, all BENCH_QUERIES + EXTRA_BENCH entries are dumped.
Entries whose construction itself runs eager jobs (localCheckpoint)
execute those jobs; this tool is not a timing tool.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import bench
    from union_indexer_node_spark import queries as q
    from union_indexer_node_spark.session import get_spark

    out_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="explain_all")
    reg = q.registry()
    names = args.names or [
        n for n in bench.BENCH_QUERIES if n in reg or n in bench.EXTRA_BENCH
    ]
    failures = []
    for n in names:
        fn = bench.EXTRA_BENCH[n] if n in bench.EXTRA_BENCH else reg[n].fn
        path = os.path.join(out_dir, f"{n}_{args.suffix}.txt")
        try:
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            failures.append(n)
            plan = "EXPLAIN FAILED:\n" + traceback.format_exc()
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    if failures:
        print(f"FAILED: {failures}")
        sys.exit(1)


if __name__ == "__main__":
    main()
