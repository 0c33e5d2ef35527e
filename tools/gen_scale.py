"""One-off scale-up generator for the sf>=0.5 oracle stress sweep
(VERDICT r14 item 4).

Correctness has only ever been driver-proven at sf0.01 and locally
swept at sf0.1; the skew paths (salted referential audit, hot-bucket
caps, banded joins) and the int-exact aggregates are exactly the code
whose bugs appear only with more data. This script builds an
sf0.5-shaped copy of the synthetic tables by KEY-OFFSET REPLICATION
of /root/testdata/sf0.1: every id column gets +10M per replica (one
uniform offset, so every foreign-key relationship is preserved within
a replica), the fixed dimensions (region, nation) are copied
verbatim, and the payload columns — text, embeddings, timestamps,
prices — are kept byte-identical across replicas ON PURPOSE:

- identical text 5x over = every document sits in a 5-clique of exact
  duplicates -> hot shingles, hot LSH buckets, max-pressure on the
  stop-shingle caps and bucket caps;
- identical vectors 5x over = exact similarity ties -> max-pressure
  on every top-k tie-break discipline;
- identical timestamps 5x over = 5x-tall time buckets -> bigger
  int-exact aggregates.

The sweep itself is engine-vs-engine (Spark vs DuckDB on the same
parquet), so the data only needs the driver's schemas and key
uniqueness — both of which replication preserves — not its exact
distributions. Output goes under testdata_scaled/ (gitignored;
/root/testdata is read-only by contract).

Usage: python tools/gen_scale.py [--replicas 5] [--out testdata_scaled/sf0.5]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000  # > any sf0.1 key space (max is l_orderkey ~600k)

# id columns to offset per table; dims absent = copied verbatim
ID_COLS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}


def scale_table(name: str, replicas: int, out_dir: str) -> int:
    tbl = pq.read_table(f"{SRC}/{name}.parquet")
    cols = ID_COLS[name]
    if not cols:
        out = tbl
    else:
        parts = [tbl]
        for k in range(1, replicas):
            rep = tbl
            for c in cols:
                shifted = pc.add(
                    rep.column(c), pa.scalar(k * OFFSET, type=pa.int64())
                ).cast(tbl.schema.field(c).type)
                rep = rep.set_column(
                    rep.schema.get_field_index(c),
                    tbl.schema.field(c),
                    shifted,
                )
            parts.append(rep)
        out = pa.concat_tables(parts)
    pq.write_table(out, f"{out_dir}/{name}.parquet")
    return out.num_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=5)
    ap.add_argument("--out", default="testdata_scaled/sf0.5")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in ID_COLS:
        n = scale_table(name, args.replicas, args.out)
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
