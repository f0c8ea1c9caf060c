"""Tile the sf0.1 fixture into a larger benchmark dataset.

The BASELINE.md bench gate ("engine wall-clock <= 2x baseline per query")
is evaluated against the DuckDB oracle. At sf0.1 most baseline queries
finish in ~0.1 s, so the comparison measures Spark's fixed per-query
floor (JVM scheduling, AQE, Py4J — ~0.3-0.5 s on local[32]) rather than
plan quality. This script builds sfN = N copies of sf0.1 with key-offset
tiling so both engines do enough work for the ratio to reflect the plans
(VERDICT.md round 1, item 7).

Key handling per copy i (i = 0..N-1):
- region/nation: dimension tables, kept as-is (copied once).
- customer/supplier/part/orders/lineitem: every entity key is offset by
  i * KEY_STRIDE, preserving referential integrity (an order in copy i
  points at the copy-i customer; a lineitem at the copy-i order/part/
  supplier) and leaving join fan-outs identical to sf0.1 per copy.
- events: event_id/user_id offset; ts shifted by i days so windows and
  sessions from different copies don't merge.
- documents: doc_id offset; text salted with a per-copy suffix token so
  cross-copy exact/near-dup pairs don't explode quadratically with N
  (each copy keeps its own internal duplicate structure).
- embeddings: vec_id offset; vectors unchanged (ANN probes stay valid).

Usage: python scripts/make_scaled_data.py [N] [out_dir]
Defaults: N=10, out_dir=/root/repo/.benchdata/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
KEY_STRIDE = 10_000_000


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.benchdata/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT unnest(range(0, {n})) AS i")

    def tile(table: str, select: str, dim: bool = False, fsz: str = '8MB') -> None:
        src = f"read_parquet('{SRC}/{table}.parquet')"
        q = (
            f"SELECT {select} FROM {src}"
            if dim
            else f"SELECT {select} FROM {src}, copies"
        )
        # Fact tables are written as multi-file directories (one file per
        # copy): a single large parquet file under maxPartitionBytes would
        # serialize Spark's scan to one task, which no real 100 TB layout
        # does — while DuckDB parallelizes row groups inside one file.
        # Keeping both engines on the same multi-file layout keeps the
        # bench comparison honest.
        if dim:
            con.execute(f"COPY ({q}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        else:
            con.execute(
                f"COPY ({q}) TO '{out}/{table}.parquet' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE 20000, FILE_SIZE_BYTES '{fsz}', OVERWRITE_OR_IGNORE)"
            )
        pat = f"{out}/{table}.parquet" + ("" if dim else "/*.parquet")
        rows = con.execute(f"SELECT COUNT(*) FROM read_parquet('{pat}')").fetchone()[0]
        print(f"{table}: {rows} rows")

    k = f"i * {KEY_STRIDE}"
    tile("region", "*", dim=True)
    tile("nation", "*", dim=True)
    tile("customer", f"c_custkey + {k} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
    tile("supplier", f"s_suppkey + {k} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    tile("part", f"p_partkey + {k} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
    tile("orders", f"o_orderkey + {k} AS o_orderkey, o_custkey + {k} AS o_custkey, "
                   "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    tile("lineitem", f"l_orderkey + {k} AS l_orderkey, l_partkey + {k} AS l_partkey, "
                     f"l_suppkey + {k} AS l_suppkey, l_linenumber, l_quantity, "
                     "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
    tile("events", f"event_id + {k} AS event_id, ts + to_days(CAST(i AS INTEGER)) AS ts, "
                   f"user_id + {k} AS user_id, event_type, value, props")
    tile("documents", fsz="1MB", select=f"doc_id + {k} AS doc_id, "
                      "CASE WHEN i = 0 THEN text ELSE text || ' copysalt' || i END AS text, "
                      "lang, source, n_chars + CASE WHEN i = 0 THEN 0 ELSE 9 + len(CAST(i AS VARCHAR)) END AS n_chars")
    tile("embeddings", fsz="1MB", select=f"vec_id + {k} AS vec_id, embedding, label")


if __name__ == "__main__":
    main()
