"""Regenerate the in-repo scale-test replicas (gitignored scratch data).

Replicates /root/testdata/sf0.1 with shifted keys via DuckDB:

    python tools/make_scale_testdata.py 10   # → .scale_test    (all tables)
    python tools/make_scale_testdata.py 100  # → .scale_test100 (all tables)

Replication multiplies duplicate content N× — deliberately adversarial
for the near-dup operators (see SCALING.md). Timestamps get +i µs so
events stay unique; dimension tables are copied unreplicated so joins
exercise fact-growth, not dim-growth.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPECS = {
    "lineitem": (
        "SELECT l_orderkey + i*10000000 AS l_orderkey, l_partkey, l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate FROM t, range({n}) r(i)"
    ),
    "orders": (
        "SELECT o_orderkey + i*10000000 AS o_orderkey, o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority FROM t, range({n}) r(i)"
    ),
    "events": (
        "SELECT event_id + i*100000000 AS event_id, ts + to_microseconds(i) AS ts, "
        "user_id + i*100000 AS user_id, event_type, value, props "
        "FROM t, range({n}) r(i)"
    ),
    "documents": (
        "SELECT doc_id + i*1000000 AS doc_id, text, lang, source, n_chars "
        "FROM t, range({n}) r(i)"
    ),
    "embeddings": (
        "SELECT vec_id + i*100000 AS vec_id, embedding, label FROM t, range({n}) r(i)"
    ),
}
DIMS = ("region", "nation", "customer", "supplier", "part")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dst = os.path.join(REPO, ".scale_test" if factor == 10 else f".scale_test{factor}")
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for name in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{name}.parquet') TO '{dst}/{name}.parquet' (FORMAT PARQUET)"
        )
    tables = tuple(SPECS)
    for name in tables:
        con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{SRC}/{name}.parquet'")
        con.execute(
            f"COPY ({SPECS[name].format(n=factor)}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)"
        )
        print(name, "done")
    print("wrote", dst)


if __name__ == "__main__":
    main()
