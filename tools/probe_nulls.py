"""Null-injection adversarial probe: the empty-corpus sweep's sibling.

The synthetic testdata has no NULLs, but a 100 TB corpus does —
documents with failed text extraction, missing language tags, unknown
sources, null embeddings. A query that crashes on them (ANSI-mode
element_at, unguarded casts) or silently diverges from the oracle
(three-valued-logic asymmetries between engines) is a latent production
bug this probe surfaces BEFORE the data does.

It builds a replica of an sf dir with deterministic NULL injection —
md5-keyed so both engines see the identical corruption —

  documents:  ~5% text NULL, ~5% lang NULL, ~5% source NULL
              (disjoint slices, keyed on doc_id)
  embeddings: ~5% embedding NULL (keyed on vec_id)
  events:     ~5% user_id NULL (logged-out), ~5% event_type NULL,
              ~5% props NULL, ~5% value NULL (keyed on event_id)

The TPC-H tables (orders/lineitem/...) stay pristine: their columns are
NOT NULL by spec, and the relational queries' semantics under spec
violation aren't a contract worth defining.

— then runs the standard oracle gate (`tools/check_oracle.py`) against
the replica: every declared query must still run AND still hash-match
DuckDB on the corrupted tables.

Usage:
    python tools/probe_nulls.py [src_sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from biodata_pipeline_spark.sources.tables import TABLES  # noqa: E402

REPLICA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".null_test")


def build_replica(src: str) -> str:
    os.makedirs(REPLICA, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src_path = f"{src}/{t}.parquet"
        dst = f"{REPLICA}/{t}.parquet"
        if t == "documents":
            sql = f"""
                SELECT doc_id,
                       CASE WHEN md5('nulltext' || CAST(doc_id AS VARCHAR)) < '0c' THEN NULL ELSE text END AS text,
                       CASE WHEN md5('nulllang' || CAST(doc_id AS VARCHAR)) < '0c' THEN NULL ELSE lang END AS lang,
                       CASE WHEN md5('nullsrc'  || CAST(doc_id AS VARCHAR)) < '0c' THEN NULL ELSE source END AS source,
                       n_chars
                FROM '{src_path}'
            """
        elif t == "events":
            sql = f"""
                SELECT event_id, ts,
                       CASE WHEN md5('nulluser' || CAST(event_id AS VARCHAR)) < '0c' THEN NULL ELSE user_id END AS user_id,
                       CASE WHEN md5('nulltype' || CAST(event_id AS VARCHAR)) < '0c' THEN NULL ELSE event_type END AS event_type,
                       CASE WHEN md5('nullval'  || CAST(event_id AS VARCHAR)) < '0c' THEN NULL ELSE value END AS value,
                       CASE WHEN md5('nullprop' || CAST(event_id AS VARCHAR)) < '0c' THEN NULL ELSE props END AS props
                FROM '{src_path}'
            """
        elif t == "embeddings":
            cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src_path}'").fetchall()]
            keep = ", ".join(c for c in cols if c != "embedding")
            sql = f"""
                SELECT {keep},
                       CASE WHEN md5('nullemb' || CAST(vec_id AS VARCHAR)) < '0c' THEN NULL ELSE embedding END AS embedding
                FROM '{src_path}'
            """
        else:
            sql = f"SELECT * FROM '{src_path}'"
        con.sql(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
    return REPLICA


if __name__ == "__main__":
    args = sys.argv[1:]
    src = args[0] if args else "/root/testdata/sf0.001"
    replica = build_replica(src)
    print(f"null-injected replica: {replica} (from {src})")
    sys.argv = [sys.argv[0], replica, *args[1:]]
    from tools.check_oracle import main

    raise SystemExit(main())
