#!/usr/bin/env python3
"""Derive a 100x dedup-family probe dataset ("sf10") from sf0.1.

Only `documents` and `embeddings` — the tables the d/p/s dedup and
similarity operators read. 100 id-shifted EXACT copies: duplicate
multiplicity grows 100x, so within-cluster candidate pairs grow up to
10,000x — the adversarial worst case for pair-generating operators
(LSH banding, Jaccard refinement, embedding near-dup, cluster
formation). The probe question is whether ENGINE cost stays
proportional to semantic output size (which is genuinely quadratic in
multiplicity), with no task-level blowup beyond it.

Dev tooling only (duckdb is driver-side): the engine never depends on
this. Run: python3 tools/make_sf10_dedup.py, then
  SPARK_GRAFT_SF_DIR=/root/repo/benchdata/sf10 \
  SPARK_GRAFT_ONLY='^(d0[2457]|p0[12])' sbt "runMain graft.Bench"
"""
import os
import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/benchdata/sf10"
K = 100

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def mx(tbl: str, col: str) -> int:
    return con.sql(f"SELECT max({col})+1 FROM '{SRC}/{tbl}.parquet'").fetchone()[0]


D = mx("documents", "doc_id")
V = mx("embeddings", "vec_id")


def emit(tbl: str, replace: str) -> None:
    q = (f"COPY (SELECT * REPLACE ({replace}) FROM '{SRC}/{tbl}.parquet' "
         f"CROSS JOIN range({K}) r(k) ORDER BY k) "
         f"TO '{DST}/{tbl}.tmp.parquet' (FORMAT PARQUET)")
    con.sql(q)
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{DST}/{tbl}.tmp.parquet'").fetchall()]
    keep = ", ".join(c for c in cols if c != "k")
    con.sql(f"COPY (SELECT {keep} FROM '{DST}/{tbl}.tmp.parquet') "
            f"TO '{DST}/{tbl}.parquet' (FORMAT PARQUET)")
    os.remove(f"{DST}/{tbl}.tmp.parquet")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{tbl}.parquet'").fetchone()[0]
    print(f"{tbl}: {n} rows")


emit("documents", f"doc_id + k*{D} AS doc_id")
emit("embeddings", f"vec_id + k*{V} AS vec_id")
print("done")
