#!/usr/bin/env python3
"""Derive a 10x scale probe dataset (\"sf1\") from sf0.1.

Ten key-shifted copies of every fact/dim table, preserving referential
integrity: copy k shifts each surrogate key family by k * (max+1), so
joins match exactly one copy and nothing fans out artificially. Dims
that are SF-independent in TPC-H (region, nation) stay single-copy.

Text/embedding payloads are EXACT copies (ids shifted): duplicate
clusters grow 10x in multiplicity, which over-stresses the dedup
family relative to an organic sf1 corpus — that is deliberate
(worst-case for the pair-generation operators), and the q-family
numbers are the clean data-proportional scale signal.

Dev tooling only (duckdb is driver-side): the engine itself never
depends on this.
"""
import os
import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/benchdata/sf1"
K = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def mx(tbl: str, col: str) -> int:
    return con.sql(f"SELECT max({col})+1 FROM '{SRC}/{tbl}.parquet'").fetchone()[0]

C = mx("customer", "c_custkey")
S = mx("supplier", "s_suppkey")
P = mx("part", "p_partkey")
O = mx("orders", "o_orderkey")
E = mx("events", "event_id")
D = mx("documents", "doc_id")
V = mx("embeddings", "vec_id")

def emit(tbl: str, replace: str = "", copies: int = K) -> None:
    rep = f"REPLACE ({replace})" if replace else ""
    q = (f"COPY (SELECT * {rep} FROM '{SRC}/{tbl}.parquet' "
         f"CROSS JOIN range({copies}) r(k) ORDER BY k) "
         f"TO '{DST}/{tbl}.parquet' (FORMAT PARQUET)")
    con.sql(q)
    n = con.sql(f"SELECT count(*) FROM '{DST}/{tbl}.parquet'").fetchone()[0]
    print(f"{tbl}: {n} rows")

emit("region", copies=1)
emit("nation", copies=1)
emit("customer", "c_custkey + k*{} AS c_custkey".format(C))
emit("supplier", "s_suppkey + k*{} AS s_suppkey".format(S))
emit("part", "p_partkey + k*{} AS p_partkey".format(P))
emit("orders", f"o_orderkey + k*{O} AS o_orderkey, o_custkey + k*{C} AS o_custkey")
emit("lineitem", f"l_orderkey + k*{O} AS l_orderkey, l_partkey + k*{P} AS l_partkey, "
                 f"l_suppkey + k*{S} AS l_suppkey")

# events carries parquet TIMESTAMP(NANOS), which DuckDB silently reads
# as microseconds — go through pyarrow so the physical type (and the
# engine's nanosAsLong load path) survives
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ev = pq.read_table(f"{SRC}/events.parquet")
# testdata generations ship ts as either TIMESTAMP(NANOS) or
# TIMESTAMP(MICROS); preserve whichever physical type the source has
# (the engine's loadEvents adapts on the observed type)
ts_type = str(ev.schema.field("ts").type)
assert ts_type in ("timestamp[ns]", "timestamp[us]"), ev.schema
parts = []
for k in range(K):
    t2 = ev.set_column(ev.schema.get_field_index("event_id"), "event_id",
                       pc.add(ev["event_id"], k * E))
    t2 = t2.set_column(t2.schema.get_field_index("user_id"), "user_id",
                       pc.add(t2["user_id"], k * C))
    parts.append(t2)
out = pa.concat_tables(parts)
pq.write_table(out, f"{DST}/events.parquet", version="2.6")
got = str(pq.read_schema(f"{DST}/events.parquet").field("ts").type)
assert got == ts_type, (got, ts_type)
print(f"events: {out.num_rows} rows ({ts_type} preserved)")
emit("documents", f"doc_id + k*{D} AS doc_id")
emit("embeddings", f"vec_id + k*{V} AS vec_id")

# the range(k) helper column must not survive
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{DST}/{t}.parquet'").fetchall()]
    if "k" in cols:
        keep = ", ".join(c for c in cols if c != "k")
        con.sql(f"COPY (SELECT {keep} FROM '{DST}/{t}.parquet') "
                f"TO '{DST}/{t}.tmp.parquet' (FORMAT PARQUET)")
        os.replace(f"{DST}/{t}.tmp.parquet", f"{DST}/{t}.parquet")
print("done")
