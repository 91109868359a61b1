#!/usr/bin/env python3
"""Derive a 100x RELATIONAL-join probe dataset ("sf10join") from sf0.1.

100 key-shifted copies of the join fact/dim tables (customer, supplier,
part, orders, lineitem — and, since round 7, events), preserving
referential integrity exactly like tools/make_sf1.py: copy k shifts
each surrogate-key family by k * (max+1), so every join matches exactly
one copy and nothing fans out artificially. region/nation stay
single-copy (SF-independent in TPC-H). documents/embeddings are copied
UNSCALED from sf0.1 — no probe query here reads them, but
`Tables.registerAll` (q32) must find every table.

events scales WITH user_id shifted by the customer stride (events join
orders on user_id = o_custkey in the as-of family), giving e03/e05/e06
their 100x datapoint (VERDICT r6 task 4): 2M purchase events as-of-
matched against 15M orders. The nanosecond `ts` is emitted as BIGINT
epoch-nanos — `Tables.loadEvents` reads the original TIMESTAMP(NANOS)
physical type as long anyway (legacy nanosAsLong), so both layouts hit
the identical downstream path.

This is the measurement VERDICT r5 task 1 asks for: the dedup family
got its 100x adversarial probe in r5; this gives the heavy join shapes
(q36 triple lineitem self-join, q38 NAAJ, q39 chained semi joins, q32
lateral top-n, q25 min-over-group join-back) their own attributable
100x datapoint, run ONE AT A TIME via SPARK_GRAFT_ONLY.

Dev tooling only (duckdb is driver-side): the engine never depends on
this. Run: python3 tools/make_sf10_join.py, then per query:
  SPARK_GRAFT_SF_DIR=/root/repo/benchdata/sf10join \
  SPARK_GRAFT_ONLY='^q36_' SPARK_GRAFT_ITERS=2 sbt "runMain graft.Bench"
"""
import os
import shutil

import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/benchdata/sf10join"
K = 100

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def mx(tbl: str, col: str) -> int:
    return con.sql(f"SELECT max({col})+1 FROM '{SRC}/{tbl}.parquet'").fetchone()[0]


C = mx("customer", "c_custkey")
S = mx("supplier", "s_suppkey")
P = mx("part", "p_partkey")
O = mx("orders", "o_orderkey")


def emit(tbl: str, replace: str = "", copies: int = K) -> None:
    rep = f"REPLACE ({replace})" if replace else ""
    # ORDER BY k keeps copies contiguous -> row-group min/max stays
    # selective per key range, same layout choice as make_sf1.py
    q = (f"COPY (SELECT * {rep} FROM '{SRC}/{tbl}.parquet' "
         f"CROSS JOIN range({copies}) r(k) ORDER BY k) "
         f"TO '{DST}/{tbl}.tmp.parquet' (FORMAT PARQUET)")
    con.sql(q)
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{DST}/{tbl}.tmp.parquet'").fetchall()]
    keep = ", ".join(c for c in cols if c != "k")
    con.sql(f"COPY (SELECT {keep} FROM '{DST}/{tbl}.tmp.parquet') "
            f"TO '{DST}/{tbl}.parquet' (FORMAT PARQUET)")
    os.remove(f"{DST}/{tbl}.tmp.parquet")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{tbl}.parquet'").fetchone()[0]
    print(f"{tbl}: {n} rows", flush=True)


emit("region", copies=1)
emit("nation", copies=1)
emit("customer", f"c_custkey + k*{C} AS c_custkey")
emit("supplier", f"s_suppkey + k*{S} AS s_suppkey")
emit("part", f"p_partkey + k*{P} AS p_partkey")
emit("orders", f"o_orderkey + k*{O} AS o_orderkey, o_custkey + k*{C} AS o_custkey")
emit("lineitem", f"l_orderkey + k*{O} AS l_orderkey, l_partkey + k*{P} AS l_partkey, "
                 f"l_suppkey + k*{S} AS l_suppkey")

# events: the as-of family's probe side — user_id rides the customer
# stride so each copy's events match exactly that copy's orders
E = mx("events", "event_id")
emit("events", f"event_id + k*{E} AS event_id, user_id + k*{C} AS user_id, "
               f"epoch_ns(ts) AS ts")

# unscaled pass-throughs so Tables.registerAll resolves (q32)
for t in ["documents", "embeddings"]:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    print(f"{t}: copied unscaled", flush=True)
print("done")
