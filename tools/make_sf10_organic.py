#!/usr/bin/env python3
"""Derive an ORGANIC 100x documents corpus ("sf10organic") from sf0.1.

The existing sf10 dedup fixture is 100 EXACT copies — ideal for
worst-casing pair generation, but useless for measuring how the
incremental-curation state grows under NOVELTY: every day of it
deduplicates to nothing and the index flatlines by construction.

Here each of the 100 copies is made genuinely novel: every 4th word is
replaced by a copy-unique token (`n<k>x<i>`), so ~75% of 3-shingles
differ between copies (Jaccard ~0.15, far below the 0.8 near-dup
threshold) while stopword density, token counts, and mean word length
stay in the gopher-gate band. Ids shift by copy as usual.

Dev tooling only (duckdb is driver-side): the engine never depends on
this. Output: benchdata/sf10organic/documents.parquet (~500k rows).
"""
import os
import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/benchdata/sf10organic"
K = 100

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
D = con.sql(f"SELECT max(doc_id)+1 FROM '{SRC}/documents.parquet'").fetchone()[0]

con.sql(f"""
COPY (
  SELECT doc_id + k * {D} AS doc_id,
         array_to_string(
           list_transform(string_split(text, ' '),
             (w, i) -> CASE WHEN i % 4 = 0 THEN 'n' || k || 'x' || i
                       ELSE w END),
           ' ') AS text
  FROM '{SRC}/documents.parquet', range({K}) t(k)
) TO '{DST}/documents.parquet' (FORMAT PARQUET)
""")
n = con.sql(f"SELECT count(*), count(DISTINCT text) FROM '{DST}/documents.parquet'").fetchone()
print(f"sf10organic: {n[0]} rows, {n[1]} distinct texts")
