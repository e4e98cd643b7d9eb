#!/usr/bin/env python3
"""Generate a K-times scaled sweep dataset from an existing SF dir.

The driver ships sf0.001/0.01/0.1; the 100 TB story wants evidence one
decade further out. This derives a ~sf0.5 dir from sf0.1 (default K=5)
WITHOUT inventing new data: every row is a deterministic replica of a
driver-generated row, so DuckDB replays the exact same derivation when
the oracles run against the scaled dir.

- documents: doc_id offset per replica, text IDENTICAL across replicas —
  deliberate: exact/near-dup clusters grow 5x, stressing the bucket caps
  and component machinery the dedup family guards with.
- embeddings: vec_id offset; dimensions ROTATED by the replica index, so
  intra-replica geometry (and each replica's component structure) is
  preserved exactly while replicas stay geometrically independent —
  without this, identical vectors would fuse all replicas into one
  5x-sized component and the closure-form component oracles would go
  quadratic.
- lineitem/orders: order keys offset per replica (join integrity kept);
  part/customer keys untouched, so co-occurrence graphs densify — the
  graph family's stress.
- remaining tables: copied 1x (dims and events are not sweep targets,
  but check.py registers all ten views).
- row groups: the replicated tables are written with EXPLICIT small
  row groups (documents/embeddings 4096 rows, lineitem/orders 131072)
  because parquet row groups are Spark's split unit: a single-group
  file scans as ONE task at any SF, flooring every documents-heavy
  gate to 1 core and understating local[32] headroom (SCALING_r12's
  'harness artifact' note). Small groups let the timing study measure
  the engine, not the fixture layout.

Usage: python3 tools/sweep_gen.py [src_sf_dir] [dst_dir] [K]
"""
import os
import shutil
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sweep5x"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 5
OFF = 100_000_000

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

con.sql(f"""COPY (
  SELECT d.doc_id + t.r * {OFF} AS doc_id, d.text, d.lang, d.source, d.n_chars
  FROM '{src}/documents.parquet' d CROSS JOIN range({K}) t(r)
  ORDER BY doc_id
) TO '{dst}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 4096)""")
print("documents:", con.sql(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0])

con.sql(f"""COPY (
  SELECT e.vec_id + t.r * {OFF} AS vec_id,
         list_concat(e.embedding[t.r + 1:], e.embedding[1:t.r]) AS embedding,
         e.label
  FROM '{src}/embeddings.parquet' e CROSS JOIN range({K}) t(r)
  ORDER BY vec_id
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 4096)""")
print("embeddings:", con.sql(f"SELECT count(*) FROM '{dst}/embeddings.parquet'").fetchone()[0])

con.sql(f"""COPY (
  SELECT l.* REPLACE (l.l_orderkey + t.r * {OFF} AS l_orderkey)
  FROM '{src}/lineitem.parquet' l CROSS JOIN range({K}) t(r)
) TO '{dst}/lineitem.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 131072)""")
print("lineitem:", con.sql(f"SELECT count(*) FROM '{dst}/lineitem.parquet'").fetchone()[0])

con.sql(f"""COPY (
  SELECT o.* REPLACE (o.o_orderkey + t.r * {OFF} AS o_orderkey)
  FROM '{src}/orders.parquet' o CROSS JOIN range({K}) t(r)
) TO '{dst}/orders.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 131072)""")
print("orders:", con.sql(f"SELECT count(*) FROM '{dst}/orders.parquet'").fetchone()[0])

for t in ["region", "nation", "customer", "supplier", "part", "events"]:
    shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    print(f"{t}: copied 1x")

# sanity: embedding rotation preserved vector norms (same multiset of dims)
chk = con.sql(f"""
  SELECT max(abs(a.n - b.n)) FROM
    (SELECT vec_id % {OFF} AS base, list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)) AS n
     FROM '{dst}/embeddings.parquet' WHERE vec_id >= {OFF}) a
    JOIN
    (SELECT vec_id AS base, list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)) AS n
     FROM '{src}/embeddings.parquet') b USING (base)
""").fetchone()[0]
assert chk is None or chk < 1e-9, f"rotation changed a norm by {chk}"
print("norm-preservation check passed")
