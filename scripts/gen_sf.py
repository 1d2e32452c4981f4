#!/usr/bin/env python3
"""Scale the driver's sf0.1 testdata to sf1 (or any multiple) for the
oracle sweep: the driver only ships sf<=0.1, but the correctness gate
(Spark vs DuckDB on the SAME parquet) is scale-free, so a faithful
10x replication is enough to exercise every query at sf1.

Construction (deterministic, no RNG): MULT disjoint copies of every
fact table with per-copy key offsets (stride = max key + 1, so the
copies' join graphs stay disjoint and referential integrity holds),
dimension tables (region/nation) verbatim. Monetary values get a tiny
per-copy deterministic jitter (+i*0.01) so top-k boundaries don't tie
across copies (ties at a LIMIT boundary are the one place Spark and
DuckDB could legitimately disagree); one embedding dimension gets the
same treatment. Text/timestamps/categoricals stay verbatim - exact
duplicate documents across copies are the realistic crawl shape the
dedup family expects, and identical ts distributions keep the window
queries' shapes.

Timestamps pass through DuckDB as timestamp[us] - the post-Aug-2026
driver encoding (the schema-adaptive Tables.events reads either).

Usage: python3 scripts/gen_sf.py [outDir] [mult]
       defaults: target/testdata/sf1 10
"""
import sys, os
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "target/testdata/sf1"
MULT = int(sys.argv[2]) if len(sys.argv) > 2 else 10

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW copies AS SELECT unnest(range({MULT})) AS i")

def stride(table, key):
    return con.execute(
        f"SELECT max({key}) + 1 FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()[0]

def gen(table, select_sql):
    con.execute(
        f"COPY ({select_sql}) TO '{OUT}/{table}.parquet' (FORMAT parquet)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{OUT}/{table}.parquet')"
    ).fetchone()[0]
    print(f"  {table}: {n} rows")

def src(table):
    return f"read_parquet('{SRC}/{table}.parquet')"

# dimensions: verbatim
for t in ("region", "nation"):
    gen(t, f"SELECT * FROM {src(t)}")

kc = stride("customer", "c_custkey")
gen("customer", f"""
  SELECT c_custkey + i*{kc} AS c_custkey, c_name, c_nationkey,
         c_acctbal + i*0.01 AS c_acctbal, c_mktsegment
  FROM {src('customer')}, copies ORDER BY c_custkey""")

ks = stride("supplier", "s_suppkey")
gen("supplier", f"""
  SELECT s_suppkey + i*{ks} AS s_suppkey, s_name, s_nationkey,
         s_acctbal + i*0.01 AS s_acctbal
  FROM {src('supplier')}, copies ORDER BY s_suppkey""")

kp = stride("part", "p_partkey")
gen("part", f"""
  SELECT p_partkey + i*{kp} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice + i*0.01 AS p_retailprice
  FROM {src('part')}, copies ORDER BY p_partkey""")

ko = stride("orders", "o_orderkey")
gen("orders", f"""
  SELECT o_orderkey + i*{ko} AS o_orderkey, o_custkey + i*{kc} AS o_custkey,
         o_orderstatus, o_totalprice + i*0.01 AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM {src('orders')}, copies ORDER BY o_orderkey""")

gen("lineitem", f"""
  SELECT l_orderkey + i*{ko} AS l_orderkey, l_partkey + i*{kp} AS l_partkey,
         l_suppkey + i*{ks} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice + i*0.01 AS l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')}, copies ORDER BY l_orderkey, l_linenumber""")

ke = stride("events", "event_id")
ku = stride("events", "user_id")
gen("events", f"""
  SELECT event_id + i*{ke} AS event_id, ts, user_id + i*{ku} AS user_id,
         event_type, value, props
  FROM {src('events')}, copies ORDER BY event_id""")

kd = stride("documents", "doc_id")
gen("documents", f"""
  SELECT doc_id + i*{kd} AS doc_id, text, lang, source, n_chars
  FROM {src('documents')}, copies ORDER BY doc_id""")

kv = stride("embeddings", "vec_id")
gen("embeddings", f"""
  SELECT vec_id + i*{kv} AS vec_id,
         list_prepend(CAST(embedding[1] + i*0.001 AS float), embedding[2:]) AS embedding,
         label
  FROM {src('embeddings')}, copies ORDER BY vec_id""")

print(f"wrote {OUT} at {MULT}x sf0.1")
