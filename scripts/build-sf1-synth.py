#!/usr/bin/env python3
# Builds the deterministic "sf1-synth" dataset: a 10x key-shifted
# replication of /root/testdata/sf0.1 (no randomness, no external data —
# replica k shifts every primary key by k * N(table), foreign keys shift
# consistently so referential joins stay valid). Both engines (graft.Verify
# via Spark and the DuckDB oracle in scripts/compare_oracles.py) read the
# SAME parquet output, so full-volume hash comparison is exact.
#
# Usage: python3 scripts/build-sf1-synth.py [src=/root/testdata/sf0.1] [dst=/tmp/graft_sf1]
# Then:  sbt "runMain graft.tmp.V1 <queries> /tmp/graft_sf1 /tmp/verify_sf1"
#        python3 scripts/compare_oracles.py /tmp/graft_sf1 /tmp/verify_sf1
import duckdb, os, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
K = 10  # replication factor: sf0.1 x 10 = sf1

sizes = {"documents": 5000, "embeddings": 2000, "events": 100000,
         "lineitem": 600000, "orders": 150000, "customer": 15000,
         "part": 20000, "supplier": 1000}

def repl(table, keyexprs):
    sel = ", ".join(keyexprs)
    con.execute(f"""
      COPY (
        SELECT {sel} FROM read_parquet('{src}/{table}.parquet'), range({K}) AS r(k)
        ORDER BY 1
      ) TO '{dst}/{table}.parquet' (FORMAT PARQUET)""")
    n = duckdb.query(f"select count(*) from read_parquet('{dst}/{table}.parquet')").fetchone()[0]
    print(table, n)

repl("documents", [f"doc_id + k*{sizes['documents']} AS doc_id", "text", "lang", "source", "n_chars"])
repl("embeddings", [f"vec_id + k*{sizes['embeddings']} AS vec_id", "embedding", "label"])
repl("events", [f"event_id + k*{sizes['events']} AS event_id", "ts", "user_id", "event_type", "value", "props"])
repl("lineitem", [f"l_orderkey + k*{sizes['orders']} AS l_orderkey", "l_partkey", "l_suppkey",
                  "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                  "l_returnflag", "l_linestatus", "l_shipdate"])
repl("orders", [f"o_orderkey + k*{sizes['orders']} AS o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderdate", "o_orderpriority"])
repl("customer", [f"c_custkey + k*{sizes['customer']} AS c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"])
repl("part", [f"p_partkey + k*{sizes['part']} AS p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"])
repl("supplier", [f"s_suppkey + k*{sizes['supplier']} AS s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
for t in ["nation", "region"]:
    con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied")
