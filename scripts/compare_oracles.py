#!/usr/bin/env python3
# Driver-style local correctness check: runs each oracle_sql.json entry in
# DuckDB over the sf tables and compares rows/schema/sorted values against
# the graft.Verify parquet dumps. Usage: first run
#   SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
# then: python3 scripts/compare_oracles.py
# Optional args: [sf_dir] [out_dir]; SKIP=name1,name2 skips queries whose
# DuckDB re-derivation is impractically slow at larger scale factors (the
# Spark side still runs them; they are compared at sf0.01).
import duckdb, json, sys, glob, os
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
skip = set(filter(None, os.environ.get("SKIP", "").split(",")))
# STRATUM="m:r" mirrors graft.SparkEntry's SPARK_GRAFT_STRATUM: the
# doc-keyed views are restricted to key % m = r so the slow quadratic
# oracles can be hash-compared on a deterministic stratum at sf0.1
# (run graft.Verify with the same value).
stratum = os.environ.get("STRATUM")
stratum_keys = {"documents": "doc_id", "embeddings": "vec_id"}
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        if stratum and t in stratum_keys:
            m, r = stratum.split(":")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}') "
                        f"WHERE {stratum_keys[t]} % {m} = {r}")
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracles = json.load(open(f"{out}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d): continue
    spark_df = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
    if name not in oracles:
        results[name] = "no_oracle"
        continue
    if name in skip:
        results[name] = "skipped (slow oracle at this sf)"
        continue
    try:
        odf = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        results[name] = f"oracle ERROR: {e}"
        continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    o = odf.reindex(sorted(odf.columns), axis=1)
    rows = len(s) == len(o)
    schema = list(s.columns) == list(o.columns)
    if not schema:
        results[name] = f"schema mismatch: spark={list(s.columns)} oracle={list(o.columns)}"
        continue
    sv = sorted(map(tuple, s.astype(str).values.tolist()))
    ov = sorted(map(tuple, o.astype(str).values.tolist()))
    hash_match = sv == ov
    if rows and hash_match:
        results[name] = f"OK ({len(s)} rows)"
    else:
        diff = [x for x in sv[:5] if x not in ov[:50]]
        results[name] = f"MISMATCH rows {len(s)} vs {len(o)}; sample spark={sv[:2]} oracle={ov[:2]}"
for k, v in sorted(results.items()):
    print(f"{k:25s} {v}")
