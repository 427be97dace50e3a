#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare row-sets with the Spark parquet
output (columns sorted by name, rows sorted by all columns)."""
import duckdb, json, sys, glob, os

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
results = {}
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        results[name] = "NO_SPARK_OUTPUT"
        continue
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {e}"
        continue
    try:
        sdf = con.execute(
            f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
    except Exception as e:
        results[name] = f"SPARK_READ_ERROR: {e}"
        continue
    ocols = sorted(odf.columns)
    scols = sorted(sdf.columns)
    if ocols != scols:
        results[name] = f"SCHEMA_MISMATCH spark={scols} oracle={ocols}"
        continue
    o = odf[ocols].sort_values(ocols).reset_index(drop=True)
    s = sdf[ocols].sort_values(ocols).reset_index(drop=True)
    if len(o) != len(s):
        results[name] = f"ROWCOUNT spark={len(s)} oracle={len(o)}"
        continue
    try:
        eq = o.equals(s)
        if not eq:
            # Find first differing row for debugging.
            diff = (o != s) & ~(o.isna() & s.isna())
            bad = diff.any(axis=1)
            idx = bad.idxmax() if bad.any() else None
            if idx is not None and bad.any():
                results[name] = (f"VALUE_MISMATCH at row {idx}: "
                                 f"oracle={o.loc[idx].to_dict()} spark={s.loc[idx].to_dict()}")
            else:
                results[name] = "PASS"
        else:
            results[name] = "PASS"
    except Exception as e:
        results[name] = f"COMPARE_ERROR: {e}"

npass = sum(1 for v in results.values() if v == "PASS")
for name, v in sorted(results.items()):
    flag = "OK " if v == "PASS" else "FAIL"
    print(f"{flag} {name}: {v if v != 'PASS' else ''}")
print(f"\n{npass}/{len(results)} oracle-checked queries pass")
# Rows-only queries:
all_q = sorted(os.path.basename(d) for d in glob.glob(f"{out}/*") if os.path.isdir(d))
rows_only = [q for q in all_q if q not in oracle]
for q in rows_only:
    n = con.execute(f"SELECT count(*) FROM '{out}/{q}/*.parquet'").fetchone()[0]
    print(f"ROWS {q}: {n} rows")
