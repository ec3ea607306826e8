#!/usr/bin/env python3
"""Emulate the driver's DuckDB oracle gate locally.

Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]
Registers each <sfDir>/*.parquet as a view, runs every SQL from
oracle_sql.json (or just the named queries), sorts columns by name and rows
by value, and compares stringified cells against the per-query parquet dump.
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fail = 0
for qname, sql in sorted(oracle.items()):
    if only and qname not in only:
        continue
    spark_files = glob.glob(os.path.join(out_dir, qname, "*.parquet"))
    if not spark_files:
        print(f"{qname}: NO SPARK OUTPUT")
        fail += 1
        continue
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{qname}: ORACLE SQL ERROR: {e}")
        fail += 1
        continue
    sdf = con.execute(
        f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    rows_match = len(odf) == len(sdf)
    schema_match = ocols == scols
    hash_match = False
    if rows_match and schema_match:
        o = odf[ocols].astype(str).sort_values(ocols).values.tolist()
        s = sdf[scols].astype(str).sort_values(scols).values.tolist()
        hash_match = o == s
        if not hash_match:
            for i, (a, b) in enumerate(zip(o, s)):
                if a != b:
                    print(f"  first diff at sorted row {i}: oracle={a} spark={b}")
                    break
    ok = rows_match and schema_match and hash_match
    if not ok:
        fail += 1
    print(f"{qname}: rows={rows_match}({len(odf)}/{len(sdf)}) "
          f"schema={schema_match} hash={hash_match}"
          + ("" if schema_match else f" oracle_cols={ocols} spark_cols={scols}"))
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
