#!/usr/bin/env python3
"""Builder-side oracle comparison (mirrors the driver's DuckDB check):
for each query output under <verifyDir>, run the oracle SQL from
oracle_sql.json against the sf tables in DuckDB and compare row count,
column count, and an order-insensitive row-hash.

Usage: oracle_check.py <sfDir> <verifyDir> [query ...]
"""
import sys, json, os
import duckdb

sf, vdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:]) or None

oracles = json.load(open(os.path.join(vdir, "oracle_sql.json")))
con = duckdb.connect()
for t in ("lineitem", "orders", "customer", "nation", "part", "region",
          "supplier", "documents", "events", "embeddings"):
    p = os.path.join(sf, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

fails = 0
for name in sorted(os.listdir(vdir)):
    qdir = os.path.join(vdir, name)
    if not os.path.isdir(qdir):
        continue
    if only and name not in only:
        continue
    if name not in oracles:
        print(f"{name}: NO ORACLE"); fails += 1; continue
    try:
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        orc_rel = con.sql(oracles[name])
        n_s = con.sql("SELECT count(*) FROM spark_rel").fetchone()[0]
        n_o = con.sql("SELECT count(*) FROM orc_rel").fetchone()[0]
        cols_s = len(spark_rel.columns); cols_o = len(orc_rel.columns)
        # order-insensitive, multiset-sensitive hash: sum of per-row hash()
        # (xor cancelled even-multiplicity differences; concat_ws dropped
        # NULLs so NULL-position disagreements collided — review findings)
        def rowhash(rel, relname):
            cols = ", ".join(f'"{c}"' for c in rel.columns)
            return con.sql(
                f"SELECT sum(hash({cols})), count(*) "
                f"FROM (SELECT * FROM {relname})").fetchone()[0]
        h_s = rowhash(spark_rel, "spark_rel")
        h_o = rowhash(orc_rel, "orc_rel")
        ok = (n_s == n_o) and (cols_s == cols_o) and (h_s == h_o)
        print(f"{name}: rows {n_s}/{n_o} cols {cols_s}/{cols_o} "
              f"hash {'MATCH' if h_s == h_o else 'MISMATCH'} -> "
              f"{'OK' if ok else 'FAIL'}")
        if not ok:
            fails += 1
    except Exception as e:
        print(f"{name}: ERROR {e}"); fails += 1
sys.exit(1 if fails else 0)
