#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: run each
oracle_sql.json query in DuckDB against the sf-dir parquet tables and
diff it (column-name-sorted, stringified, row-sorted) against the
corresponding Spark parquet output. Dev tool only — not part of the
engine."""
import sys, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)

def main(sf, outdir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failed = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.sql(sql).df()
        except Exception as ex:
            print(name, "ORACLE SQL ERROR:", str(ex)[:300]); failed += 1; continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(name, "NO SPARK OUTPUT"); failed += 1; continue
        sdf = pd.concat([pq.read_table(f).to_pandas() for f in files])
        o, s = norm(odf), norm(sdf)
        if list(o.columns) != list(s.columns):
            print(name, "COLUMN MISMATCH", list(o.columns), list(s.columns))
            failed += 1; continue
        if len(o) != len(s):
            print(name, f"ROW COUNT MISMATCH oracle={len(o)} spark={len(s)}")
            failed += 1; continue
        if o.equals(s):
            print(name, "MATCH", f"rows={len(o)}")
        else:
            failed += 1
            diff = (o != s).any(axis=1)
            print(name, "VALUE MISMATCH", f"rows={len(o)} differing={int(diff.sum())}")
            print(pd.concat([o[diff].head(3).add_suffix("_oracle"),
                             s[diff].head(3).add_suffix("_spark")], axis=1))
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
