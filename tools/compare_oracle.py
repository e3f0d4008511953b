#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/compare_oracle.py <sfdir> <verify_out>

Loads each <verify_out>/<name> spark parquet, runs the matching oracle
SQL from oracle_sql.json against the raw tables in <sfdir>, sorts
columns by name, sorts rows, and compares values cell-by-cell.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_bad += 1
            continue
        g, w = canon(got), canon(want)
        # dtype report (schema-compat signal)
        dt = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
              if str(g[c].dtype) != str(w[c].dtype)]
        eq = g.equals(w)
        if not eq:
            diff_cols = [c for c in g.columns if not g[c].equals(w[c])]
            # NaN != NaN in pandas — matching NaNs are not value diffs
            value_diffs = {
                c: int(((g[c] != w[c]) & ~(g[c].isna() & w[c].isna())).sum())
                for c in diff_cols}
            if all(n == 0 for n in value_diffs.values()):
                # values identical, dtypes differ — distinct failure class
                print(f"FAIL {name}: dtype-only mismatch {[(c, str(g[c].dtype), str(w[c].dtype)) for c in diff_cols]}")
            else:
                print(f"FAIL {name}: value mismatch in {diff_cols}")
                for c in diff_cols[:3]:
                    neq = g[c] != w[c]
                    print(f"  {c}: {int(neq.sum())} cells, e.g. got={g[c][neq].head(3).tolist()} want={w[c][neq].head(3).tolist()}")
            n_bad += 1
        else:
            flag = f" DTYPE{dt}" if dt else ""
            print(f"ok   {name} ({len(got)} rows){flag}")
            n_ok += 1
    rows_only = {"dedup_minhash", "dedup_simhash", "dedup_ngram", "knn_lsh",
                 "text_fingerprint", "mm_features", "q_sketch_stats"}
    for name in sorted(rows_only):
        try:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{outdir}/{name}/*.parquet')").fetchone()[0]
            print(f"rows {name}: {n}" + (" (EMPTY!)" if n == 0 else ""))
        except Exception as e:
            print(f"rows {name}: ERROR {e}")
    print(f"\n{n_ok} ok, {n_bad} fail")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
