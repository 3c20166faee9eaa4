#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage:
  python3 tools/local_verify.py <sfDir> <outDir>

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already produced
<outDir>/<name>/ parquet dirs + <outDir>/oracle_sql.json. Registers the
sfDir parquet tables as DuckDB views, runs each oracle SQL, and compares
against the Spark result: schema (sorted column names), row count, and
values (columns sorted by name, rows sorted).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted([os.path.basename(p) for p in glob.glob(os.path.join(out_dir, "*"))
                    if os.path.isdir(p)])
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracles:
            ok = len(spark_df) > 0
            print(f"{'rows' if ok else 'FAIL'} {name}: rows-only ({len(spark_df)})")
            n_rowsonly += ok
            n_fail += not ok
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        # Dtype-class guard (round 11): the driver's compare hashes raw
        # values, so an int64 Spark column vs a float64 oracle column (the
        # DuckDB sum(BIGINT)->HUGEINT->float64 drift that broke
        # merge_upsert_orders in r10 and events_sessionize in r8) is a hash
        # FAIL even when the normalized values match. Fail loudly HERE with
        # a named error instead of letting norm() paper over it.
        dtype_errs = []
        for c in sorted(set(spark_df.columns) & set(oracle_df.columns)):
            s, o = spark_df[c], oracle_df[c]
            s_int = pd.api.types.is_integer_dtype(s)
            o_int = pd.api.types.is_integer_dtype(o)
            s_f = pd.api.types.is_float_dtype(s)
            o_f = pd.api.types.is_float_dtype(o)
            if (s_int and o_f) or (s_f and o_int):
                dtype_errs.append(f"{c}: spark {s.dtype} vs oracle {o.dtype}")
        if dtype_errs:
            print(f"FAIL {name}: dtype-class mismatch (driver would hash-FAIL): "
                  + "; ".join(dtype_errs)
                  + " — CAST the oracle (or Spark) side to align int/float")
            n_fail += 1
            continue
        a, b = norm(spark_df), norm(oracle_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: schema {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: values differ:\n{str(e)[:600]}")
            n_fail += 1
    print(f"\n== {n_pass} exact-pass, {n_rowsonly} rows-only, {n_fail} FAIL ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
