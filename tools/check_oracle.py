#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet, and compares
schema + row values (columns sorted by name, rows sorted by all columns).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def repr_hash(df: pd.DataFrame) -> str:
    """Hash the per-cell REPRESENTATION, not just Python equality.

    Round 2's q42 compared value-equal locally (Decimal == Decimal) but
    failed the driver's hash gate, which serializes cell values before
    hashing — Decimal('123.40') and 123.4 are == but serialize apart.
    Hashing repr() catches every representation lane (Decimal vs float,
    trailing-zero scale, numpy width) so local green implies driver green.
    """
    import hashlib
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update("|".join(repr(v) for v in row).encode())
        h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no Spark result dir"); n_fail += 1; continue
        try:
            spark_df = canon(con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df())
            duck_df = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        ok = True
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}"); ok = False
        elif [str(t) for t in spark_df.dtypes] != [str(t) for t in duck_df.dtypes]:
            print(f"WARN {name}: dtypes {list(map(str, spark_df.dtypes))} vs {list(map(str, duck_df.dtypes))}")
        if ok and len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}"); ok = False
        if ok:
            try:
                pd.testing.assert_frame_equal(spark_df, duck_df, check_dtype=False,
                                              check_exact=True)
            except AssertionError as e:
                print(f"FAIL {name}: values differ\n{str(e)[:500]}"); ok = False
        if ok and repr_hash(spark_df) != repr_hash(duck_df):
            ex = next((f"row {i}: {tuple(map(repr, s))} vs {tuple(map(repr, d))}"
                       for i, (s, d) in enumerate(zip(spark_df.itertuples(index=False),
                                                      duck_df.itertuples(index=False)))
                       if tuple(map(repr, s)) != tuple(map(repr, d))), "")
            print(f"FAIL {name}: representation hash differs (values ==)\n{ex[:400]}"); ok = False
        if ok:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
