#!/usr/bin/env python3
"""Dev-only self-check mirroring the driver's correctness gate:
runs DuckDB on SparkEntry.oracleSql and compares with the parquet dumps
produced by `graft.Verify`. Not part of the shipped library.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes: ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            exp = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} oracle={list(exp.columns)}")
            n_fail += 1
            continue
        if got.shape != exp.shape:
            print(f"FAIL {name}: shape spark={got.shape} oracle={exp.shape}")
            n_fail += 1
            continue
        dtype_mismatch = [(c, str(got[c].dtype), str(exp[c].dtype))
                          for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
        try:
            pd.testing.assert_frame_equal(got, exp, check_exact=True)
            ok = True
            detail = ""
        except AssertionError as e:
            ok = False
            detail = str(e).replace("\n", " | ")[:400]
        if ok:
            msg = f"PASS {name} rows={len(got)}"
            if dtype_mismatch:
                msg += f"  [dtype warn: {dtype_mismatch}]"
            print(msg)
            n_pass += 1
        else:
            print(f"FAIL {name}: {detail}")
            # show first differing cells
            neq = (got != exp) & ~(got.isna() & exp.isna())
            for c in got.columns:
                if neq[c].any():
                    i = neq[c].idxmax()
                    print(f"   col={c} row={i} spark={got[c][i]!r} oracle={exp[c][i]!r} (n_diff={int(neq[c].sum())})")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
