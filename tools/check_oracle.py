#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares: column names (sorted), row count, and a hash of the sorted
values. NOT shipped library code — dev-side validation only.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # a corpus table may be a single file (driver testdata) or a
    # Spark-written DIRECTORY of part files (ScaleData corpora)
    p = f"{sfdir}/{t}.parquet"
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = df[c]
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            pass  # keep exact bits; sort key below uses a rounded copy
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        else:
            df[c] = df[c].astype(str)
    # sort by ROUNDED float keys (stable order even when engines differ in
    # the last ulp) but return the UNROUNDED values for the bitexact probe.
    # Each rounded float key is tie-broken by its UNROUNDED value: rows that
    # tie on every rounded key would otherwise keep each engine's own emit
    # order (stable mergesort), misaligning row i between the two frames and
    # reporting a spurious close-not-bitexact warning.
    key = df.copy()
    cols = []
    for c in key.columns:
        cols.append(c)
        if pd.api.types.is_float_dtype(key[c]):
            raw = c + "\0raw"
            key[raw] = df[c]
            key[c] = key[c].round(6)
            cols.append(raw)
    order = key.sort_values(by=cols, kind="mergesort").index
    return df.loc[order].reset_index(drop=True)

def col_match(a: pd.Series, b: pd.Series):
    """Float cells: tolerance + NaN==NaN (half-way 2dp rounding can differ
    by engine, and NaN != NaN would flag matching cells). Others: exact."""
    import numpy as np
    if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
        return pd.Series(np.isclose(a, b, rtol=0, atol=1.5e-6, equal_nan=True),
                         index=a.index)
    return (a == b) | (a.isna() & b.isna())

def col_bitexact(a: pd.Series, b: pd.Series) -> bool:
    """The DRIVER's hash compare is bit-exact — a float cell that is merely
    'close' locally is a latent driver red (the r11 lake_migrate failure
    mode). Report close-but-not-equal loudly so it is fixed pre-driver."""
    import numpy as np
    if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
        av, bv = a.to_numpy(float), b.to_numpy(float)
        return bool(np.all((av == bv) | (np.isnan(av) & np.isnan(bv))))
    return bool(((a == b) | (a.isna() & b.isna())).all())

def frames_match(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    return all(col_match(a[c], b[c]).all() for c in a.columns)

fails = 0
names = sorted(d for d in os.listdir(outdir)
               if os.path.isdir(os.path.join(outdir, d)))
for name in names:
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = canon(con.execute(
        f"SELECT * FROM read_parquet({files!r})").df())
    if name not in oracle:
        print(f"rows {name}: {len(got)} rows (no oracle)"); continue
    try:
        exp = canon(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: cols {list(got.columns)} != {list(exp.columns)}"); fails += 1
    elif len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); fails += 1
    elif not frames_match(got, exp):
        diff = pd.DataFrame({c: ~col_match(got[c], exp[c]) for c in got.columns})
        bad = diff.any(axis=1)
        print(f"FAIL {name}: value mismatch on {bad.sum()} rows; first:")
        print(got[bad].head(2)); print(exp[bad].head(2)); fails += 1
    elif not all(col_bitexact(got[c], exp[c]) for c in got.columns):
        close = [c for c in got.columns if not col_bitexact(got[c], exp[c])]
        print(f"PASS {name}: {len(got)} rows — WARNING close-not-bitexact "
              f"cols {close} (driver hash compare WILL red-flag this)")
    else:
        print(f"PASS {name}: {len(got)} rows")
print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'} / {len(names)} queries")
sys.exit(1 if fails else 0)
