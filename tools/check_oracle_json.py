#!/usr/bin/env python3
"""check_oracle with the driver's CORRECTNESS JSON shape.

Usage: python3 tools/check_oracle_json.py <sfDir> <verifyOutDir> <out.json>

Same compare as check_oracle.py (column names sorted, row count, and a
bit-exact sorted-values probe), emitting one JSON object per query:
{rows_match, schema_match, hash_match, spark_rows, oracle_rows, err} —
the local mimic of CORRECTNESS_r{N}.json for sf1 sweeps. Dev-side only.
"""
import sys, json, os
import duckdb
import pandas as pd

sfdir, outdir, outjson = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = df[c]
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            pass
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        else:
            df[c] = df[c].astype(str)
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


def col_bitexact(a: pd.Series, b: pd.Series) -> bool:
    import numpy as np
    if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
        av, bv = a.to_numpy(float), b.to_numpy(float)
        return bool(np.all((av == bv) | (np.isnan(av) & np.isnan(bv))))
    return bool(((a == b) | (a.isna() & b.isna())).all())


results = {}
names = sorted(d for d in os.listdir(outdir)
               if os.path.isdir(os.path.join(outdir, d)))
for name in names:
    entry = dict(rows_match=None, schema_match=None, hash_match=None,
                 spark_rows=None, oracle_rows=None, err=None)
    try:
        sp = pd.read_parquet(os.path.join(outdir, name))
        entry["spark_rows"] = int(len(sp))
        if name not in oracle:
            entry["err"] = "no_oracle"
            results[name] = entry
            continue
        du = con.execute(oracle[name]).fetchdf()
        entry["oracle_rows"] = int(len(du))
        sp_c, du_c = canon(sp), canon(du)
        entry["rows_match"] = len(sp_c) == len(du_c)
        entry["schema_match"] = list(sp_c.columns) == list(du_c.columns)
        entry["hash_match"] = bool(
            entry["rows_match"] and entry["schema_match"] and
            all(col_bitexact(sp_c[c], du_c[c]) for c in sp_c.columns))
    except Exception as e:
        entry["err"] = f"{type(e).__name__}: {e}"[:300]
    results[name] = entry

json.dump(results, open(outjson, "w"), indent=2)
n = len(results)
ok = sum(1 for v in results.values()
         if v["hash_match"] or v["err"] == "no_oracle")
fails = {k: v for k, v in results.items()
         if not (v["hash_match"] or v["err"] == "no_oracle")}
print(f"{ok}/{n} green; fails: {list(fails)[:10]}")
sys.exit(0 if not fails else 1)
