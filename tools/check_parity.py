#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff exactly. Dev tool only — the
library itself is pure Scala/Spark."""
import json, sys, math
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cells_equal(a, b):
    # Driver-fidelity compare: NO cross-type coercion. A Decimal vs a float,
    # or an int vs a float (DuckDB HUGEINT lands as float64 in pandas), must
    # FAIL here exactly like the driver's hasher fails it — float() coercion
    # previously masked that whole failure class (r2: q36/q39 green locally,
    # red on the driver).
    if a is None and b is None: return True
    try:
        if pd.isna(a) and pd.isna(b): return type(a) is type(b)
    except (TypeError, ValueError): pass
    if type(a) is not type(b): return False
    if isinstance(a, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b

def main(sf_dir: str, out_dir: str, only: str = ""):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # dev iteration: check a subset (matches Verify's 3rd arg)
        names = set(only.split(","))
        oracle = {k: v for k, v in oracle.items() if k in names}
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'", connection=con).df())
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: load/oracle error: {e}"); bad += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); bad += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); bad += 1; continue
        dt_bad = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
                  if str(got[c].dtype) != str(exp[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtypes {dt_bad}"); bad += 1; continue
        # HARD RULE (r5 lesson): the driver's canonicalizer hash-mismatches
        # any DECIMAL output column even when values are identical — values
        # can be equal HERE (decimal.Decimal compares fine) yet red on the
        # driver. Scan EVERY cell of BOTH frames (a nullable decimal whose
        # leading rows are all NULL must not slip through), cheap at
        # parity scale.
        import decimal
        dec_cols = sorted({c for frame in (got, exp) for c in frame.columns
                           if str(frame[c].dtype) == "object"
                           and any(isinstance(v, decimal.Decimal)
                                   for v in frame[c].tolist())})
        if dec_cols:
            print(f"FAIL {name}: DECIMAL output column(s) {dec_cols} — "
                  "driver-unsafe; cast the final output to DOUBLE/BIGINT")
            bad += 1; continue
        diffs = []
        for c in got.columns:
            ga, ea = got[c].tolist(), exp[c].tolist()
            for i, (x, y) in enumerate(zip(ga, ea)):
                if not cells_equal(x, y):
                    diffs.append((c, i, x, y))
                    if len(diffs) >= 3: break
            if len(diffs) >= 3: break
        if diffs:
            print(f"FAIL {name}: {diffs}"); bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)"); ok += 1
    print(f"== {ok} ok, {bad} fail, {len(oracle)} total")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
                  sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out",
                  sys.argv[3] if len(sys.argv) > 3 else ""))
