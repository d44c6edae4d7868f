"""Driver-mimic: run every queries() entry at sf0.01 and diff against its
oracle_sql() twin (row count + column names + order-insensitive values).
Usage: python tools/check_oracles.py [name ...]
Env:  ORACLE_CPUS=N (parallelism, default 16)
      ORACLE_OUT=path.json — also write a machine-readable artifact
      {name: {ok, rows, secs, status}} plus a _meta block (cpus, sf, ts).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    import __spark_entry__ as e
    from yatsm_spark.conf import get_spark

    only = set(sys.argv[1:])
    # ORACLE_CPUS: run the identical sweep at another parallelism to pin
    # cross-parallelism value-identity of every query (not just the tiers).
    # ORACLE_ANSI=1: driver-faithful session conf — Spark 4 defaults to
    # spark.sql.ansi.enabled=true while the engine conf turns it off; the
    # round-5 driver harness caught an overflow the engine session masked.
    extra = {"spark.sql.ansi.enabled": "true"} if os.environ.get("ORACLE_ANSI") else None
    spark = get_spark(master=f"local[{os.environ.get('ORACLE_CPUS', '16')}]",
                      extra_confs=extra)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs, osql = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    results = {}

    def record(name, ok, rows, t0, status):
        results[name] = {"ok": ok, "rows": rows,
                         "secs": round(time.time() - t0, 2),
                         "status": status}

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {str(ex)[:300]}")
            record(name, False, None, t0, f"spark error {type(ex).__name__}")
            n_fail += 1
            continue
        if name not in osql:
            print(f"rows-only {name}: {len(got)} rows [{time.time()-t0:.1f}s]")
            record(name, True, len(got), t0, "rows-only")
            n_rows_only += 1
            continue
        try:
            want = con.execute(osql[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle error {str(ex)[:300]}")
            record(name, False, len(got), t0, "oracle error")
            n_fail += 1
            continue
        g, w = normalize(got), normalize(want)
        status = None
        if list(g.columns) != list(w.columns):
            status = f"column mismatch: spark={list(g.columns)} oracle={list(w.columns)}"
        elif len(g) != len(w):
            status = f"row count: spark={len(g)} oracle={len(w)}"
        else:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            except AssertionError as ex:
                status = "value mismatch: " + str(ex).split("\n")[-2][:200]
        if status:
            print(f"FAIL {name}: {status}")
            if "value mismatch" in (status or "") or "row count" in (status or ""):
                merged = g.merge(w, how="outer", indicator=True)
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(6).to_string())
            record(name, False, len(g), t0, status)
            n_fail += 1
        else:
            print(f"PASS {name}: {len(g)} rows [{time.time()-t0:.1f}s]")
            record(name, True, len(g), t0, "value-exact")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    out = os.environ.get("ORACLE_OUT")
    if out:
        import json

        results["_meta"] = {
            "cpus": int(os.environ.get("ORACLE_CPUS", "16")),
            "sf_dir": SF_DIR,
            "n_pass": n_pass, "n_fail": n_fail, "n_rows_only": n_rows_only,
            "wall_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
