"""Local pre-flight for the driver's t2 gate: run every ``queries()`` entry
on Spark and its ``oracle_sql()`` on DuckDB over the same parquet, then
compare row count, column names, and values (bitwise for floats — if we
match bitwise, any order-insensitive value hash matches too).

Usage: python tools/check_correctness.py [--warehouse DIR] [sf_dir] [query ...]

``--warehouse DIR`` isolates this run's managed-table data (sets
``spark.sql.warehouse.dir`` via SPARK_GRAFT_WAREHOUSE before the session
builds), so two sweeps — or a sweep and a pytest run — can execute
concurrently without racing each other's CREATE/DROP in a shared
./spark-warehouse (the q95 RF1/RF2 flake class).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazonredshift_blueprints_spark.session import TABLES, get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            s = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            s = s.astype("boolean")
        else:
            s = s.astype("object").map(lambda v: None if v is None or v is pd.NA else v)
        out[c] = s
    ndf = pd.DataFrame(out)
    if len(ndf):
        ndf = ndf.sort_values(by=list(ndf.columns), na_position="first", kind="mergesort")
    return ndf.reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rows: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"cols: spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    s, d = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in s.columns:
        a, b = s[c], d[c]
        # The driver's value hash runs over the native fetched dtypes, so an
        # int column on one side and float on the other (DuckDB HUGEINT /
        # ceil() → float64 in fetchdf, Spark → int64) hash-mismatches even
        # when every value compares equal. Flag kind divergence as FAIL.
        ka = ("f" if pd.api.types.is_float_dtype(a)
              else "i" if pd.api.types.is_integer_dtype(a)
              else "o")
        kb = ("f" if pd.api.types.is_float_dtype(b)
              else "i" if pd.api.types.is_integer_dtype(b)
              else "o")
        if ka != kb:
            problems.append(f"col {c}: dtype-kind mismatch spark={a.dtype} duck={b.dtype}")
            continue
        if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
            av, bv = a.to_numpy(), b.to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            eq = (av == bv) | both_nan
            if not eq.all():
                bad = (~eq).sum()
                diffs = np.abs(av[~eq] - bv[~eq])
                problems.append(
                    f"col {c}: {bad} float mismatches, max|diff|={np.nanmax(diffs):.3e}"
                )
        else:
            an = a.isna().to_numpy()
            bn = b.isna().to_numpy()
            eq = (an & bn) | ((~an) & (~bn) & (a.fillna(0).to_numpy() == b.fillna(0).to_numpy()))
            if not eq.all():
                i = int(np.argmax(~eq))
                problems.append(
                    f"col {c}: {(~eq).sum()} mismatches, first at row {i}: "
                    f"spark={a.iloc[i]!r} duck={b.iloc[i]!r}"
                )
    return problems


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--warehouse":
        if len(argv) < 2:
            print("--warehouse needs a directory argument")
            return 2
        # must land in the env BEFORE get_spark builds the JVM — a
        # static conf can't be set on an existing session
        os.environ["SPARK_GRAFT_WAREHOUSE"] = os.path.abspath(argv[1])
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("check-correctness")
    con = _duck_con(sf_dir)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, build in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = build(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS " if len(sdf) >= 0 else "FAIL"
            print(f"{status} {name}: rows={len(sdf)} (rows-only, no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(sdf)} cols={len(sdf.columns)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
