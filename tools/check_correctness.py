"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, compares row count, column-name set and an
order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def value_hash(pdf) -> str:
    import numpy as np
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_float_dtype(s):
            # normalize -0.0 and NaN textual form
            s = s.astype("float64")
            s = s.where(~(s == 0.0), 0.0)
            pdf[c] = s.map(lambda v: "nan" if pd.isna(v) else repr(float(v)))
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("Int64").astype(str)
        else:
            pdf[c] = s.astype(str)
    rows = ["\x1f".join(r) for r in pdf.itertuples(index=False, name=None)]
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from atr_adaptive_laguerre_spark.engine.session import build_session

    spark = build_session(app="check", master="local[8]",
                          shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name silently matching nothing would print
        # 'FAILURES: 0' without running anything — fail loud instead
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows={len(spdf)} cols={len(spdf.columns)} "
                  f"(no oracle, rows-only) [{dt:.1f}s]")
            if len(spdf) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        ok_rows = len(spdf) == len(opdf)
        ok_cols = sorted(spdf.columns) == sorted(opdf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(spdf) == value_hash(opdf)
        status = "PASS" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status}  {name}: rows {len(spdf)}/{len(opdf)} "
              f"cols_match={ok_cols} hash_match={ok_hash} [{dt:.1f}s]")
        if not ok_hash and ok_rows and ok_cols and len(spdf) > 0:
            import pandas as pd

            a = spdf[sorted(spdf.columns)].sort_values(
                sorted(spdf.columns)).reset_index(drop=True)
            b = opdf[sorted(opdf.columns)].sort_values(
                sorted(opdf.columns)).reset_index(drop=True)
            for c in a.columns:
                if not a[c].astype(str).equals(b[c].astype(str)):
                    diff = (a[c].astype(str) != b[c].astype(str))
                    i = diff.idxmax()
                    print(f"      first diff col={c} row={i}: "
                          f"spark={a[c][i]!r} duck={b[c][i]!r} "
                          f"({int(diff.sum())} diffs)")
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
