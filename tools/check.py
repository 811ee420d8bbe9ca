"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry from __spark_entry__ on Spark and the
matching ``oracle_sql()`` on DuckDB over the same sf dir, then compares
row count, schema (column names), and values (column-name-sorted,
row-sorted, exact after dtype normalization). Stricter than a hash
compare: reports the first differing cells.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # decimals / lists → canonical string
            df[c] = s.map(lambda v: str(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def dtype_family(s: pd.Series) -> str:
    """Coarse dtype family for the strictness check.

    The driver's value hash is representation-sensitive: a BIGINT 1 and
    a DOUBLE 1.0 hash differently even though they compare equal. So a
    value-level match with an int-vs-float column mismatch is a latent
    driver red row (round-3 sessionize/sequence_packing). Widths within
    a family (int32 vs int64, float32 vs float64) are fine — the driver
    canonicalizes those — but cross-family is a hard FAIL here.
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"schema: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    for c in sorted(spark_pdf.columns):
        fa, fb = dtype_family(spark_pdf[c]), dtype_family(duck_pdf[c])
        if fa != fb:
            problems.append(
                f"dtype[{c}]: spark={spark_pdf[c].dtype} ({fa}) vs "
                f"duck={duck_pdf[c].dtype} ({fb}) — driver hash would mismatch"
            )
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == "f":
                neq = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
            else:
                neq = ~(
                    (a[c].isna() & b[c].isna()).to_numpy()
                    | (a[c].fillna("§null§") == b[c].fillna("§null§")).to_numpy()
                )
            if neq.any():
                i = int(np.argmax(neq))
                problems.append(
                    f"values[{c}]: {int(neq.sum())} diffs, first at row {i}: "
                    f"spark={av[i]!r} duck={bv[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from riemann_spark import get_spark

    spark = get_spark(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed, passed, rows_only = [], [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failed.append(name)
            print(f"FAIL {name} ({len(sdf)} vs {len(ddf)} rows) [{time.time()-t0:.1f}s]")
            for p in problems[:4]:
                print(f"     {p}")
        else:
            passed.append(name)
            print(f"OK   {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    print(
        f"\n{len(passed)} ok, {len(failed)} failed, {len(rows_only)} rows-only"
        + (f"  FAILED: {failed}" if failed else "")
    )
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
