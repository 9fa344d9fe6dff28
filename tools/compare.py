"""Local oracle-parity harness — mirrors the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and an
order-insensitive canonicalized multiset of values (floats rounded to a
comparison grid to absorb ulp noise the queries' own round() should
already have removed).

Usage: python tools/compare.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as _dt
import math
import sys
from decimal import Decimal

import duckdb


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def compare_query(spark, con, name, fn, sql, sf_dir) -> dict:
    out = {"name": name}
    try:
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        out["spark_rows"] = len(srows)
    except Exception as e:  # noqa: BLE001
        out["error"] = f"spark: {type(e).__name__}: {e}"
        return out
    try:
        ores = con.sql(sql)
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        out["oracle_rows"] = len(orows)
    except Exception as e:  # noqa: BLE001
        out["error"] = f"oracle: {type(e).__name__}: {e}"
        return out
    out["cols_match"] = sorted(scols) == sorted(ocols)
    if not out["cols_match"]:
        out["spark_cols"], out["oracle_cols"] = sorted(scols), sorted(ocols)
        return out
    sm = rows_to_multiset(scols, [tuple(r) for r in srows])
    om = rows_to_multiset(ocols, orows)
    out["values_match"] = sm == om
    if not out["values_match"]:
        diffs = [(a, b) for a, b in zip(sm, om) if a != b]
        out["first_diffs"] = diffs[:3]
        only_s = [r for r in sm if r not in om][:2]
        only_o = [r for r in om if r not in sm][:2]
        out["only_spark"], out["only_oracle"] = only_s, only_o
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    wanted = sys.argv[2:]

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from emission_project_spark.session import get_spark

    # progress bars off: the per-round sweep is committed as a text
    # artifact (COMPARE_r{N}.txt) and \r progress fragments glue
    # themselves onto result lines, corrupting the record
    spark = get_spark(
        "compare",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = 0
    for name, fn in queries.items():
        if wanted and name not in wanted:
            continue
        if name not in oracles:
            try:
                n = fn(spark, sf_dir).count()
                print(f"~  {name}: rows-only check, {n} rows")
            except Exception as e:  # noqa: BLE001
                fails += 1
                print(f"✗  {name}: rows-only FAILED: {e}")
            continue
        r = compare_query(spark, con, name, fn, oracles[name], sf_dir)
        ok = r.get("cols_match") and r.get("values_match") and r["spark_rows"] == r["oracle_rows"]
        if ok:
            print(f"✓  {name}: {r['spark_rows']} rows")
        else:
            fails += 1
            print(f"✗  {name}: {r}")
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
