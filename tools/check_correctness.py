"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB at
the given SF dir, compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted,
values stringified). Run:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _canon(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import duckdb

    import __spark_entry__ as ent
    from ice_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # SPARK_GRAFT_PLAIN=1 → run on an UNTUNED session exactly like the
    # external driver builds (default shuffle partitions, default
    # broadcast threshold, 1g heap, no Arrow/AQE overrides). Queries
    # whose results depend on session config — tie-breaking under a
    # different partition count, range-partitioner boundary sampling —
    # pass the tuned gate and fail only at the driver; this replica
    # closes that blind spot.
    if os.environ.get("SPARK_GRAFT_PLAIN") == "1":
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName(
            "correctness_plain"
        ).getOrCreate()
    else:
        spark = get_spark("correctness")
    from ice_spark.session import assert_ansi

    assert_ansi(spark)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = ent.queries()
    oracles = ent.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        finally:
            # Queries legitimately cache multi-consumer relations
            # (PageRank/triangle edge lists, sketch partials); across
            # 140+ queries in ONE session those caches accumulate and
            # can exhaust the default driver heap. Each query is
            # independent here, so drop cached data between them.
            spark.catalog.clearCache()
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        sh = value_hash(scols, srows)
        oh = value_hash(ocols, orows)
        ok_hash = sh == oh
        status = "OK   " if (ok_cols and ok_count and ok_hash) else "FAIL "
        print(
            f"{status} {name}: rows {len(srows)}/{len(orows)}"
            f" cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'}"
            f" hash={'=' if ok_hash else f'{sh} vs {oh}'} [{time.time()-t0:.1f}s]"
        )
        if not (ok_cols and ok_count and ok_hash):
            failures.append(name)
            if not ok_hash and ok_cols and ok_count:
                # print first diff rows to debug
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                s_lines = sorted("|".join(_canon(r[i]) for i in order) for r in srows)
                o_order = sorted(range(len(ocols)), key=lambda i: ocols[i])
                o_lines = sorted("|".join(_canon(r[i]) for i in o_order) for r in orows)
                for a, b in zip(s_lines, o_lines):
                    if a != b:
                        print(f"      spark : {a[:200]}")
                        print(f"      duckdb: {b[:200]}")
                        break
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
