"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables, compare
row count, schema (column names), and order-insensitive values (columns
sorted by name, rows sorted, cells normalized).

Usage: python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out)


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import __spark_entry__ as entrymod
    from quad_processor_util_spark.session import get_spark

    spark = get_spark("correctness-check", parallelism=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    if only:
        unknown = set(only) - qs.keys()
        if unknown:
            # a typo'd filter must not report success having checked nothing
            print(f"FAIL  unknown query name(s): {sorted(unknown)}")
            return 1
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            # persist()-ing queries (the linking split) must not leak
            # CacheManager entries across the ~50-gate session, nor serve a
            # later structurally-identical plan from cache
            spark.catalog.clearCache()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            if len(s_rows) == 0:
                print(f"FAIL  {name}: zero rows (rows-only query)")
                failures += 1
            else:
                print(f"ok*   {name}: rows-only ({len(s_rows)} rows, "
                      f"{time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        sc, sr = norm_rows(s_cols, s_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL  {name}: schema mismatch spark={sc} duck={dc}")
            failures += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL  {name}: rowcount spark={len(sr)} duck={len(dr)}")
            failures += 1
            continue
        if sr != dr:
            diffs = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
            print(f"FAIL  {name}: {len(diffs)} differing rows; first: "
                  f"spark={sr[diffs[0]]} duck={dr[diffs[0]]}")
            failures += 1
            continue
        print(f"ok    {name}: {len(sr)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(qs)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
                  sys.argv[2:] or None))
