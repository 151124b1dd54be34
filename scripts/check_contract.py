"""Local emulation of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB, compare row count,
column names, and order-insensitive values.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as E

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(round(v, 9))
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


MIN_FREE_BYTES = 5 * 2**30  # Spark scratch + state stores need headroom


def main() -> int:
    # fail loudly with the REASON instead of with Py4J noise three stages
    # later (round 3: a full disk surfaced as state-store-commit errors)
    import shutil

    free = shutil.disk_usage(os.path.dirname(os.path.abspath(__file__))).free
    if free < MIN_FREE_BYTES:
        print(
            f"PRECONDITION FAILED: {free / 2**30:.1f} GiB free < "
            f"{MIN_FREE_BYTES / 2**30:.0f} GiB required — Spark shuffle/state "
            "scratch would fail opaquely. Prune .fixtures (bench.py prunes "
            "automatically at end of run) and retry."
        )
        return 2

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from consult_spark.session import get_spark

    spark = get_spark(
        "contract_check",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"spark error: {ex}"))
            print(f"[FAIL-SPARK] {name}: {str(ex)[:300]}")
            continue
        if name not in oracles:
            print(f"[ROWS-ONLY]  {name}: {len(srows)} rows in {time.time()-t0:.1f}s")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = res.columns
            drows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"duckdb error: {ex}"))
            print(f"[FAIL-DUCK]  {name}: {str(ex)[:300]}")
            continue
        sc, sn = normalize(srows, scols)
        dc, dn = normalize(drows, dcols)
        if sc != dc:
            failures.append((name, f"schema mismatch: spark={sc} duck={dc}"))
            print(f"[FAIL-SCHEMA] {name}: spark={sc} duck={dc}")
            continue
        if len(sn) != len(dn):
            failures.append((name, f"rowcount {len(sn)} vs {len(dn)}"))
            print(f"[FAIL-COUNT] {name}: spark={len(sn)} duck={len(dn)}")
            continue
        if sn != dn:
            bad = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            failures.append((name, f"value mismatch, e.g. {bad}"))
            print(f"[FAIL-VALUE] {name}: first diffs {bad}")
            continue
        print(f"[OK]         {name}: {len(sn)} rows in {time.time()-t0:.1f}s")

    print(f"\n{len(failures)} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
