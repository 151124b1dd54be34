"""Local emulation of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB, compare row count,
column names, and order-insensitive values.

Usage: python scripts/check_contract.py [sf_dir] [--json-out=FILE] [--hostile] [--hostile-ntz] [query ...]

``--hostile`` runs every query on a deliberately adversarial session —
non-UTC timezone (America/New_York), ANSI mode on, AND parquet NTZ
inference disabled (``spark.sql.parquet.inferTimestampNTZ.enabled=false``,
the conf that made a bare events read type ``ts`` as TIMESTAMP_LTZ and
shift every session row by the UTC offset at the round-6 gate — VERDICT r6
'What's wrong #1') — instead of the repo's UTC-pinned defaults.  The
driver provides its OWN session conf, so any query whose answer depends on
session conf passes the plain run and fails only at the gate.  This sweep
closes that class for all entries.

``--hostile-ntz`` is the complementary read-type leg: TZ+ANSI plus
``spark.sql.timestampType=TIMESTAMP_NTZ`` (ambient timestamp literals and
inference flip to NTZ) with parquet NTZ inference left at its default.
Results must be byte-identical to the oracle under ALL THREE sessions.
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

    hostile = "--hostile" in sys.argv[1:]
    hostile_ntz = "--hostile-ntz" in sys.argv[1:]
    args = [
        a
        for a in sys.argv[1:]
        if not a.startswith("--json-out=")
        and a not in ("--hostile", "--hostile-ntz")
    ]
    json_out = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--json-out=")),
        None,
    )
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    from consult_spark.session import get_spark

    extra = {"spark.ui.showConsoleProgress": "false"}
    if hostile or hostile_ntz:
        # emulate a harness that supplies its own session conf: non-UTC TZ
        # flushes out NTZ<->LTZ casts; ANSI on flushes out silent-overflow /
        # bad-cast reliance; the read-type confs flush out queries that
        # trust parquet timestamp inference instead of pinning the read
        # schema.  Results must be byte-identical to the oracle under ALL
        # sessions.
        extra["spark.sql.session.timeZone"] = "America/New_York"
        extra["spark.sql.ansi.enabled"] = "true"
        if hostile_ntz:
            extra["spark.sql.timestampType"] = "TIMESTAMP_NTZ"
            print(
                "== HOSTILE SESSION: TZ=America/New_York, ANSI=on, "
                "timestampType=TIMESTAMP_NTZ =="
            )
        else:
            extra["spark.sql.parquet.inferTimestampNTZ.enabled"] = "false"
            print(
                "== HOSTILE SESSION: TZ=America/New_York, ANSI=on, "
                "inferTimestampNTZ=off =="
            )
    spark = get_spark(
        "contract_check_hostile" if (hostile or hostile_ntz) else "contract_check",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf=extra,
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = {"rows_match": False, "schema_match": False, "hash_match": False,
               "spark_rows": None, "oracle_rows": None, "err": None}
        report[name] = rec
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"spark error: {ex}"))
            rec["err"] = f"spark error: {str(ex)[:300]}"
            print(f"[FAIL-SPARK] {name}: {str(ex)[:300]}")
            continue
        if name not in oracles:
            rec["err"] = "rows-only (no oracle)"
            rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = None
            print(f"[ROWS-ONLY]  {name}: {len(srows)} rows in {time.time()-t0:.1f}s")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = res.columns
            drows = res.fetchall()
            rec["oracle_rows"] = len(drows)
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"duckdb error: {ex}"))
            rec["err"] = f"duckdb error: {str(ex)[:300]}"
            print(f"[FAIL-DUCK]  {name}: {str(ex)[:300]}")
            continue
        sc, sn = normalize(srows, scols)
        dc, dn = normalize(drows, dcols)
        rec["schema_match"] = sc == dc
        if sc != dc:
            failures.append((name, f"schema mismatch: spark={sc} duck={dc}"))
            print(f"[FAIL-SCHEMA] {name}: spark={sc} duck={dc}")
            continue
        rec["rows_match"] = len(sn) == len(dn)
        if len(sn) != len(dn):
            failures.append((name, f"rowcount {len(sn)} vs {len(dn)}"))
            print(f"[FAIL-COUNT] {name}: spark={len(sn)} duck={len(dn)}")
            continue
        rec["hash_match"] = sn == dn
        if sn != dn:
            bad = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            failures.append((name, f"value mismatch, e.g. {bad}"))
            print(f"[FAIL-VALUE] {name}: first diffs {bad}")
            continue
        print(f"[OK]         {name}: {len(sn)} rows in {time.time()-t0:.1f}s")

    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    print(f"\n{len(failures)} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
