"""Session-conf independence of the driver contract (VERDICT r5 'What's
wrong #1' / 'What's missing #4').

The driver's correctness gate runs the queries() surface on ITS OWN
SparkSession — we don't control `spark.sql.session.timeZone` or ANSI mode
there.  Round 5's only red row (`session_counts`) was an NTZ->LTZ cast
interpreted in the harness's non-UTC session timezone: rows/schema match,
every `session_start_us` shifted by the TZ offset, hash mismatch.

These tests flip the session to a hostile timezone at runtime (it's a
runtime conf, so the shared session fixture can be mutated and restored)
and pin the timezone-sensitive queries against DuckDB twins, which are
naive-timestamp/TZ-independent by construction.  The full-surface sweep
lives in `scripts/check_contract.py --hostile`; this test keeps the class
from regressing between sweeps.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"

# every queries() entry that touches the events table (the only table with
# a timestamp column) — anything here must be TZ-independent
TZ_SENSITIVE = ["session_counts", "events_running"]

HOSTILE_TZ = "America/New_York"  # DST-having, negative offset


@pytest.fixture()
def hostile_tz(spark):
    saved = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", HOSTILE_TZ)
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)


def _normalize(rows, cols):
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


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
@pytest.mark.parametrize("qname", TZ_SENSITIVE)
def test_query_matches_oracle_under_hostile_tz(hostile_tz, qname):
    spark = hostile_tz
    assert spark.conf.get("spark.sql.session.timeZone") == HOSTILE_TZ
    sdf = E.queries()[qname](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for t in ("events",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t)}.parquet'"
        )
    res = con.sql(E.oracle_sql()[qname])
    dcols, drows = res.columns, res.fetchall()

    sc, sn = _normalize(srows, scols)
    dc, dn = _normalize(drows, dcols)
    assert sc == dc
    assert len(sn) == len(dn)
    assert sn == dn, f"{qname} value drift under session TZ={HOSTILE_TZ}"


def test_session_counts_identical_under_utc_and_hostile(spark):
    """The exact round-5 failure signature: same rows, shifted epochs.
    Run the query under UTC and under the hostile TZ on the same session
    and require byte-identical results."""
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata absent")
    q = E.queries()["session_counts"]
    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = sorted(tuple(r) for r in q(spark, SF_DIR).collect())
        spark.conf.set("spark.sql.session.timeZone", HOSTILE_TZ)
        est = sorted(tuple(r) for r in q(spark, SF_DIR).collect())
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)
    assert utc == est


# ---------------------------------------------------------------------------
# read-type conf hostility (VERDICT r6 'What's wrong #1')
# ---------------------------------------------------------------------------
# The events parquet stores ts with isAdjustedToUTC=false.  Whether a bare
# read types that as TIMESTAMP_NTZ or TIMESTAMP_LTZ is governed by
# spark.sql.parquet.inferTimestampNTZ.enabled — a conf the DRIVER session
# controls.  With inference off + non-UTC TZ, an inferred read goes LTZ and
# every epoch-µs computed against an NTZ literal shifts by the UTC offset
# (the exact round-6 gate signature: rows match, hash off by 5 h × 10⁶ µs).
# __spark_entry__._events pins the read schema, which overrides the conf.

READ_TYPE_CONFS = [
    {"spark.sql.parquet.inferTimestampNTZ.enabled": "false"},
    {"spark.sql.timestampType": "TIMESTAMP_NTZ"},
]


@pytest.fixture(params=READ_TYPE_CONFS, ids=["inferNTZ-off", "ambient-NTZ"])
def hostile_read_type(request, spark):
    """Hostile TZ + one read-type conf variant, restored afterwards."""
    saved = {}
    confs = dict(request.param)
    confs["spark.sql.session.timeZone"] = HOSTILE_TZ
    for k, v in confs.items():
        saved[k] = spark.conf.get(k)
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
@pytest.mark.parametrize("qname", TZ_SENSITIVE)
def test_query_matches_oracle_under_hostile_read_type(hostile_read_type, qname):
    spark = hostile_read_type
    sdf = E.queries()[qname](spark, SF_DIR)
    # the pinned read schema must hold regardless of inference conf
    assert dict(sdf.dtypes).get("ts", "timestamp_ntz") != "timestamp", (
        "events ts leaked through as TIMESTAMP_LTZ despite the pinned schema"
    )
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{os.path.join(SF_DIR, 'events')}.parquet'"
    )
    res = con.sql(E.oracle_sql()[qname])
    dcols, drows = res.columns, res.fetchall()

    sc, sn = _normalize(srows, scols)
    dc, dn = _normalize(drows, dcols)
    assert sc == dc
    assert len(sn) == len(dn)
    assert sn == dn, f"{qname} value drift under hostile read-type conf"


def test_events_read_schema_pins_ntz_under_inference_off(spark):
    """Direct check of the mechanism: with inferTimestampNTZ off, a bare
    read types ts as LTZ but _events' explicit schema still yields NTZ."""
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata absent")
    saved = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        bare = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        assert dict(bare.dtypes)["ts"] == "timestamp"  # the hostile signature
        pinned = E._events(spark, SF_DIR)
        assert dict(pinned.dtypes)["ts"] == "timestamp_ntz"
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", saved)
