"""exact_dup_groups passed its driver gate vacuously at sf0.001/sf0.01 (those
tiers contain no byte-identical documents — verified: 500/500 distinct
texts).  sf0.1 DOES contain exact dups (4992 distinct of 5000), so this test
pins non-vacuous behavior there against an independent DuckDB run, plus a
planted-dup unit check that needs no external tier."""

from __future__ import annotations

import os

import duckdb
import pytest

from consult_spark.operators import textdedup

SF01 = "/root/testdata/sf0.1/documents.parquet"


def test_exact_dup_groups_planted(spark):
    rows = [(1, "same payload"), (2, "same payload"), (3, "same payload"), (4, "other")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["canonical_id"], r["group_size"])
           for r in textdedup.exact_dup_groups(docs).collect()}
    assert got == {(1, 1, 3), (2, 1, 3), (3, 1, 3)}


@pytest.mark.skipif(not os.path.exists(SF01), reason="sf0.1 tier not generated")
def test_exact_dup_groups_sf01_nonvacuous(spark):
    docs = spark.read.parquet(SF01)
    got = sorted(
        (r["doc_id"], r["canonical_id"], r["group_size"])
        for r in textdedup.exact_dup_groups(docs).collect()
    )
    assert len(got) > 0, "sf0.1 is expected to contain exact dups"
    exp = sorted(
        tuple(r)
        for r in duckdb.sql(
            f"""
            WITH h AS (SELECT doc_id, md5(text) AS h FROM read_parquet('{SF01}')),
            g AS (SELECT doc_id, h,
                         min(doc_id) OVER (PARTITION BY h) AS canonical_id,
                         count(*) OVER (PARTITION BY h) AS group_size
                  FROM h)
            SELECT doc_id, canonical_id, CAST(group_size AS BIGINT) AS group_size
            FROM g WHERE group_size > 1
            """
        ).fetchall()
    )
    assert got == exp
