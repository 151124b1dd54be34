"""JSONL/CSV document ingest: explicit schema, corrupt-line tolerance,
deterministic synthesized doc_ids, and downstream operator compatibility."""

from __future__ import annotations

import json

from consult_spark.sources.documents import (
    DOCUMENTS_SCHEMA,
    read_documents_csv,
    read_documents_jsonl,
    read_documents_parquet,
)


def test_jsonl_ingest_with_corrupt_lines(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "the quick brown fox", "lang": "en"}),
        json.dumps({"doc_id": 2, "text": "el zorro marron", "source": "web"}),
        "{this is not json",                      # corrupt -> dropped, not fatal
        json.dumps({"doc_id": 4, "no_text": 1}),  # missing text -> dropped
        json.dumps({"doc_id": 5, "text": "la vache qui rit"}),
    ]
    p.write_text("\n".join(lines) + "\n")
    docs = read_documents_jsonl(spark, str(p))
    assert docs.schema.simpleString() == f"struct<{DOCUMENTS_SCHEMA.replace(' bigint', ':bigint').replace(' string', ':string').replace(' int', ':int').replace(', ', ',')}>"
    rows = {r["doc_id"]: r for r in docs.collect()}
    assert set(rows) == {1, 2, 5}
    assert rows[1]["lang"] == "en" and rows[1]["n_chars"] == 19
    assert rows[2]["source"] == "web"


def test_jsonl_synthesized_ids_are_deterministic(spark, tmp_path):
    p = tmp_path / "noid.jsonl"
    p.write_text("\n".join(json.dumps({"text": f"document number {i}"}) for i in range(20)) + "\n")
    a = {r["text"]: r["doc_id"] for r in read_documents_jsonl(spark, str(p)).collect()}
    b = {r["text"]: r["doc_id"] for r in read_documents_jsonl(spark, str(p)).repartition(7).collect()}
    assert a == b and len(set(a.values())) == 20


def test_csv_ingest(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text('doc_id,text,lang,source\n7,"hello, world",en,crawl\n8,"second doc",,\n')
    rows = {r["doc_id"]: r for r in read_documents_csv(spark, str(p)).collect()}
    assert rows[7]["text"] == "hello, world" and rows[7]["source"] == "crawl"
    assert rows[8]["lang"] == ""


def test_ingested_docs_feed_the_dedup_operators(spark, tmp_path):
    from consult_spark.operators import textdedup

    p = tmp_path / "dup.jsonl"
    docs = [{"doc_id": i, "text": "an identical payload for exact dedup"} for i in (1, 2)]
    docs.append({"doc_id": 3, "text": "something entirely different here"})
    p.write_text("\n".join(json.dumps(d) for d in docs) + "\n")
    loaded = read_documents_jsonl(spark, str(p))
    groups = textdedup.exact_dup_groups(loaded).collect()
    assert {(r["doc_id"], r["canonical_id"]) for r in groups} == {(1, 1), (2, 1)}


def test_parquet_normalizer_matches_testdata(spark):
    docs = read_documents_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert docs.count() == raw.count()
    assert {r["doc_id"] for r in docs.select("doc_id").collect()} == {
        r["doc_id"] for r in raw.select("doc_id").collect()
    }


def test_jsonl_gzip_transparent(spark, tmp_path):
    """Web corpora ship as *.jsonl.gz; Spark's text source inflates gzip
    transparently per file (each .gz is one non-splittable task — fine for
    many-file corpora). The reader must need no special-casing."""
    import gzip

    p = tmp_path / "docs.jsonl.gz"
    docs = [{"doc_id": i, "text": f"compressed doc number {i}"} for i in range(5)]
    with gzip.open(p, "wt") as f:
        f.write("\n".join(json.dumps(d) for d in docs) + "\n")
    rows = {r["doc_id"]: r["text"] for r in read_documents_jsonl(spark, str(p)).collect()}
    assert rows == {i: f"compressed doc number {i}" for i in range(5)}
