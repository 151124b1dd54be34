"""The document-corpus dedup job: end-to-end over a JSONL shard, resumable,
outputs consistent with the operator-level oracles."""

from __future__ import annotations

import json

from jobs.dedup_documents import run_doc_pipeline
from consult_spark.sources.documents import read_documents_jsonl


def test_doc_pipeline_jsonl_end_to_end(spark, tmp_path):
    import random

    p = tmp_path / "corpus.jsonl"
    rng = random.Random(99)
    vocab = [f"w{rng.randrange(10**6)}x" for _ in range(400)]
    rows = [
        {"doc_id": i, "text": " ".join(rng.choice(vocab) for _ in range(40))}
        for i in range(30)
    ]
    rows += [{"doc_id": 100 + i, "text": rows[i]["text"] + " extra!"} for i in range(5)]  # near dups
    rows += [{"doc_id": 200, "text": rows[0]["text"]}]  # exact dup of doc 0
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    docs = read_documents_jsonl(spark, str(p))
    res = run_doc_pipeline(spark, docs, str(tmp_path / "wh"))
    wh = res["warehouse"]

    exact = {(r["doc_id"], r["canonical_id"]) for r in wh.read("exact_dup_groups").collect()}
    assert exact == {(0, 0), (200, 0)}

    clusters = {r["doc_id"]: r["cluster_id"] for r in res["tables"]["doc_clusters"].collect()}
    assert len(clusters) == 36
    # each planted near-dup ends in its base's cluster; exact dup too
    assert clusters[200] == clusters[0]
    for i in range(5):
        assert clusters[100 + i] == clusters[i], (i, clusters[100 + i], clusters[i])

    # resume skips every stage and returns identical clusters
    res2 = run_doc_pipeline(spark, docs, str(tmp_path / "wh"), resume=True)
    assert all(v == 0.0 for v in res2["timings"].values())
    clusters2 = {r["doc_id"]: r["cluster_id"] for r in res2["tables"]["doc_clusters"].collect()}
    assert clusters2 == clusters
