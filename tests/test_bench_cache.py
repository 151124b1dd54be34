"""Fixture-cache hygiene: the round-3 scaling runs left 80 GB of cached
bench corpora under .fixtures, filled the disk, and broke the pytest gate.
bench.prune_fixture_cache must delete largest-first until under the cap,
keep the small gate-tier corpora, and leave non-corpus entries alone."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _mk_corpus(root, name, mb):
    d = root / name
    d.mkdir(parents=True)
    (d / "part-00000.parquet").write_bytes(b"\x00" * (mb * 1024 * 1024))
    (d / "_SUCCESS").write_bytes(b"")
    return d


def test_prune_largest_first_until_under_cap(tmp_path):
    root = tmp_path / ".fixtures"
    _mk_corpus(root, "clips_bench_960000", 50)
    _mk_corpus(root, "clips_bench_480000", 25)
    small = _mk_corpus(root, "clips_bench_20000", 2)
    keep = _mk_corpus(root, "clips_200", 1)  # not a bench corpus: never pruned

    res = bench.prune_fixture_cache(cap_bytes=10 * 1024 * 1024, root=str(root))
    assert res["removed"] == ["clips_bench_960000", "clips_bench_480000"]
    assert small.exists() and keep.exists()
    assert res["kept_bytes"] <= 10 * 1024 * 1024


def test_prune_noop_under_cap(tmp_path):
    root = tmp_path / ".fixtures"
    d = _mk_corpus(root, "clips_bench_20000", 2)
    res = bench.prune_fixture_cache(cap_bytes=100 * 1024 * 1024, root=str(root))
    assert res["removed"] == [] and d.exists()


def test_prune_missing_root_is_safe(tmp_path):
    res = bench.prune_fixture_cache(root=str(tmp_path / "nope"))
    assert res == {"removed": [], "kept_bytes": 0}
