"""Compile-cache drift guard (utils/cache_guard.py).

A committed .jax_cache stamped for different hot-path sources would hand
the benchmark driver a ~300 s cold remote compile (Pallas cache entries
embed source locations) — the guard must fail loudly with the re-run
instruction.
"""

import os

import pytest

from torch_nfft_tpu.utils.cache_guard import (
    check,
    hot_source_hash,
    read_stamp,
    repo_root,
    write_stamp,
)


def test_hash_changes_with_sources(tmp_path):
    root = tmp_path / "repo"
    (root / "torch_nfft_tpu" / "ops" / "pallas").mkdir(parents=True)
    (root / "bench.py").write_text("a = 1\n")
    h1 = hot_source_hash(str(root))
    (root / "bench.py").write_text("a = 2\n")
    h2 = hot_source_hash(str(root))
    assert h1 != h2


def test_stamp_roundtrip(tmp_path):
    cache = str(tmp_path / "cache")
    assert read_stamp(cache) is None
    ok, msg = check(cache)
    assert ok and "unknown" in msg
    write_stamp(cache)
    ok, msg = check(cache)
    assert ok and "matches" in msg


def test_mismatch_fails_loudly(tmp_path):
    cache = str(tmp_path / "cache")
    os.makedirs(cache)
    with open(os.path.join(cache, "SOURCES_HASH"), "w") as f:
        f.write("deadbeef\n")
    ok, msg = check(cache)
    assert not ok
    assert "re-run" in msg.lower() or "bench.py" in msg


def test_committed_cache_matches_tree():
    """THE guard: if the repo ships a stamped .jax_cache, the stamp must
    match the current hot-path sources. A failure here means a hot-path
    source changed after the cache was populated — run `python bench.py`
    (on the TPU host) after the LAST hot-path edit and commit the
    refreshed .jax_cache including SOURCES_HASH."""
    cache_dir = os.path.join(repo_root(), ".jax_cache")
    stamp = read_stamp(cache_dir)
    if stamp is None:
        pytest.skip("no committed cache stamp")
    ok, msg = check(cache_dir)
    assert ok, msg
