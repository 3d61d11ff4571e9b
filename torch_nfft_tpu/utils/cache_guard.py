"""Compile-cache drift guard.

The committed ``.jax_cache`` persists XLA executables so a fresh checkout
skips the ~300 s remote compile of the benchmark pair through the axon
tunnel. Pallas/Mosaic custom-call payloads embed SOURCE LOCATIONS, so ANY
line shift in a file whose code gets traced into the hot programs silently
invalidates the big cache entries (docs/tpu_design.md round-4 findings) —
and nothing used to enforce the "re-run bench.py after touching hot-path
sources" rule.

This module hashes the traced hot-path sources. ``bench.py`` stamps the
hash into ``.jax_cache/SOURCES_HASH`` after a successful run;
``tests/test_cache_guard.py`` fails loudly (with the re-run instruction)
whenever the committed stamp no longer matches the tree.
"""

from __future__ import annotations

import hashlib
import os

# Files whose code is traced into the benchmark's jitted programs (direct
# sources of jaxprs/Pallas payloads). Paths relative to the repo root.
HOT_SOURCES = (
    "bench.py",
    "torch_nfft_tpu/ops/binned.py",
    "torch_nfft_tpu/ops/planar.py",
    "torch_nfft_tpu/ops/fft.py",
    "torch_nfft_tpu/ops/spectral.py",
    "torch_nfft_tpu/ops/tilefold.py",
    "torch_nfft_tpu/ops/window.py",
    "torch_nfft_tpu/ops/spread_gather.py",
    "torch_nfft_tpu/ops/pallas/contract.py",
    "torch_nfft_tpu/ops/pallas/benes.py",
    "torch_nfft_tpu/ops/pallas/bitonic.py",
    "torch_nfft_tpu/ops/pallas/ragged.py",
)

STAMP_NAME = "SOURCES_HASH"


def repo_root() -> str:
    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def hot_source_hash(root: str | None = None) -> str:
    """sha256 over the concatenated bytes of every hot-path source."""
    root = repo_root() if root is None else root
    h = hashlib.sha256()
    for rel in HOT_SOURCES:
        path = os.path.join(root, rel)
        h.update(rel.encode())
        try:
            with open(path, "rb") as f:
                h.update(f.read())
        except OSError:
            h.update(b"<missing>")
    return h.hexdigest()


def stamp_path(cache_dir: str | None = None) -> str:
    if cache_dir is None:
        cache_dir = os.path.join(repo_root(), ".jax_cache")
    return os.path.join(cache_dir, STAMP_NAME)


def read_stamp(cache_dir: str | None = None) -> str | None:
    try:
        with open(stamp_path(cache_dir)) as f:
            return f.read().strip()
    except OSError:
        return None


def write_stamp(cache_dir: str | None = None) -> None:
    path = stamp_path(cache_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(hot_source_hash() + "\n")


def check(cache_dir: str | None = None) -> tuple[bool, str]:
    """(ok, message): ok=False when the committed cache was stamped for a
    DIFFERENT version of the hot-path sources (expect a cold remote
    compile; re-run bench.py after the last hot-path edit and commit the
    refreshed .jax_cache + stamp)."""
    stamp = read_stamp(cache_dir)
    now = hot_source_hash()
    if stamp is None:
        return True, "no SOURCES_HASH stamp (cache freshness unknown)"
    if stamp == now:
        return True, "compile cache stamp matches the hot-path sources"
    return False, (
        "compile-cache stamp MISMATCH: a hot-path source changed since the "
        "committed .jax_cache was populated — the big Pallas cache entries "
        "embed source locations and will MISS (~300 s remote recompile "
        "through the tunnel). Re-run `python bench.py` after the LAST edit "
        "to any hot-path source, then commit .jax_cache (including "
        "SOURCES_HASH)."
    )
