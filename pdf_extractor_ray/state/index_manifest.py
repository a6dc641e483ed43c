"""Shared atomic-manifest protocol for persisted on-disk indexes.

One implementation of the write path both persisted indexes use (the
IVF vector index in ``pipelines/similarity.py`` and the content-hash
ingest index in ``pipelines/ingest.py``): fragments become visible
ONLY via an atomic manifest bump (tmp + os.replace), so readers see
the old or the new fragment list, never a partial one, and a crash
between fragment write and commit leaves an orphan no reader lists.
Single-writer — concurrent appenders must be serialized by the caller,
as with any manifest-backed table format.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile


def manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest.json")


def rel_fragments(root: str, sub: str) -> list[str]:
    """All parquet fragment paths under root/sub, relative to root."""
    return sorted(
        os.path.relpath(p, root)
        for p in glob.glob(os.path.join(root, sub, "**", "*.parquet"), recursive=True)
    )


def read_manifest(index_dir: str, fallback_sub: str | None = None) -> dict:
    """Committed fragment list. With ``fallback_sub``, a pre-manifest
    index (older build) falls back to globbing that subdir — equivalent
    when no appends ever happened; without it, a missing manifest is an
    error (the index was never published)."""
    mp = manifest_path(index_dir)
    if os.path.exists(mp):
        with open(mp) as f:
            return json.load(f)
    if fallback_sub is not None:
        return {"version": 1, "files": rel_fragments(index_dir, fallback_sub)}
    raise FileNotFoundError(mp)


def commit_manifest(index_dir: str, manifest: dict) -> None:
    """Atomic bump (tmp + os.replace)."""
    fd, tmp = tempfile.mkstemp(prefix="manifest-", dir=index_dir)
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, manifest_path(index_dir))
