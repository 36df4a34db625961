"""Shared per-dataset build cache with atomic-rename commit.

Several driver-gated queries exercise an operator whose input must
first be BUILT from a fixture (the gzip CDC zone, the fragmented +
compacted zone, z-ordered parquet, MVCC snapshot versions). Each build
is deterministic in (family version, sf_dir), so it is materialized
once under ``$TMPDIR/<family>_cache_<version>_<sha16(sf_dir)>`` and
reused by bench, correctness, and tests.

Discipline (shared by every family through ``ensure_cached_build``):

* the build lands in a unique temp dir and is atomically renamed into
  place, so a crashed build can never be mistaken for a complete one
  and concurrent builders race safely (loser's rename fails, winner's
  dir is used);
* only caches from OLDER versions of the SAME family are swept — the
  version is encoded in the dir name, so same-version caches for other
  sf_dirs survive (bench/tests alternating between scales don't thrash
  each other), and other families are never touched.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable, Sequence


def cache_path(family: str, version: str, sf_dir: str) -> str:
    key = hashlib.sha256(os.path.realpath(sf_dir).encode()).hexdigest()[:16]
    return os.path.join(
        tempfile.gettempdir(), f"{family}_cache_{version}_{key}"
    )


def ensure_cached_build(
    family: str,
    version: str,
    sf_dir: str,
    build_fn: Callable[[str], None],
    extra_stale_prefixes: Sequence[str] = (),
) -> str:
    """Return the committed cache dir for (family, version, sf_dir),
    building it with ``build_fn(build_dir)`` if absent. See module
    docstring for the commit/sweep discipline. ``extra_stale_prefixes``
    names legacy layouts to sweep alongside older versions."""
    final = cache_path(family, version, sf_dir)
    if os.path.isdir(final):
        return final
    tmp_root = tempfile.gettempdir()
    keep = f"{family}_cache_{version}_"
    for name in os.listdir(tmp_root):
        stale = any(name.startswith(p) for p in extra_stale_prefixes) or (
            name.startswith(f"{family}_cache_") and not name.startswith(keep)
        )
        if stale:
            shutil.rmtree(os.path.join(tmp_root, name), ignore_errors=True)
    build = tempfile.mkdtemp(prefix=f"{family}_build_", dir=tmp_root)
    try:
        build_fn(build)
        try:
            os.rename(build, final)
        except OSError:
            # concurrent builder won the rename; use its dir
            shutil.rmtree(build, ignore_errors=True)
    except BaseException:
        shutil.rmtree(build, ignore_errors=True)
        raise
    return final
