"""Session-scoped scratch space and the built-index memo.

Two problems, one module (ADVICE r9 item 4 + VERDICT r9 item 3):

- **Scratch leakage**: the index-lifecycle registry entries used to
  ``tempfile.mkdtemp`` per invocation and never clean up — a bench run
  (two reps + the streaming pass) leaked full table/index copies into
  /tmp every round. Every scratch dir now lives under ONE per-process
  root that an ``atexit`` hook removes, so the process exits clean no
  matter how many entries ran.

- **Repeated index builds**: emb_index_persist / _append / _compact /
  emb_ivf_cell_stats (and the LSH twins) each rebuilt their BASE index
  from scratch per call — correct for the oracle gate, but ~9 s of
  repeated setup per bench leg. ``memoized_index`` keys a BUILT index
  directory on (kind, input fingerprint, params) — the same identity
  the trained-quantizer memo uses (plan semanticHash + schema + source
  file stats, ``operators.ann._memo_fingerprint``), so rewriting input
  data in place invalidates it. Entries whose lifecycle MUTATES the
  index (append / compact / crash-recovery / streaming ingest) never
  touch the memoized copy: they take a ``fresh_copy`` (an OS-level
  copytree — file copy is ~100× cheaper than the Spark train+assign+
  write jobs it replaces) and mutate that. The memo is semantically
  invisible: a build is a pure function of (input, params), proven by
  the determinism test (clear_index_memo → rebuild → identical
  results; tests/test_round10_ops.py).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from collections.abc import Callable

__all__ = [
    "scratch_dir",
    "scratch_root",
    "memoized_index",
    "fresh_copy",
    "clear_index_memo",
]

_ROOT: list[str | None] = [None]


def scratch_root() -> str:
    """The per-process scratch root; created lazily, removed at exit."""
    if _ROOT[0] is None or not os.path.isdir(_ROOT[0]):
        _ROOT[0] = tempfile.mkdtemp(prefix="gmall_scratch_")
        atexit.register(_cleanup)
    return _ROOT[0]


def _cleanup() -> None:
    root = _ROOT[0]
    _ROOT[0] = None
    _INDEX_MEMO.clear()
    if root and os.path.isdir(root):
        shutil.rmtree(root, ignore_errors=True)


def scratch_dir(prefix: str) -> str:
    """A fresh directory under the session scratch root."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())


# (kind, input fingerprint, params) -> built index directory. Values are
# directories on local disk, so the memo also revalidates existence —
# an externally-removed dir simply rebuilds.
_INDEX_MEMO: dict[tuple, str] = {}


def clear_index_memo() -> None:
    """Invalidation hook: forget every memoized built index (the dirs
    themselves stay until process exit; rebuilds allocate fresh ones)."""
    _INDEX_MEMO.clear()


def memoized_index(
    kind: str,
    df,  # DataFrame — the build input; fingerprinted for identity
    params: tuple,
    build: Callable[[str], None],
) -> str:
    """Build-once index directory per (kind, input identity, params).

    ``build(path)`` is invoked at most once per key per process; the
    returned directory is SHARED and must be treated as read-only —
    mutating callers copy it first (``fresh_copy``). Keyed on the same
    input fingerprint as the trained-artifact memo, so in-place data
    rewrites invalidate; non-file inputs fall back to the plan hash
    (immutable-within-process assumption, as documented there).
    """
    from .operators.ann import _memo_fingerprint

    key = (kind, _memo_fingerprint(df), params)
    path = _INDEX_MEMO.get(key)
    if path is not None and os.path.isdir(path):
        return path
    path = os.path.join(scratch_dir(f"{kind}_"), "index")
    build(path)
    _INDEX_MEMO[key] = path
    return path


def fresh_copy(src: str, prefix: str) -> str:
    """Private mutable copy of a built index directory (hardlink-based
    where the OS allows: the parquet files are immutable data blocks —
    appends add files, compaction replaces whole directories — so
    link-copies are safe and O(metadata))."""
    dst = os.path.join(scratch_dir(prefix), "index")
    try:
        shutil.copytree(src, dst, copy_function=os.link)
    except OSError:
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(src, dst)
    return dst
