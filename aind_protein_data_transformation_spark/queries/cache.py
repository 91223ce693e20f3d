"""Tracked persist + release hook shared by every query module.

Several queries ``persist()`` a multi-consumer subtree (signature
frames, shingle relations, normalized-embedding projections) so it
computes once WITHIN the query. persist() is the right tool for those
frames (the GC-managed localCheckpoint alternative measured slower on
the multi-consumer minhash signatures), but a bare persist() parks a
session-lifetime entry in the SQL cache manager: the registry sweep's
wrapper clears the cache on entry, while a LIBRARY caller composing
queries directly would accumulate data-sized entries forever.

Every query-module persist therefore goes through
:func:`tracked_persist`; a caller bounds the lifecycle either way:

- **Scoped (preferred — impossible to forget)**::

      with bounded_caches():
          result = dedup_minhash_lsh(spark, sf_dir).collect()
      # every frame the block persisted is unpersisted here

- **Explicit**: call :func:`release_caches` after the result
  DataFrame is fully materialized (collect/write).

Thread model: ``bounded_caches`` scopes are THREAD-LOCAL — two threads
composing queries concurrently each release only the frames their own
block persisted (exiting one scope can never unpersist a frame another
thread is still consuming). Persists made outside any scope land on a
lock-guarded module list that :func:`release_caches` drains; the list
holds only the plan handles (not data), so an un-released session leaks
bounded driver objects, never executor memory growth beyond the caches
themselves — but call release (or use the scope) anyway.

The caches exist so shared subtrees compute once within a query, never
across calls; re-running a query simply re-persists.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
#: persists made OUTSIDE any bounded_caches scope (drained by
#: release_caches). Kept as a plain module list so tests can assert on
#: the untracked population directly.
_PERSISTED: list[DataFrame] = []
#: per-thread stack of active bounded_caches scopes
_SCOPES = threading.local()


def _scope_stack() -> list[list[DataFrame]]:
    stack = getattr(_SCOPES, "stack", None)
    if stack is None:
        stack = _SCOPES.stack = []
    return stack


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` with the handle recorded for release: to the
    CURRENT THREAD's innermost :func:`bounded_caches` scope if one is
    active, else to the module list :func:`release_caches` drains."""
    df.persist()
    stack = _scope_stack()
    if stack:
        stack[-1].append(df)
    else:
        with _LOCK:
            _PERSISTED.append(df)
    return df


def release_caches() -> None:
    """Unpersist every relation cached via :func:`tracked_persist`
    OUTSIDE a ``bounded_caches`` scope. Idempotent; safe at any time
    (unpersist on a not-yet-materialized frame is a no-op registration
    drop). Frames persisted inside an active scope belong to that
    scope and are NOT touched — the scope exit releases them."""
    with _LOCK:
        frames, _PERSISTED[:] = list(_PERSISTED), []
    for df in reversed(frames):
        df.unpersist()


@contextmanager
def bounded_caches():
    """Scope every :func:`tracked_persist` made by THIS THREAD inside
    the block; unpersist them all on exit (normal or exception)::

        with bounded_caches():
            out = dedup_minhash_lsh(spark, sf_dir)
            out.write.parquet(dst)
        # the shingle/signature caches are gone here

    Reentrant (scopes nest; the innermost active scope owns new
    persists) and thread-local (concurrent threads' scopes are
    independent), which makes the lifecycle impossible to misuse: a
    caller cannot forget the release, and one thread's exit cannot
    evict a frame a concurrent thread persisted."""
    scope: list[DataFrame] = []
    stack = _scope_stack()
    stack.append(scope)
    try:
        yield
    finally:
        stack.pop()
        for df in reversed(scope):
            df.unpersist()
