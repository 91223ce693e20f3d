"""Tracked persist + release hook shared by every query module.

Several queries ``persist()`` a multi-consumer subtree (signature
frames, shingle relations, normalized-embedding projections) so it
computes once WITHIN the query. persist() is the right tool for those
frames (the GC-managed localCheckpoint alternative measured slower on
the multi-consumer minhash signatures), but a bare persist() parks a
session-lifetime entry in the SQL cache manager: the registry sweep's
wrapper clears the cache on entry, while a LIBRARY caller composing
queries directly would accumulate data-sized entries forever.

Every query-module persist therefore goes through :func:`tracked_persist`,
and :func:`release_caches` drops everything at once — call it after the
result DataFrame is fully materialized (collect/write). The caches
exist so shared subtrees compute once within a query, never across
calls; re-running a query simply re-persists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` with the handle recorded for release_caches()."""
    _PERSISTED.append(df.persist())
    return df


def release_caches() -> None:
    """Unpersist every relation any query module cached via
    :func:`tracked_persist`. Idempotent; safe at any time (unpersist on
    a not-yet-materialized frame is a no-op registration drop)."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
