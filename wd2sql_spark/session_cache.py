"""Session-scoped build-once caches for derived relations.

Several operators build a relation once per SparkSession and reuse it
(the parsed wikidata dump, the IVF index). The subtle part — flagged in
an earlier review — is the key: a plain ``id(spark)`` can be recycled by
the allocator after a session is stopped and GC'd, handing a NEW session
cached DataFrames bound to a dead SparkContext. This helper owns that
logic in one place: entries hold a WEAK reference to the session, a hit
requires the weakref to resolve to the very session asking, and dead
entries are swept on access.
"""

from __future__ import annotations

import weakref
from collections.abc import Callable
from typing import Any

from pyspark.sql import SparkSession


# Every live SessionCache instance, so plan documentation can reset them
# all: a query whose cached relation is already built plans against an
# unpersisted (or differently-persisted) subtree and its Exchange census
# shifts with suite ordering (observed 18 fresh vs 13 after a cache hit on
# the prefix-filter array relation). ``clear_all_session_caches()`` pins
# plan generation to the reproducible fresh-build shape.
_ALL_CACHES: "weakref.WeakSet[SessionCache]" = weakref.WeakSet()


def clear_all_session_caches() -> None:
    for cache in list(_ALL_CACHES):
        cache._entries.clear()


class SessionCache:
    """``get_or_build(spark, key, build)`` — one value per (live session,
    key). Not thread-safe by design: Spark query construction is
    driver-single-threaded in this codebase (the concurrent ETL writes
    share no cache)."""

    def __init__(self) -> None:
        self._entries: dict[tuple, tuple[weakref.ref, Any]] = {}
        _ALL_CACHES.add(self)

    def get_or_build(self, spark: SparkSession, key: tuple, build: Callable[[], Any]) -> Any:
        for k, (ref, _) in list(self._entries.items()):
            if ref() is None:
                del self._entries[k]
        full_key = (id(spark), *key)
        hit = self._entries.get(full_key)
        if hit is not None and hit[0]() is spark:
            return hit[1]
        value = build()
        self._entries[full_key] = (weakref.ref(spark), value)
        return value
