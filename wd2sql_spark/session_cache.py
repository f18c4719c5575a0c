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


class SessionCache:
    """``get_or_build(spark, key, build)`` — one value per (live session,
    key). Not thread-safe by design: Spark query construction is
    driver-single-threaded in this codebase (the concurrent ETL writes
    share no cache)."""

    def __init__(self) -> None:
        self._entries: dict[tuple, tuple[weakref.ref, Any]] = {}

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
