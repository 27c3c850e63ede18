"""Intra-query persisted intermediates, scoped to ONE operator call.

Several pipeline operators reference the same expensive relation
(the tokenized corpus, its tf aggregate, exploded feature streams)
from multiple places in one declarative plan. Spark plans are trees,
so every reference re-executes the whole subtree — at sf0.1 that is
4-10 redundant tokenize scans per query, and at 100 TB each one is a
full corpus pass. ``shared()`` persists such a relation
(MEMORY_AND_DISK — spills, never OOMs) so the subtree runs once per
invocation and every other reference reads the materialized pages.

Scope rules (anti-gaming invariant): nothing survives across
operator invocations. The entry registry calls ``clear_tracked()``
before every query, so each bench/oracle run recomputes everything
from the parquet inputs; persisted data is only ever reused WITHIN
the single plan that created it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def clear_tracked() -> None:
    """Unpersist every intermediate tracked by previous operator
    calls (invoked by the entry registry before each query)."""
    global _TRACKED
    tracked, _TRACKED = _TRACKED, []
    for df in tracked:
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass


def shared(df: DataFrame) -> DataFrame:
    """Mark an intermediate that the surrounding operator references
    more than once. Persisted lazily; materialized by the first
    action that touches it; freed at the next ``clear_tracked()``."""
    df.persist(StorageLevel.MEMORY_AND_DISK)
    _TRACKED.append(df)
    return df
