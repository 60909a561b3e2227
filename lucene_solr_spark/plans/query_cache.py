"""LRU query cache: memoized filter match-sets with usage-tracking policy.

Reference roles:
- ``search/LRUQueryCache.java:85`` — per-segment DocIdSet cache for
  filter-context queries (FILTER / MUST_NOT clauses), LRU-evicted.
- ``search/UsageTrackingQueryCachingPolicy.java`` — only cache a query
  once it recurs in a recent-history window (min frequency 2 for costly
  queries such as multi-term/phrase/point queries, 5 for cheap ones),
  and never cache queries that are as cheap to re-execute as to cache
  (TermQuery, MatchAll/MatchNone).

Spark re-expression — NOT a byte-level port: a filter's match-set here
is a ``DataFrame(doc_id)``; "caching a DocIdSet" becomes pinning that
DataFrame with ``.persist(MEMORY_AND_DISK)`` and eviction becomes
``.unpersist()``. On a cluster the persisted blocks live partition-by-
partition in executor block storage, which is the same locality story
as Lucene's per-leaf cache (each executor holds the doc_id sets for the
partitions it scans). The cache is therefore distributed storage with
driver-side bookkeeping: the driver tracks keys, recency, and hit/miss
stats; the data never flows through the driver.

Scale note (100 TB): persisted match-sets are single-column longs —
tiny relative to the corpus — and MEMORY_AND_DISK spills instead of
OOMing when a filter is unselective. ``max_entries`` bounds the number
of pinned sets, mirroring the reference's maxSize/maxRamBytesUsed pair.
"""

from __future__ import annotations

from collections import OrderedDict, deque
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from . import ir

#: query shapes the reference never caches (UsageTrackingQueryCachingPolicy
#: shouldNeverCache): re-executing them is cheaper than managing a cached set.
_NEVER_CACHE = (ir.TermQuery, ir.MatchAllDocsQuery, ir.MatchNoDocsQuery)

#: "costly" shapes (multi-term expansion, positional verification) get the
#: low recurrence threshold — caching pays off on the second sighting.
_COSTLY = (
    ir.PrefixQuery,
    ir.WildcardQuery,
    ir.RegexpQuery,
    ir.FuzzyQuery,
    ir.TermRangeQuery,
    ir.PhraseQuery,
    ir.MultiPhraseQuery,
    ir.NGramPhraseQuery,
    ir.SpanNearQuery,
    ir.SpanOrQuery,
    ir.SpanNotQuery,
    ir.SpanWithinQuery,
    ir.SpanContainingQuery,
    ir.SpanNotContainingQuery,
    ir.SpanNotWithinQuery,
    ir.SpanFirstQuery,
)


def query_key(q: ir.Query) -> str:
    """Canonical cache key: IR nodes are frozen dataclasses, so ``repr``
    is deterministic and injective over the tree structure."""
    return repr(q)


@dataclass
class UsageTrackingPolicy:
    """UsageTrackingQueryCachingPolicy role: a ring buffer of recently
    seen filter keys; a query becomes cache-worthy once its key has
    been seen ``min_frequency(query)`` times within the window."""

    history_size: int = 256
    costly_min: int = 2
    default_min: int = 5
    _history: deque = field(default_factory=deque)

    def _unwrap(self, q: ir.Query) -> ir.Query:
        while isinstance(q, (ir.BoostQuery, ir.ConstantScoreQuery)):
            q = q.query
        return q

    def min_frequency(self, q: ir.Query) -> int:
        return self.costly_min if isinstance(self._unwrap(q), _COSTLY) else self.default_min

    def should_cache(self, q: ir.Query) -> bool:
        """Record one sighting; True once recurrence clears the threshold.

        Matches the reference contract: the sighting that crosses the
        threshold itself triggers caching (frequency counts THIS call).
        """
        inner = self._unwrap(q)
        if isinstance(inner, _NEVER_CACHE):
            return False
        key = query_key(q)
        self._history.append(key)
        if len(self._history) > self.history_size:
            self._history.popleft()
        freq = sum(1 for k in self._history if k == key)
        return freq >= self.min_frequency(q)


@dataclass
class LRUQueryCache:
    """LRUQueryCache role over DataFrame match-sets.

    ``get_or_compute(q, compute)`` returns the (doc_id) DataFrame for a
    filter-context query, serving a pinned copy when the key is resident
    and otherwise running ``compute()``; the policy decides whether the
    fresh result gets pinned. Eviction unpersists the least-recently-used
    entry so executor storage is bounded by ``max_entries`` sets.
    """

    max_entries: int = 32
    policy: UsageTrackingPolicy = field(default_factory=UsageTrackingPolicy)
    storage_level: StorageLevel = field(
        default_factory=lambda: StorageLevel.MEMORY_AND_DISK
    )
    hit_count: int = 0
    miss_count: int = 0
    eviction_count: int = 0
    _entries: "OrderedDict[str, DataFrame]" = field(default_factory=OrderedDict)

    def __len__(self) -> int:
        return len(self._entries)

    def get_or_compute(
        self, q: ir.Query, compute: Callable[[], DataFrame]
    ) -> DataFrame:
        key = query_key(q)
        hit = self._entries.get(key)
        if hit is not None:
            self.hit_count += 1
            self._entries.move_to_end(key)
            # a hit still counts as a sighting for the policy window
            self.policy.should_cache(q)
            return hit
        self.miss_count += 1
        df = compute()
        if self.policy.should_cache(q):
            df = df.persist(self.storage_level)
            self._entries[key] = df
            while len(self._entries) > self.max_entries:
                _, lru = self._entries.popitem(last=False)
                lru.unpersist()
                self.eviction_count += 1
        return df

    def clear(self) -> None:
        for df in self._entries.values():
            df.unpersist()
        self._entries.clear()

    def stats(self) -> dict:
        return {
            "hits": self.hit_count,
            "misses": self.miss_count,
            "evictions": self.eviction_count,
            "entries": len(self._entries),
        }
