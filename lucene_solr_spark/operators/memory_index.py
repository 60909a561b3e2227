"""MemoryIndex (``lucene/memory/src/java/org/apache/lucene/index/memory/
MemoryIndex.java``) — a single-document, in-RAM index for evaluating
queries against one document (percolation, classification of unseen
text, relevance debugging).

This facade wraps the engine's single-node oracle index per field: the
same float32 BM25 chain, positions, and analyzer kernel the distributed
engine is gate-checked against — so ``MemoryIndex.search(q)`` scores
exactly what the cluster engine scores for a one-document corpus.  It
is also exactly the verifier the monitor module runs per candidate
document (operators/monitor.py ``_match_one_doc``), the role
MemoryIndex plays inside Lucene's Monitor.
"""

from __future__ import annotations

from ..plans import ir

__all__ = ["MemoryIndex"]


class MemoryIndex:
    def __init__(self, **analyzer_kwargs) -> None:
        self._analyzer_kwargs = dict(analyzer_kwargs)
        self._fields: dict[str, str] = {}
        self._indexes: dict[str, object] = {}

    # ---- building (MemoryIndex.addField, :262-300) -----------------------

    def add_field(self, field: str, text: str) -> None:
        if field in self._fields:
            # the reference appends with a position gap; one text per
            # field keeps the facade honest without re-implementing the
            # gap bookkeeping nobody uses through this API
            raise ValueError(f"field {field!r} already added")
        self._fields[field] = text
        self._indexes.pop(field, None)

    def reset(self) -> None:  # MemoryIndex.reset (:1746)
        self._fields.clear()
        self._indexes.clear()

    # ---- searching (MemoryIndex.search, :731-756) ------------------------

    def _index(self, field: str):
        if field not in self._indexes:
            from ..oracle.engine import OracleIndex

            self._indexes[field] = OracleIndex(
                [(0, self._fields[field])], **self._analyzer_kwargs
            )
        return self._indexes[field]

    def _route(self, q: ir.Query) -> str:
        field = getattr(q, "field", None)
        if field is not None:
            if field not in self._fields:
                raise KeyError(f"unknown field {field!r}")
            return field
        if not self._fields:
            raise ValueError("no fields added")
        return next(iter(self._fields))

    def search(self, q: ir.Query) -> float:
        """Float32 score of the document for ``q``; 0.0 when it does not
        match (MemoryIndex.search returns 0.0f on no match)."""
        ix = self._index(self._route(q))
        res = ix.matches(q)
        return float(res.get(0, 0.0))

    def matches(self, q: ir.Query) -> bool:
        ix = self._index(self._route(q))
        return 0 in ix.matches(q)
