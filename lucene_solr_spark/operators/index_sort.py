"""Index-time sorting — ``IndexWriterConfig.setIndexSort``
(``index/IndexWriterConfig.java:350-390``; per-segment docID remap in
``index/Sorter.java``): documents are laid out in sort-field order so a
query sorted by that field terminates after the first competitive docs.

Spark-first mapping: Lucene sorts WITHIN each segment and keeps merges
sort-aware; here the engine's deterministic docID assignment (dense rank
over a total key order — SURVEY §7.1.3) IS the seam. A sorted index
assigns docIDs by (sort fields, tiebreak key) instead of the primary
key, and the doc-range segment layout then makes every segment a
contiguous range OF THE SORT ORDER — stronger than Lucene's per-segment
sort, with zero extra machinery: the sort shuffle replaces the identical
id-assignment shuffle, so a sorted build costs the same as an unsorted
one.

Early termination (``TopFieldCollector`` + sort-aware
``EarlyTerminatingSortingCollector`` role): top-k by the index sort
reads segments in id order and STOPS once k hits are in hand — at 100 TB
a time-sorted corpus answers "latest k matching" from the first few
doc-range partitions instead of a full scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.operators.index_build import InvertedIndex, build_index
from lucene_solr_spark.plans import ir

__all__ = ["build_sorted_index", "early_terminated_topk"]


def build_sorted_index(
    corpus: DataFrame,
    sort_by: list[tuple[str, str]],
    *,
    text_col: str,
    tiebreak_col: str,
    keep_cols: tuple[str, ...] = (),
    **build_kw,
) -> InvertedIndex:
    """Build an index whose docIDs follow ``sort_by`` order.

    ``sort_by``: [(column, "asc"|"desc"), ...] — desc supported for
    numeric columns (SortField.setReverse role). ``tiebreak_col`` (a
    unique key, e.g. the source row id) makes the order total, keeping
    docIDs cluster-size-independent. The original key survives in
    ``keep_cols`` for mapping hits back.
    """
    tmp = corpus
    key_cols: list[str] = []
    for i, (col, direction) in enumerate(sort_by):
        c = F.col(col)
        if direction == "desc":
            dt = dict(corpus.dtypes).get(col, "")
            if dt in ("string", "binary"):
                raise ValueError(f"desc index sort needs a numeric column, got {col}:{dt}")
            c = -c
        elif direction != "asc":
            raise ValueError(f"sort direction must be asc|desc, got {direction!r}")
        sk = f"_sort{i}"
        tmp = tmp.withColumn(sk, c)
        key_cols.append(sk)
    key_cols.append(tiebreak_col)
    keep = tuple(dict.fromkeys((tiebreak_col, *keep_cols)))
    return build_index(
        tmp,
        text_col=text_col,
        doc_id_col=None,
        key_cols=tuple(key_cols),
        keep_cols=keep,
        **build_kw,
    )


def early_terminated_topk(
    searcher,
    q: ir.Query,
    k: int = 10,
    *,
    growth: int = 4,
) -> tuple[DataFrame, int]:
    """Top-k in INDEX-SORT order over a ``SegmentSearcher`` whose index
    was built by ``build_sorted_index``: scan a geometrically growing
    PREFIX of segments (doc-range = sort-range) and stop as soon as the
    fully-scanned prefix holds >= k hits — every hit in a later segment
    sorts after every hit in the prefix, so the stop is exact.

    Returns ``(top-k DataFrame (doc_id asc), segments_read)`` —
    ``segments_read`` is the evidence the scan pruned.
    """
    seg_ids = sorted(
        int(s["segment_id"]) for s in searcher.index.manifest()["segments"]
    )
    n = 1
    while True:
        prefix = seg_ids[:n]
        hits = (
            searcher.matches(q, segment_ids=prefix)
            .select("doc_id")
            .orderBy(F.asc("doc_id"))
            .limit(k)
        )
        if n >= len(seg_ids) or hits.count() >= k:
            return hits, len(prefix)
        n = min(len(seg_ids), n * growth)
