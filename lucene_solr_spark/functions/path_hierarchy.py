"""PathHierarchyTokenizer / ReversePathHierarchyTokenizer —
hierarchical path facet tokens (``analysis/common/src/java/org/apache/
lucene/analysis/path/PathHierarchyTokenizer.java`` and
``ReversePathHierarchyTokenizer.java``).

``/a/b/c`` → ``/a``, ``/a/b``, ``/a/b/c`` (forward: every prefix ending
at a delimiter; a trailing delimiter adds a delimiter-final token) —
all at ONE position (first token posIncr 1, the rest 0). ``skip`` drops
leading components; ``replacement`` rewrites the delimiter char. The
reverse variant emits every SUFFIX starting at a delimiter, dropping
``skip`` trailing components.

The scalar functions transliterate the reference read loops (the
forward tokenizer's skip/endDelimiter state machine,
``PathHierarchyTokenizer.java:110-186``; the reverse tokenizer's
delimiter-position table, ``ReversePathHierarchyTokenizer.java:
116-168``). :func:`path_facet_counts` is the DataFrame operator: one
``explode`` over a JVM-side prefix expression for the default config —
per-path-depth facet counting with no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "path_hierarchy_tokens",
    "reverse_path_hierarchy_tokens",
    "path_facet_counts",
]


def path_hierarchy_tokens(
    text: str, delimiter: str = "/", replacement: str | None = None, skip: int = 0
) -> list[str]:
    """Forward tokenizer: emission-ordered terms (first carries the
    position increment, the rest stack at posIncr 0)."""
    replacement = delimiter if replacement is None else replacement
    out: list[str] = []
    result = ""  # resultToken carried across emissions
    skipped = 0
    end_delim = False
    i, n = 0, len(text)
    while True:
        term = result
        added = False
        if end_delim:
            term += replacement
            end_delim = False
            added = True
        while True:
            if i >= n:  # EOF (:131-143)
                if skipped > skip and added:
                    out.append(term)
                return out
            c = text[i]
            i += 1
            if not added:
                added = True
                skipped += 1
                if skipped > skip:
                    term += replacement if c == delimiter else c
            elif c == delimiter:
                if skipped > skip:
                    end_delim = True
                    break
                skipped += 1
                if skipped > skip:
                    term += replacement
            elif skipped > skip:
                term += c
        out.append(term)
        result = term


def reverse_path_hierarchy_tokens(
    text: str, delimiter: str = "/", replacement: str | None = None, skip: int = 0
) -> list[str]:
    """Reverse tokenizer: every suffix starting at a delimiter position,
    ``skip`` trailing components dropped."""
    replacement = delimiter if replacement is None else replacement
    n = len(text)
    delim_pos = [0]
    for i, c in enumerate(text):
        if c == delimiter:
            delim_pos.append(i + 1)
    if delim_pos[-1] < n:
        delim_pos.append(n)
    count = len(delim_pos)
    idx = count - 1 - skip
    if idx < 0:
        return []
    end = delim_pos[idx]
    buf = text.replace(delimiter, replacement)
    return [buf[delim_pos[s] : end] for s in range(0, count - skip - 1)]


def path_facet_counts(
    docs: DataFrame, path_col: str, delimiter: str = "/"
) -> DataFrame:
    """Hierarchical facet counting over a path column (the tokenizer's
    classic use: one doc counts once under EVERY ancestor path).
    Returns (term, df) — JVM split/slice/explode, one aggregation."""
    parts = F.split(F.col(path_col), delimiter)
    # prefix i = components 0..i joined; drop the empty leading prefix
    prefixes = F.filter(
        F.transform(
            parts,
            lambda _x, i: F.array_join(
                F.slice(parts, F.lit(1), i + F.lit(1)), delimiter
            ),
        ),
        lambda p: p != F.lit(""),
    )
    return (
        docs.select(F.explode(prefixes).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
