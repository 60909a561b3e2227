"""Query layer: IR dataclasses, Lucene-equivalent logical rewrites, the
query-string parser, and the two physical executors (relational DataFrame
path and the vectorized block-kernel path)."""
