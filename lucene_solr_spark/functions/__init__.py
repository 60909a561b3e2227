"""Vectorized Arrow UDF kernels and column-expression builders: analysis
(tokenization), BM25 scoring, text analytics, dedup, similarity search."""
