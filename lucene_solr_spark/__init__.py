"""lucene_solr_spark — a PySpark-native inverted-index + BM25 search engine.

A from-scratch rebuild of the *capabilities* of Apache Lucene's core
indexing and search path (reference: iverase/lucene-solr, Lucene 9.0-dev
era) expressed idiomatically on Spark DataFrames + vectorized Arrow UDFs:

- analysis:  StandardAnalyzer-equivalent tokenize / lowercase / stopword
  (``functions.analysis``; semantics spec'd by the pure-Python oracle in
  ``oracle.tokenizer``)
- index build: tokenize → posexplode → two-stage aggregation →
  repartitionByRange(term) → per-partition numpy encode kernel emitting
  FOR/PFOR/VInt-compressed 128-doc posting blocks with block-max impact
  metadata (``operators.index_build``, ``operators.segments``,
  ``codecs.*``)
- merges: TieredMergePolicy-equivalent segment selection over a manifest
  table (``operators.merge``)
- query: Boolean AND/OR/NOT + ranked top-k with Lucene-exact float32
  BM25 (k1=1.2, b=0.75) and block-max WAND pruning (``plans.*``,
  ``operators.topk``); a pure-DataFrame relational executor doubles as
  the SQL-comparable slow path (``plans.df_executor``).

Nothing is ported: the reference is cited file:line in docstrings for
*semantics parity* only.
"""

__version__ = "0.1.0"
