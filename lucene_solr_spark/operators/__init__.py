"""Index-build and query-execution operators: docID assignment, the
tokenize→explode→aggregate posting pipeline, segment encoding, tiered
merging, and the vectorized top-k kernels."""
