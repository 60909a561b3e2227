"""Pure-Python/numpy single-node oracle implementing the reference's exact
semantics (the role Lucene's CheckHits / test-framework plays:
``lucene/test-framework/.../search/CheckHits.java:329`` delta-0 standard).

Everything in the Spark engine is tested against this package.
"""

from lucene_solr_spark.oracle.smallfloat import (  # noqa: F401
    byte4_to_int,
    int4_to_long,
    int_to_byte4,
    long_to_int4,
)
