"""Facade (SearchEngine) end-to-end: index → search strings → append →
merge → reopen."""

from __future__ import annotations

import struct

from lucene_solr_spark.api import SearchEngine
from lucene_solr_spark.sources.corpus import corpus_to_spark, make_corpus_rows


def bits(x) -> int:
    return struct.unpack("<I", struct.pack("<f", float(x)))[0]


def test_api_end_to_end(spark, tmp_path_factory, tiny_oracle):
    base = str(tmp_path_factory.mktemp("apix"))
    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=4)
    eng = SearchEngine.index_corpus(spark, corpus, base, segment_size=32)

    assert eng.stats()["doc_count"] == 100

    # string queries → Lucene-parity rankings
    from lucene_solr_spark.plans.parser import parse_query

    for qs in ("def", "+def +class", "error OR warning", '"x y"'):
        hits = eng.search(qs, k=5)
        expected = [
            (sd.doc_id, bits(sd.score))
            for sd in tiny_oracle.search(parse_query(qs), k=5)
        ]
        assert [(h.doc_id, bits(h.score)) for h in hits] == expected, qs

    # batched
    res = eng.search_batch({"a": "def", "b": "merge window"}, k=3)
    assert res.count() == 6

    # count
    assert eng.count("def") == tiny_oracle.count(parse_query("def"))

    # append + reopen
    extra = spark.createDataFrame(make_corpus_rows(10, seed=99), corpus.schema)
    sid = eng.append(extra)
    assert sid is not None
    assert eng.stats()["doc_count"] == 110
    assert eng.search("def", k=5)

    # merge
    eng.merge()
    assert eng.stats()["doc_count"] == 110
    assert len(eng.search("def", k=5)) == 5
