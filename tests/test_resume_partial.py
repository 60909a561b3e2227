"""Crash-resume invariant (SURVEY §5(f)): lose part of a segment build,
resume, and converge to the byte-identical manifest."""

from __future__ import annotations

import json
import shutil

from lucene_solr_spark.operators.index_build import build_index
from lucene_solr_spark.operators.segments import SegmentIndex, build_segments
from lucene_solr_spark.sources.corpus import corpus_to_spark


def test_partial_failure_then_resume(spark, tmp_path_factory):
    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=4)
    ix = build_index(corpus).persist()

    base = str(tmp_path_factory.mktemp("resumeix"))
    build_segments(ix, base, segment_size=16)
    golden = SegmentIndex.open(base).manifest()

    # simulate a crash that lost segments 2 and 4 AFTER they were written
    # but BEFORE the (re)written manifest named them: drop their data dirs
    # and their manifest rows (the manifest is the only commit point)
    for sid in (2, 4):
        shutil.rmtree(f"{base}/segments/segment_id={sid}")
        shutil.rmtree(f"{base}/seg_docs/segment_id={sid}")
    m = dict(golden)
    m["segments"] = [s for s in golden["segments"] if s["segment_id"] not in (2, 4)]
    with open(f"{base}/manifest.json", "w") as f:
        json.dump(m, f)

    # resume: only the missing segments are rebuilt
    build_segments(ix, base, segment_size=16, resume=True)
    recovered = SegmentIndex.open(base).manifest()
    assert recovered["manifest_sha256"] == golden["manifest_sha256"]
    assert recovered["segments"] == golden["segments"]

    # and the recovered index still searches identically
    from lucene_solr_spark.operators.topk import SegmentSearcher
    from lucene_solr_spark.plans import ir

    s = SegmentSearcher(spark, SegmentIndex.open(base), mode="float32")
    rows = s.topk(ir.TermQuery("def"), k=5).collect()
    assert len(rows) == 5
