"""Field collapsing (Solr CollapsingQParserPlugin / grouping
CollapsingTopDocsCollector role): one survivor per key, group head =
(score desc, doc_id asc), survivors ranked the same way."""

from __future__ import annotations

import pytest

from lucene_solr_spark.functions.collapse import collapse_topk
from lucene_solr_spark.plans import ir

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def executor(spark):
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans.df_executor import DFExecutor

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ix = build_index(docs, text_col="text", doc_id_col="doc_id").persist()
    return DFExecutor(ix, mode="double")


def test_collapse_matches_manual(spark, executor):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = ir.BooleanQuery(
        (
            ir.BooleanClause(ir.TermQuery("merge"), ir.Occur.SHOULD),
            ir.BooleanClause(ir.TermQuery("window"), ir.Occur.SHOULD),
        )
    )
    scored = executor.matches(q)
    got = [
        (r["doc_id"], r["score"], r["lang"])
        for r in collapse_topk(scored, docs, "lang", k=10).collect()
    ]

    lang = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    rows = sorted(
        ((r["doc_id"], r["score"]) for r in scored.collect()),
        key=lambda t: (-t[1], t[0]),
    )
    seen, want = set(), []
    for d, s in rows:
        if lang[d] in seen:
            continue
        seen.add(lang[d])
        want.append((d, s, lang[d]))
    assert got == want[:10]
    # at most one row per key
    assert len({g[2] for g in got}) == len(got)


def test_null_policy(spark):
    """Solr nullPolicy parity: ignore (default) drops null-key docs,
    expand passes each through as its own group, collapse makes null one
    ordinary key."""
    scored = spark.createDataFrame(
        [(1, 5.0), (2, 4.0), (3, 3.0), (4, 2.0), (5, 1.0)],
        "doc_id long, score double",
    )
    keys = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, None), (5, "b")],
        "doc_id long, k string",
    )

    def rows(policy):
        return [
            (r["doc_id"], r["k"])
            for r in collapse_topk(
                scored, keys, "k", k=10, null_policy=policy
            ).collect()
        ]

    assert rows("ignore") == [(1, "a"), (5, "b")]
    assert rows("expand") == [(1, "a"), (2, None), (4, None), (5, "b")]
    assert rows("collapse") == [(1, "a"), (2, None), (5, "b")]
    with pytest.raises(ValueError, match="null_policy"):
        rows("bogus")


def test_diversified_topk_brute_force(spark, tiny_oracle):
    """DiversifiedTopDocsCollector: global top-k with <= maxHitsPerKey
    per key == per-key top-N then global top-k (the greedy collector's
    fixed point)."""
    from lucene_solr_spark.functions.collapse import diversified_topk
    from lucene_solr_spark.plans import ir

    q = ir.BooleanQuery(
        (
            ir.BooleanClause(ir.Occur.SHOULD, ir.TermQuery("def")),
            ir.BooleanClause(ir.Occur.SHOULD, ir.TermQuery("class")),
        )
    )
    scores = tiny_oracle.matches(q)
    rows = [(d, float(s)) for d, s in scores.items()]
    scored = spark.createDataFrame(rows, "doc_id: long, score: double")
    keys = spark.createDataFrame(
        [(d, f"k{d % 4}") for d in range(tiny_oracle.doc_count)],
        "doc_id: long, key: string",
    )
    got = [
        (r.doc_id, r.key)
        for r in diversified_topk(scored, keys, 10, 2).collect()
    ]
    # brute force
    per_key: dict[str, list] = {}
    for d, s in sorted(scores.items(), key=lambda x: (-x[1], x[0])):
        per_key.setdefault(f"k{d % 4}", []).append((d, s))
    pool = []
    for kk, lst in per_key.items():
        pool.extend((d, s, kk) for d, s in lst[:2])
    pool.sort(key=lambda x: (-x[1], x[0]))
    want = [(d, kk) for d, _s, kk in pool[:10]]
    assert got == want
    # diversity constraint holds
    from collections import Counter

    assert max(Counter(k for _, k in got).values()) <= 2
