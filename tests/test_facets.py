"""Range + taxonomy facet counts — facet/range and facet/taxonomy roles."""

from __future__ import annotations

from lucene_solr_spark.functions.facets import (
    FacetRange,
    range_facet_counts,
    taxonomy_counts,
)


def test_range_facets_overlap_and_bounds(spark):
    rows = [(0, 0.0), (1, 10.0), (2, 50.0), (3, 199.9), (4, 200.0), (5, None)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r["range"]: r["count"]
        for r in range_facet_counts(
            df,
            "v",
            [
                FacetRange("low", 0.0, 50.0),
                FacetRange("mid", 50.0, 200.0),
                FacetRange("all", 0.0, 200.0),  # overlaps both
                FacetRange("closed", 0.0, 50.0, max_inclusive=True),
                FacetRange("empty", 1e6, 2e6),
            ],
        ).collect()
    }
    # nulls never count; bounds follow the inclusive flags
    assert got == {"low": 2, "mid": 2, "all": 4, "closed": 3, "empty": 0}


def test_taxonomy_counts_ancestors(spark):
    rows = [
        ("en", "src1"),
        ("en", "src1"),
        ("en", "src2"),
        ("de", "src1"),
    ]
    df = spark.createDataFrame(rows, "lang string, source string")
    got = {
        r["path"]: (r["depth"], r["count"])
        for r in taxonomy_counts(df, components=["lang", "source"]).collect()
    }
    # every ancestor counted (TaxonomyFacetCounts: doc increments its
    # node and every ancestor)
    assert got == {
        "en": (1, 3),
        "de": (1, 1),
        "en/src1": (2, 2),
        "en/src2": (2, 1),
        "de/src1": (2, 1),
    }


def test_taxonomy_path_col_and_depth_cap(spark):
    df = spark.createDataFrame(
        [("a/b/c",), ("a/b",), ("a",), (None,)], "p string"
    )
    got = {
        r["path"]: r["count"]
        for r in taxonomy_counts(df, path_col="p", max_depth=2).collect()
    }
    assert got == {"a": 3, "a/b": 2}


def test_infix_suggest_ranks_prefix_first(spark):
    from lucene_solr_spark.functions.suggest import infix_suggest

    stats = spark.createDataFrame(
        [("artifact", 5), ("part", 50), ("chart", 7), ("artless", 9), ("zzz", 1)],
        "term string, df long",
    )
    got = [
        (r["term"], r["is_prefix"])
        for r in infix_suggest(stats, "art", k=4).collect()
    ]
    # prefix matches first (df desc within), then infix by df desc
    assert got == [
        ("artless", 1),
        ("artifact", 1),
        ("part", 0),
        ("chart", 0),
    ]


def test_drill_down_and_sideways(spark):
    """DrillDownQuery/DrillSideways semantics (facet/DrillDownQuery.java:
    45-118, DrillSideways.java:40-63): drill-down ANDs every dim's
    filter; sideways counts for a dim drop ONLY that dim's filter."""
    from lucene_solr_spark.functions.facets import drill_down, drill_sideways

    hits = spark.createDataFrame(
        [(i, 1.0) for i in range(8)], "doc_id long, score double"
    )
    docs = spark.createDataFrame(
        [
            (0, "en", "a"),
            (1, "en", "a"),
            (2, "en", "b"),
            (3, "fr", "a"),
            (4, "fr", "b"),
            (5, "de", "a"),
            (6, "en", "c"),
            (7, "zz", "zz"),  # matches no dim
            (99, "en", "a"),  # not a hit
        ],
        "doc_id long, lang string, source string",
    )
    dims = {"lang": "en", "source": ["a", "b"]}

    dd = sorted(r["doc_id"] for r in drill_down(hits, docs, dims).collect())
    assert dd == [0, 1, 2]  # en AND source∈{a,b}

    sw = drill_sideways(hits, docs, dims)
    # lang counts: source filter applied, lang filter NOT — fr stays visible
    langs = {r["value"]: r["count"] for r in sw["lang"].collect()}
    assert langs == {"en": 3, "fr": 2, "de": 1}
    # source counts: lang=en applied, source filter NOT — c stays visible
    sources = {r["value"]: r["count"] for r in sw["source"].collect()}
    assert sources == {"a": 2, "b": 1, "c": 1}
