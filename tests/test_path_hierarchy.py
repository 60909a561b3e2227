"""PathHierarchyTokenizer / ReversePathHierarchyTokenizer vs every
golden in the reference test files (``TestPathHierarchyTokenizer.java``,
``TestReversePathHierarchyTokenizer.java``)."""

from __future__ import annotations

from lucene_solr_spark.functions.path_hierarchy import (
    path_hierarchy_tokens,
    reverse_path_hierarchy_tokens,
)


def test_forward_goldens():
    f = path_hierarchy_tokens
    assert f("/a/b/c") == ["/a", "/a/b", "/a/b/c"]
    assert f("/a/b/c/") == ["/a", "/a/b", "/a/b/c", "/a/b/c/"]
    assert f("a/b/c") == ["a", "a/b", "a/b/c"]
    assert f("a/b/c/") == ["a", "a/b", "a/b/c", "a/b/c/"]
    assert f("/") == ["/"]
    assert f("//") == ["/", "//"]
    assert f("/a/b/c", replacement="\\") == ["\\a", "\\a\\b", "\\a\\b\\c"]
    assert f("c:\\a\\b\\c", delimiter="\\") == [
        "c:", "c:\\a", "c:\\a\\b", "c:\\a\\b\\c",
    ]


def test_forward_skip_goldens():
    f = path_hierarchy_tokens
    assert f("/a/b/c", skip=1) == ["/b", "/b/c"]
    assert f("/a/b/c/", skip=1) == ["/b", "/b/c", "/b/c/"]
    assert f("a/b/c", skip=1) == ["/b", "/b/c"]
    assert f("a/b/c/", skip=1) == ["/b", "/b/c", "/b/c/"]
    assert f("/", skip=1) == []
    assert f("//", skip=1) == ["/"]


def test_reverse_goldens():
    r = reverse_path_hierarchy_tokens
    assert r("/a/b/c") == ["/a/b/c", "a/b/c", "b/c", "c"]
    assert r("/a/b/c/") == ["/a/b/c/", "a/b/c/", "b/c/", "c/"]
    assert r("a/b/c") == ["a/b/c", "b/c", "c"]
    assert r("a/b/c/") == ["a/b/c/", "b/c/", "c/"]
    assert r("/") == ["/"]
    assert r("//") == ["//", "/"]
    assert r("/a/b/c/", skip=1) == ["/a/b/", "a/b/", "b/"]
    assert r("a/b/c", skip=1) == ["a/b/", "b/"]
    assert r("a/b/c/", skip=1) == ["a/b/", "b/"]
    assert r("/", skip=1) == []
