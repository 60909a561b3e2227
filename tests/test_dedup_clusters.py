"""Connected-components clustering + keep-one-per-cluster survivors.

Invariants: cluster label = min reachable node through the pair graph
(chains propagate transitively, disjoint cliques stay separate, nodes
with no pairs never appear in the cluster output but always survive);
lineage is truncated per iteration so deep graphs cannot blow up the
driver plan.
"""

from __future__ import annotations

import pytest

from lucene_solr_spark.functions.dedup import connected_components, dedup_survivors


def clusters_of(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    rows = connected_components(df, src_col="a", dst_col="b").collect()
    return {r["doc_id"]: r["cluster_id"] for r in rows}


def test_chain_propagates_transitively(spark):
    # 1-2, 2-3, 3-4: one component labeled by its min node, needing
    # more than one propagation round (diameter 3)
    got = clusters_of(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_cliques_stay_separate(spark):
    got = clusters_of(spark, [(10, 11), (11, 12), (10, 12), (20, 21)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_deep_chain_lineage_truncation(spark):
    # 40-node chain: without per-round localCheckpoint the logical plan
    # grows exponentially and the driver OOMs on plan stringification
    n = 40
    got = clusters_of(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0} and len(got) == n + 1


def test_survivors_keep_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),  # exact dup of 1
            (3, "alpha beta gamma delta epsilon"),  # near-dup of 1/2 (j=0.8)
            (4, "completely different tokens here entirely"),
        ],
        "doc_id long, text string",
    )
    surv = sorted(
        r["doc_id"]
        for r in dedup_survivors(docs, threshold=0.8, num_hashes=64, bands=32).collect()
    )
    assert surv == [1, 4]


def test_simhash_near_duplicates_banded_equals_bruteforce(spark):
    """Pigeonhole banding has recall 1: the banded bucket-join result
    must EQUAL the all-pairs Hamming filter, not approximate it."""
    from lucene_solr_spark.functions.dedup import simhash, simhash_near_duplicates

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(i, base + f" tail{i % 4}") for i in range(24)]
    rows += [(100 + i, f"completely unrelated corpus line number {i} with distinct tokens{i}") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    k = 6
    got = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_duplicates(docs, max_hamming=k).collect()
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ids = sorted(sigs)
    want = sorted(
        (a, b, bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= k
    )
    assert got == want and len(want) > 0
