"""Sloppy-phrase tests: kernel unit semantics (SloppyPhraseMatcher
examples from the reference Javadoc) + engine-vs-oracle rank identity."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lucene_solr_spark.oracle.engine import OracleIndex
from lucene_solr_spark.oracle.sloppy import sloppy_phrase_freq
from lucene_solr_spark.plans import ir


def bits(x) -> int:
    return struct.unpack("<I", struct.pack("<f", float(x)))[0]


def _freq(doc_tokens: list[str], phrase: list[str], slop: int) -> float:
    pos_lists = [
        np.asarray([i for i, t in enumerate(doc_tokens) if t == term], np.int64)
        for term in phrase
    ]
    if any(len(p) == 0 for p in pos_lists):
        return 0.0
    return sloppy_phrase_freq(pos_lists, list(range(len(phrase))), slop)


def test_javadoc_example_two_matches():
    """SloppyPhraseMatcher.java:42-44: for "a b"~2, doc "x a b a y" matches
    twice — "a b" at distance 0 and "b a" at distance 2."""
    f = _freq(["x", "a", "b", "a", "y"], ["a", "b"], 2)
    expect = float(np.float32(np.float32(1.0) + np.float32(1.0 / 3.0)))
    assert f == expect


def test_exact_match_only_at_slop0():
    assert _freq(["a", "b"], ["a", "b"], 0) == 1.0
    assert _freq(["b", "a"], ["a", "b"], 0) == 0.0
    assert _freq(["a", "x", "b"], ["a", "b"], 0) == 0.0


def test_one_gap_needs_slop1():
    assert _freq(["a", "x", "b"], ["a", "b"], 1) == 0.5  # 1/(1+1)
    assert _freq(["a", "x", "x", "b"], ["a", "b"], 1) == 0.0
    assert _freq(["a", "x", "x", "b"], ["a", "b"], 2) == pytest.approx(1 / 3)


def test_reversed_within_slop():
    # "b a": b at 0, a at 1 → adjusted positions a:1, b:-1 → distance 2
    assert _freq(["b", "a"], ["a", "b"], 2) == pytest.approx(1 / 3)
    assert _freq(["b", "a"], ["a", "b"], 1) == 0.0


def test_three_term_window():
    assert _freq(["a", "b", "c"], ["a", "b", "c"], 0) == 1.0
    assert _freq(["a", "x", "b", "c"], ["a", "b", "c"], 1) == 0.5
    assert _freq(["c", "b", "a"], ["a", "b", "c"], 4) > 0.0


def test_duplicate_offsets_rejected():
    with pytest.raises(ValueError):
        sloppy_phrase_freq([np.array([0]), np.array([1])], [0, 0], 2)


# ------------------------------------------------------- engine vs oracle
SLOPPY_QUERIES = {
    "sloppy1": ir.PhraseQuery(("def", "foo"), slop=1),
    "sloppy2": ir.PhraseQuery(("import", "return"), slop=3),
    "sloppy3": ir.PhraseQuery(("x", "y"), slop=2),
}


@pytest.fixture(scope="module")
def sloppy_setup(spark, tiny_oracle):
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.operators.segments import build_segments
    from lucene_solr_spark.operators.topk import SegmentSearcher
    from lucene_solr_spark.plans.df_executor import DFExecutor
    from lucene_solr_spark.sources.corpus import corpus_to_spark

    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=4)
    ix = build_index(corpus).persist()
    import tempfile

    base = tempfile.mkdtemp(prefix="sloppyix")
    from lucene_solr_spark.operators.segments import SegmentIndex

    build_segments(ix, base, segment_size=16)
    return (
        DFExecutor(ix, mode="float32"),
        SegmentSearcher(spark, SegmentIndex.open(base), mode="float32"),
    )


@pytest.mark.parametrize("name", sorted(SLOPPY_QUERIES))
def test_sloppy_rank_identity_df(name, sloppy_setup, tiny_oracle):
    q = SLOPPY_QUERIES[name]
    dfe, _ = sloppy_setup
    expected = [(sd.doc_id, bits(sd.score)) for sd in tiny_oracle.search(q, k=10)]
    got = [
        (r["doc_id"], bits(r["score"])) for r in dfe.topk(q, k=10).collect()
    ]
    assert got == expected, name


@pytest.mark.parametrize("name", sorted(SLOPPY_QUERIES))
def test_sloppy_rank_identity_kernel(name, sloppy_setup, tiny_oracle):
    q = SLOPPY_QUERIES[name]
    _, searcher = sloppy_setup
    expected = [(sd.doc_id, bits(sd.score)) for sd in tiny_oracle.search(q, k=10)]
    got = [
        (r["doc_id"], bits(r["score"]))
        for r in searcher.topk(q, k=10).collect()
    ]
    assert got == expected, name


# ------------------------------------------------- repeated terms (round 4)
def _freq_rpt(doc_tokens, phrase, slop):
    pos_lists = [
        np.asarray([i for i, t in enumerate(doc_tokens) if t == term], np.int64)
        for term in phrase
    ]
    if any(len(p) == 0 for p in pos_lists):
        return 0.0
    return sloppy_phrase_freq(
        pos_lists, list(range(len(phrase))), slop, terms=list(phrase)
    )


def test_repeat_exact_alignment():
    """"a b a"~2 over doc "a b a": one exact match (rptGroups assigns the
    two a-pps to distinct occurrences 0 and 2)."""
    assert _freq_rpt(["a", "b", "a"], ["a", "b", "a"], 2) == 1.0


def test_repeat_needs_two_occurrences():
    """"a a"~N cannot match a doc with a single `a` (advanceRepeatGroups
    exhausts — SloppyPhraseMatcher.java:455-463)."""
    assert _freq_rpt(["a", "x"], ["a", "a"], 4) == 0.0
    assert _freq_rpt(["a", "a"], ["a", "a"], 0) == 1.0


def test_repeat_injective_positions():
    """The two a-pps may never sit on the same document position: "a b a"~0
    over "a b" has only one `a`, no match; over "a b a" exact."""
    assert _freq_rpt(["a", "b"], ["a", "b", "a"], 4) == 0.0


def test_repeat_matches_exists_semantics():
    """Property (4k random docs): the greedy rptGroups matcher accepts a
    doc IFF an injective slop-valid assignment of positions exists — the
    contract the sloppy_repeat_matches SQL oracle states directly."""
    import itertools
    import random

    from lucene_solr_spark.oracle.sloppy import sloppy_phrase_match_lengths

    rng = random.Random(7)

    def brute_exists(pos_lists, offsets, slop, terms):
        n = len(offsets)
        for combo in itertools.product(*[list(map(int, pl)) for pl in pos_lists]):
            ok = True
            for i in range(n):
                for j in range(i + 1, n):
                    if terms[i] == terms[j] and combo[i] == combo[j]:
                        ok = False
            if not ok:
                continue
            adj = [combo[i] - offsets[i] for i in range(n)]
            if max(adj) - min(adj) <= slop:
                return True
        return False

    checked = 0
    for _ in range(4000):
        nterms = rng.randint(2, 4)
        vocab = ["a", "b", "c"]
        qterms = [rng.choice(vocab[: rng.randint(1, 3)]) for _ in range(nterms)]
        doc = [rng.choice(vocab) for _ in range(rng.randint(1, 10))]
        slop = rng.randint(0, 4)
        pls = [
            np.asarray([i for i, w in enumerate(doc) if w == t], np.int64)
            for t in qterms
        ]
        if any(len(p) == 0 for p in pls):
            continue
        offsets = list(range(nterms))
        got = bool(sloppy_phrase_match_lengths(pls, offsets, slop, terms=qterms))
        assert got == brute_exists(pls, offsets, slop, qterms), (qterms, doc, slop)
        checked += 1
    assert checked > 1500


def test_repeat_engine_rank_identity(spark, tiny_corpus_rows, tiny_oracle):
    """Repeated-term sloppy phrase through the DataFrame executor (float32)
    == the single-node oracle, bit-for-bit (both run the same kernel, but
    the executor path goes postings-join → pandas UDF)."""
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans.df_executor import DFExecutor

    corpus = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(tiny_corpus_rows)],
        "doc_id long, content string",
    )
    ix = build_index(corpus, text_col="content", doc_id_col="doc_id").persist()
    ex = DFExecutor(ix, mode="float32")
    # pick a term pair that actually repeats within slop somewhere
    q = ir.PhraseQuery(("the", "a", "the"), slop=4)
    got = {r["doc_id"]: bits(r["score"]) for r in ex.matches(q).collect()}
    want = {d: bits(s) for d, s in tiny_oracle.matches(q).items()}
    assert got == want


# ------------------------------------- multi-term repeats (round 5, MTP)
# hasMultiTermRpts: a repeating term sits in a multi-term slot
# (SloppyPhraseMatcher.java:616). Repetition groups become the connected
# components of the pp↔repeating-term graph (:562-585) and collisions are
# resolved iteratively at doc start (:436-454) and after each advance
# (:286-323 via collide :334-344).


def _mtp_lengths(doc_tokens, slots, offsets, slop):
    from lucene_solr_spark.oracle.sloppy import sloppy_phrase_match_lengths

    pls = [
        np.asarray(
            [i for i, t in enumerate(doc_tokens) if t in s], np.int64
        )
        for s in slots
    ]
    if any(len(p) == 0 for p in pls):
        return []
    return sloppy_phrase_match_lengths(pls, offsets, slop, terms=list(slots))


def test_mtp_basic_collision():
    """"(a|b) b"~1 over "b a": slot0 unions {a,b} = positions [0,1], slot1
    = [0]. Doc-start placement collides (both land on raw position 0+off);
    the higher-offset pp re-advances — exhausted ⇒ no match. Over "b x b"
    the re-advance finds position 2 and the phrase matches."""
    s0, s1 = frozenset({"a", "b"}), frozenset({"b"})
    # "b a": slot1's only b collides with slot0 at raw position 0; the
    # re-advance exhausts ⇒ no match even though (a@1, b@0) would be an
    # assignment — the greedy machine (and the reference) rejects it
    assert _mtp_lengths(["b", "a"], [s0, s1], [0, 1], 1) == []
    assert _mtp_lengths(["b"], [s0, s1], [0, 1], 4) == []
    assert _mtp_lengths(["b", "x", "b"], [s0, s1], [0, 1], 1) == [1]


def test_mtp_single_term_repeat_joins_union_path():
    """Once ANY repeating pp is multi-term, ALL repeat groups take the
    union machinery (:610-622 sets hasMultiTermRpts globally). "(a|b) b"
    still matches plain docs identically to the 2-distinct-term case when
    no collision arises."""
    s0, s1 = frozenset({"a", "b"}), frozenset({"b"})
    # "a b": no shared position, behaves like an ordinary 2-term phrase
    assert _mtp_lengths(["a", "b"], [s0, s1], [0, 1], 0) == [0]


def test_mtp_greedy_replay_fuzz():
    """The kernel's MTP path == an independent scalar replay of the 2-slot
    transition system (pop lesser adjusted pp; advance; collision ⇒ the
    higher-offset pp re-advances) — the exact machine the
    sloppy_multi_repeat_matches SQL oracle transcribes. 50k random docs,
    zero divergence (full-scale run recorded round 5; scaled here)."""
    import bisect
    import random

    def succ(lst, v):
        i = bisect.bisect_right(lst, v)
        return lst[i] if i < len(lst) else None

    def replay(A, B, slop):
        x, y = A[0], B[0] - 1
        if x == y + 1:
            b = succ(B, y + 1)
            if b is None:
                return []
            y = b - 1
        end = max(x, y)
        matches = []
        lab = "x" if x <= y else "y"
        ml = end - (x if lab == "x" else y)
        nxt = y if lab == "x" else x
        while True:
            if lab == "x":
                a = succ(A, x)
                if a is None:
                    if ml <= slop:
                        matches.append(ml)
                    return matches
                x = a
                end = max(end, x)
            else:
                b = succ(B, y + 1)
                if b is None:
                    if ml <= slop:
                        matches.append(ml)
                    return matches
                y = b - 1
                end = max(end, y)
            if x == y + 1:  # collide: advance the higher-offset pp again
                b = succ(B, y + 1)
                if b is None:
                    if ml <= slop:
                        matches.append(ml)
                    return matches
                y = b - 1
                end = max(end, y)
            pos = x if lab == "x" else y
            if pos > nxt:
                if ml <= slop:
                    matches.append(ml)
                lab = "x" if x <= y else "y"
                ml = end - (x if lab == "x" else y)
                nxt = y if lab == "x" else x
            else:
                ml = min(ml, end - pos)

    rng = random.Random(7)
    s0, s1 = frozenset({"m", "s"}), frozenset({"s"})
    checked = 0
    for _ in range(8000):
        toks = [rng.choice("msabc") for _ in range(rng.randint(1, 12))]
        A = [i for i, t in enumerate(toks) if t in ("m", "s")]
        B = [i for i, t in enumerate(toks) if t == "s"]
        if not A or not B:
            continue
        slop = rng.randint(0, 5)
        want = _mtp_lengths(toks, [s0, s1], [0, 1], slop)
        assert want == replay(A, B, slop), (toks, slop)
        checked += 1
    assert checked > 4000


def test_mtp_soundness_3slot():
    """Greedy-accept ⇒ an injective slop-valid assignment exists
    (soundness; 3-slot shapes with a shared term across slots 0/1). The
    converse does NOT hold — the greedy machine is reference-faithfully
    incomplete (~5% of assignment-feasible docs rejected), which is WHY
    the SQL oracle replays the machine instead of stating ∃-semantics."""
    import random

    rng = random.Random(11)
    slots = [frozenset({"m", "s"}), frozenset({"s"}), frozenset({"h", "j"})]
    offs = [0, 1, 2]
    checked = unsound = incomplete = 0
    for _ in range(6000):
        toks = [rng.choice("mshjab") for _ in range(rng.randint(2, 10))]
        lists = [[i for i, t in enumerate(toks) if t in s] for s in slots]
        if any(not x for x in lists):
            continue
        slop = rng.randint(0, 4)
        accept = bool(_mtp_lengths(toks, slots, offs, slop))
        exists = any(
            p0 != p1 and max(p0, p1 - 1, p2 - 2) - min(p0, p1 - 1, p2 - 2) <= slop
            for p0 in lists[0]
            for p1 in lists[1]
            for p2 in lists[2]
        )
        if accept and not exists:
            unsound += 1
        if exists and not accept:
            incomplete += 1
        checked += 1
    assert checked > 1500
    assert unsound == 0
    assert incomplete > 0  # greedy (matches the reference), not ∃-relaxed


def test_sloppy2_lockstep_kernel_bit_exact_fuzz():
    """The vectorized 2-distinct-term lockstep kernel
    (operators.topk._sloppy2_freqs_batch — the wikimedium SloppyPhrase
    hot path, ~7x the scalar machine on the bench mix) == the full
    greedy machine, float64-bit-exact, over random docs, random
    increasing offsets, random slop."""
    import random

    from lucene_solr_spark.operators.topk import _sloppy2_freqs_batch
    from lucene_solr_spark.oracle.sloppy import sloppy_phrase_freq

    rng = random.Random(13)
    checked = 0
    for _ in range(800):
        ncand = rng.randint(1, 12)
        offs = sorted(rng.sample(range(0, 4), 2))
        if offs[0] == offs[1]:
            continue
        slop = rng.randint(1, 5)
        A_lists, B_lists = [], []
        for _ in range(ncand):
            toks = [rng.choice("abx") for _ in range(rng.randint(1, 14))]
            A = [i for i, t in enumerate(toks) if t == "a"] or [rng.randint(0, 20)]
            B = [i for i, t in enumerate(toks) if t == "b"] or [rng.randint(0, 20)]
            while set(A) & set(B):
                B = [p + 1 for p in B]
            A_lists.append(sorted(A))
            B_lists.append(sorted(set(B)))
        flatA = np.concatenate([np.asarray(l, np.int64) for l in A_lists])
        cntA = np.asarray([len(l) for l in A_lists], np.int64)
        flatB = np.concatenate([np.asarray(l, np.int64) for l in B_lists])
        cntB = np.asarray([len(l) for l in B_lists], np.int64)
        got = _sloppy2_freqs_batch(
            (flatA, cntA), (flatB, cntB), tuple(offs), slop
        )
        for ci in range(ncand):
            want = sloppy_phrase_freq(
                [np.asarray(A_lists[ci], np.int64), np.asarray(B_lists[ci], np.int64)],
                list(offs),
                slop,
                terms=["a", "b"],
            )
            assert bits(np.float32(got[ci])) == bits(np.float32(want)), (
                A_lists[ci], B_lists[ci], offs, slop,
            )
            assert got[ci] == want  # float64 exact, not just f32
            checked += 1
    assert checked > 3000
