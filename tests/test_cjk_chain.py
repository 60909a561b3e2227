"""Full CJKAnalyzer chain parity (cjk/CJKAnalyzer.java:95-103):

    StandardTokenizer → CJKWidthFilter → LowerCaseFilter →
    CJKBigramFilter → StopFilter(cjk/stopwords.txt)

Pinned against the reference's OWN test goldens
(TestCJKAnalyzer.java, TestCJKBigramFilter.java incl. the
unigram+bigram stacked mode, TestCJKWidthFilter.java incl. voiced-mark
composition), plus scalar-vs-batch kernel parity fuzz over random
mixed-script text.

Disclosed divergences (oracle/cjk.py module docstring): width fold is
applied pre-tokenize so offsets index the FOLDED text; CJK Extension B
(≥ U+20000) is outside the tokenizer's ideograph class, so
TestCJKAnalyzer.testSurrogates' ext-B codepoint is not bigrammed here.
"""

from __future__ import annotations

import random

from lucene_solr_spark.functions.fast_tokenizer import batch_tokenize
from lucene_solr_spark.functions.highlight import analyze_with_offsets
from lucene_solr_spark.oracle.cjk import (
    ALL_CJK,
    CJK_STOP_WORDS,
    HAN,
    cjk_bigram_stream,
    width_fold,
)
from lucene_solr_spark.oracle.light_stemmers import analyzer_config
from lucene_solr_spark.oracle.tokenizer import analyze

CJK = analyzer_config("cjk")


def _terms(text, **cfg):
    return [t.term for t in analyze(text, **cfg)]


def _toks(text, **cfg):
    return [(t.term, t.pos) for t in analyze(text, **cfg)]


# --- CJKWidthFilter goldens (TestCJKWidthFilter.java) -----------------


def test_width_fold_fullwidth_ascii():
    # TestCJKWidthFilter.testFullWidthASCII: "Ｔｅｓｔ １２３４"
    assert width_fold("Ｔｅｓｔ １２３４") == "Test 1234"


def test_width_fold_halfwidth_kana():
    # TestCJKWidthFilter.testNonStoppingDecomposition + voiced marks
    assert width_fold("ｶﾀｶﾅ") == "カタカナ"
    assert width_fold("ｳﾞｨｯﾂ") == "ヴィッツ"
    assert width_fold("ﾊﾟﾅｿﾆｯｸ") == "パナソニック"


def test_width_fold_dangling_mark():
    # a mark with no composable predecessor falls back to the
    # combining codepoints 0x3099/0x309A (CJKWidthFilter.KANA_NORM tail)
    assert width_fold("ﾞ") == "゙"
    assert width_fold("aﾞ") == "a゙"


# --- CJKAnalyzer goldens (TestCJKAnalyzer.java) -----------------------


def test_ja1_all_bigrams():
    # testJa1
    assert _terms("一二三四五六七八九十", **CJK) == [
        "一二", "二三", "三四", "四五", "五六", "六七", "七八", "八九", "九十",
    ]


def test_ja2_space_breaks_runs():
    # testJa2: whitespace flushes the buffer; lone chars emit unigrams
    assert _terms("一 二三四 五六七八九 十", **CJK) == [
        "一", "二三", "三四", "五六", "六七", "七八", "八九", "十",
    ]


def test_english_passthrough():
    # testC
    assert _terms("abc defgh ijklmn opqrstu vwxy z", **CJK) == [
        "abc", "defgh", "ijklmn", "opqrstu", "vwxy", "z",
    ]


def test_mix():
    # testMix: latin run flushes the CJK buffer
    assert _terms("あいうえおabcかきくけこ", **CJK) == [
        "あい", "いう", "うえ", "えお", "abc", "かき", "きく", "くけ", "けこ",
    ]


def test_mix2():
    # testMix2: ん between latin runs emits a unigram
    assert _terms("あいうえおabんcかきくけ こ", **CJK) == [
        "あい", "いう", "うえ", "えお", "ab", "ん", "c", "かき", "きく", "くけ", "こ",
    ]


def test_final_offset_goldens():
    # testFinalOffset
    assert _terms("あい", **CJK) == ["あい"]
    assert _terms("あい   ", **CJK) == ["あい"]
    assert _terms("test", **CJK) == ["test"]
    assert _terms("あいtest", **CJK) == ["あい", "test"]
    assert _terms("testあい    ", **CJK) == ["test", "あい"]


def test_non_ideographic():
    # testNonIdeographic: Arabic passes through untouched
    assert _terms("一 روبرت موير", **CJK) == ["一", "روبرت", "موير"]


def test_single_char_and_pair():
    # testSingleChar / testTokenStream
    assert _terms("一", **CJK) == ["一"]
    assert _terms("一丁丂", **CJK) == ["一丁", "丁丂"]


def test_stop_gap_positions():
    got = _toks("一二 the 三四", **CJK)
    # emitted stream: 一二(0) the(1) 三四(2); "the" stops out, gap stays
    assert got == [("一二", 0), ("三四", 2)]


# --- CJKBigramFilter goldens (TestCJKBigramFilter.java) ---------------


def test_huge_single_run():
    # testHuge: 11 repetitions, one contiguous run, bigrams span repeats
    text = "多くの学生が試験に落ちた" * 11
    out = _terms(text, **CJK)
    one = ["多く", "くの", "の学", "学生", "生が", "が試", "試験", "験に", "に落", "落ち", "ちた"]
    expect = []
    for i in range(11):
        expect.extend(one)
        if i < 10:
            expect.append("た多")
    assert out == expect


def test_han_only_flags():
    # testHanOnly: hiragana passes through; Han pairs bigram
    raw = [
        (t, s, e)
        for t, _p, s, e in analyze_with_offsets(
            width_fold("多くの学生が試験に落ちた。"), lowercase=True
        )
    ]
    got = [t for t, _p, _s, _e in cjk_bigram_stream(raw, flags=HAN)]
    assert got == ["多", "く", "の", "学生", "が", "試験", "に", "落", "ち", "た"]


def test_unigrams_and_bigrams_all_scripts():
    # testUnigramsAndBigramsAllScripts: bigrams stack at posInc 0
    got = _toks("多くの学生が試験に落ちた。", cjk_bigrams=True, cjk_unigrams=True)
    terms = [t for t, _ in got]
    pos = [p for _, p in got]
    assert terms == [
        "多", "多く", "く", "くの", "の", "の学", "学", "学生", "生", "生が",
        "が", "が試", "試", "試験", "験", "験に", "に", "に落", "落", "落ち",
        "ち", "ちた", "た",
    ]
    # posInc pattern 1,0,1,0,…: unigram i at pos i, bigram stacked
    assert pos == [
        0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11
    ]


def test_unigrams_and_bigrams_han_only():
    # testUnigramsAndBigramsHanOnly via the stream kernel
    raw = [
        (t, s, e)
        for t, _p, s, e in analyze_with_offsets(
            width_fold("多くの学生が試験に落ちた。"), lowercase=True
        )
    ]
    got = [
        t for t, _p, _s, _e in cjk_bigram_stream(
            raw, flags=HAN, output_unigrams=True
        )
    ]
    assert got == [
        "多", "く", "の", "学", "学生", "生", "が", "試", "試験", "験",
        "に", "落", "ち", "た",
    ]


def test_width_fold_then_bigram_chain():
    # halfwidth katakana folds, then bigrams
    assert _terms("ｶﾀｶﾅ", **CJK) == ["カタ", "タカ", "カナ"]
    assert _terms("ＡＢＣ", **CJK) == ["abc"]


# --- batch kernel parity ----------------------------------------------


def _rand_text(rng: random.Random) -> str:
    pools = [
        lambda: chr(rng.randrange(0x4E00, 0x4E80)),      # Han
        lambda: chr(rng.randrange(0x3041, 0x3097)),      # Hiragana
        lambda: chr(rng.randrange(0x30A1, 0x30FB)),      # Katakana
        lambda: chr(rng.randrange(0xAC00, 0xAD00)),      # Hangul
        lambda: chr(rng.randrange(0xFF01, 0xFF5F)),      # fullwidth ASCII
        lambda: chr(rng.randrange(0xFF66, 0xFFA0)),      # halfwidth kana
        lambda: rng.choice("abcdefgh"),
        lambda: rng.choice(" 。、 ..  "),
        lambda: rng.choice(["the", "www", "into", "test"]),
    ]
    return "".join(rng.choice(pools)() for _ in range(rng.randrange(0, 60)))


def test_batch_kernel_parity_fuzz():
    rng = random.Random(0xC1C)
    for unib in (False, True):
        docs = [_rand_text(rng) for _ in range(120)] + [
            "", None, "一", "多くの学生が試験に落ちた。",
            "ﾃｽﾄ ｶﾞｷﾞｸﾞ ＡＢＣ hello the www",
        ]
        tdoc, terms, pos = batch_tokenize(
            docs,
            cjk_bigrams=True,
            cjk_unigrams=unib,
            stopwords=CJK_STOP_WORDS,
        )
        got: dict[int, list] = {}
        for d, t, p in zip(tdoc.tolist(), terms.to_pylist(), pos.tolist()):
            got.setdefault(d, []).append((t, p))
        for i, doc in enumerate(docs):
            exp = _toks(
                doc or "",
                cjk_bigrams=True,
                cjk_unigrams=unib,
                stopwords=CJK_STOP_WORDS,
            )
            assert got.get(i, []) == exp, f"doc {i}: {doc!r}"


def test_batch_offsets_parity():
    rng = random.Random(7)
    docs = [_rand_text(rng) for _ in range(60)]
    tdoc, terms, pos, soff, eoff = batch_tokenize(
        docs, cjk_bigrams=True, stopwords=CJK_STOP_WORDS, with_offsets=True
    )
    got: dict[int, list] = {}
    for d, t, p, s, e in zip(
        tdoc.tolist(), terms.to_pylist(), pos.tolist(),
        soff.tolist(), eoff.tolist(),
    ):
        got.setdefault(d, []).append((t, p, s, e))
    for i, doc in enumerate(docs):
        exp = analyze_with_offsets(
            doc, stopwords=CJK_STOP_WORDS, cjk_bigrams=True
        )
        assert got.get(i, []) == exp, f"doc {i}: {doc!r}"
        # spans index the FOLDED text (disclosed divergence)
        folded = width_fold(doc)
        for t, _p, s, e in exp:
            if all(0x3000 <= ord(c) <= 0xD7AF for c in t):
                assert folded[s:e] == t


def test_all_cjk_flag_covers_four_scripts():
    assert ALL_CJK == 0xF
