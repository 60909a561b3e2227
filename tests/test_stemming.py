"""Porter stemmer + EnglishAnalyzer-chain tests.

- Porter goldens: the published algorithm's worked examples;
- possessive filter goldens (en/EnglishPossessiveFilter.java semantics);
- analyzer-chain parity: batch tokenizer ≡ oracle analyze under the
  English config (possessive → lowercase → stop → porter);
- end-to-end rank identity: Spark index built with the English chain vs
  the single-node oracle with the same chain.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.oracle.porter import porter_stem, strip_possessive
from lucene_solr_spark.oracle.tokenizer import ENGLISH_STOP_WORDS, analyze

PORTER_GOLDENS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "hesitanci": "hesit", "digitizer": "digit", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "roll": "roll", "apologies": "apolog",
    "generalizations": "gener", "oscillators": "oscil",
    "controlling": "control", "controller": "control",
    # departures shipped in the author's C release (and Snowball porter)
    "apologi": "apolog",  # logi -> log (measure > 0)
    "possibli": "possibl",  # bli -> ble then 5a drops e? no: possibli->possib+le->5a
}


def test_porter_goldens():
    bad = {
        w: (porter_stem(w), e)
        for w, e in PORTER_GOLDENS.items()
        if w != "possibli" and porter_stem(w) != e
    }
    assert not bad, bad


def test_porter_bli_departure():
    # paper: abli->able only; departure: any bli->ble when m(stem)>0
    assert porter_stem("possibli") == porter_stem("possible") == "possibl"
    assert porter_stem("reversibli") == porter_stem("reversible") == "revers"
    # m("ta") == 0 blocks the rule: "tabli" stays untouched
    assert porter_stem("tabli") == "tabli"


def test_possessive_goldens():
    assert strip_possessive("dog's") == "dog"
    assert strip_possessive("dog’s") == "dog"
    assert strip_possessive("dogs'") == "dogs'"  # plural possessive kept
    assert strip_possessive("DOG'S") == "DOG"
    assert strip_possessive("s") == "s"
    assert strip_possessive("'s") == ""


def test_analyze_english_chain_order():
    # "that's" -> possessive strip "that" -> stopword -> dropped (pos gap)
    toks = analyze(
        "that's tables stemming",
        stopwords=ENGLISH_STOP_WORDS,
        strip_possessive=True,
        stemmer="porter",
    )
    assert [(t.term, t.pos) for t in toks] == [("tabl", 1), ("stem", 2)]


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(max_codepoint=0x2FF),
            max_size=50,
        ),
        max_size=6,
    )
)
def test_batch_parity_english_chain(texts):
    from lucene_solr_spark.functions.fast_tokenizer import batch_tokenize

    doc, terms, pos = batch_tokenize(
        texts,
        stopwords=ENGLISH_STOP_WORDS,
        strip_possessive=True,
        stemmer="porter",
    )
    got: dict[int, list] = {}
    for d, t, p in zip(doc.tolist(), terms.to_pylist(), pos.tolist()):
        got.setdefault(d, []).append((t, p))
    for i, txt in enumerate(texts):
        exp = [
            (t.term, t.pos)
            for t in analyze(
                txt,
                stopwords=ENGLISH_STOP_WORDS,
                strip_possessive=True,
                stemmer="porter",
            )
        ]
        assert got.get(i, []) == exp, (i, txt)


def bits(x) -> int:
    return struct.unpack("<I", struct.pack("<f", float(x)))[0]


@pytest.mark.parametrize("term", ["tabl", "scan", "merg"])
def test_stemmed_index_rank_identity(spark, term):
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.oracle.engine import OracleIndex
    from lucene_solr_spark.plans import ir
    from lucene_solr_spark.plans.df_executor import DFExecutor
    from lucene_solr_spark.sources.corpus import corpus_to_spark, make_corpus_rows

    rows = make_corpus_rows(80, seed=21)
    corpus = corpus_to_spark(spark, 80, seed=21, num_partitions=4)
    cfg = dict(
        stopwords=ENGLISH_STOP_WORDS, strip_possessive=True, stemmer="porter"
    )
    ix = build_index(corpus, **cfg).persist()
    oracle = OracleIndex(
        ((i, r["content"]) for i, r in enumerate(rows)), **cfg
    )
    ex = DFExecutor(ix, mode="float32")
    q = ir.TermQuery(term)
    expected = [(sd.doc_id, bits(sd.score)) for sd in oracle.search(q, k=10)]
    got = [
        (r["doc_id"], bits(r["score"])) for r in ex.topk(q, k=10).collect()
    ]
    assert got == expected


def test_porter_vs_snowball_vocabulary():
    """Full-vocabulary evidence for the Porter stemmer: the reference
    ships the Snowball project's 2,000-word 'porter' vocabulary
    (analysis/snowball/porter.zip). That vocabulary encodes the
    1980-faithful algorithm, while Lucene's en/PorterStemmer.java (our
    parity target) carries Martin Porter's documented DEPARTURES
    (step3 bli→ble at PorterStemmer.java:307, logi→log at :375). The
    oracle must match the vocabulary on every word EXCEPT those whose
    stems the departures change — and each residual diff must be
    explained by a departure rule firing."""
    import zipfile

    from lucene_solr_spark.oracle.porter import porter_stem

    ref = (
        "/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis/snowball/porter.zip"
    )
    with zipfile.ZipFile(ref) as z:
        voc = z.read("voc.txt").decode("utf-8").split()
        out = z.read("output.txt").decode("utf-8").split()
    assert len(voc) == len(out) == 2000
    diffs = {w: (porter_stem(w), o) for w, o in zip(voc, out) if porter_stem(w) != o}
    # the known divergence-affected words in this vocabulary: two from
    # the departure rules, two from Lucene's length guard (stem() skips
    # words of length <= 2 — PorterStemmer.java:544 `if (k > k0 + 1)`)
    assert set(diffs) == {"visibly", "rs", "uy", "palynology"}, diffs
    assert diffs["rs"] == ("rs", "r") and diffs["uy"] == ("uy", "ui")
    # bli→ble then e-deletion: visibli → visible → visibl
    assert diffs["visibly"] == ("visibl", "visibli")
    # logi→log: palynologi → palynolog
    assert diffs["palynology"] == ("palynolog", "palynologi")


def test_porter_vs_lucene_vocabulary():
    """THE definitive Porter parity evidence: the reference's own
    23,531-word Porter test vocabulary (en/porterTestData.zip, used by
    Lucene's TestPorterStemFilter.testVocabulary) — every word
    bit-exact, departures and length guard included."""
    import zipfile

    from lucene_solr_spark.oracle.porter import porter_stem

    ref = (
        "/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis/en/porterTestData.zip"
    )
    with zipfile.ZipFile(ref) as z:
        voc = z.read("voc.txt").decode("utf-8").split()
        out = z.read("output.txt").decode("utf-8").split()
    assert len(voc) == len(out) == 23531
    bad = [(w, porter_stem(w), o) for w, o in zip(voc, out) if porter_stem(w) != o]
    assert not bad, bad[:10]
