"""ICU folding/normalization subset vs the reference's
TestICUFoldingFilter / TestICUNormalizer2Filter goldens."""

from __future__ import annotations

import pytest

from lucene_solr_spark.oracle.icu_fold import icu_fold, icu_normalize

# TestICUFoldingFilter.java:51-86 (token-level; the whitespace
# tokenization around them is the Mock tokenizer's)
FOLD_GOLDENS = {
    "This": "this",
    "Ruß": "russ",
    "ΜΆΪΟΣ": "μαιοσ",
    "Μάϊος": "μαιοσ",
    "𐐖": "𐐾",
    "ﴳﴺﰧ": "طمطمطم",
    "क्‍ष": "कष",
    "résumé": "resume",
    "résumé": "resume",
    "৭০৬": "706",
    "đis": "dis",
    "cræzy": "craezy",
    "ELİF": "elif",
    "eli̇f": "elif",
}


def test_folding_goldens():
    assert {w: icu_fold(w) for w in FOLD_GOLDENS} == FOLD_GOLDENS


def test_normalizer_nfkc_cf():
    # TestICUNormalizer2Filter: nfkc_cf = NFKC + case folding
    assert icu_normalize("This") == "this"
    assert icu_normalize("ｆｕｌｌｗｉｄｔｈ") == "fullwidth"
    assert icu_normalize("Ruß") == "russ"
    assert icu_normalize("ﬄuﬃest") == "ffluffiest"
    # normalization without accent removal
    assert icu_normalize("résumé") == "résumé"


def test_chain_integration(spark):
    from lucene_solr_spark.functions.analysis import postings_frame

    docs = spark.createDataFrame(
        [(0, "résumé cræzy ELİF plain")], "doc_id: long, text: string"
    )
    terms = {
        r.term
        for r in postings_frame(
            docs,
            text_col="text",
            id_col="doc_id",
            token_filters=(("icu_folding",),),
        ).collect()
    }
    assert terms == {"resume", "craezy", "elif", "plain"}
