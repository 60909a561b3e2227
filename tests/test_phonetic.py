"""Phonetic module — encoders vs the reference's TestPhoneticFilter /
TestDoubleMetaphoneFilter goldens and the published commons-codec test
vectors; filter emission semantics; the soundex SQL twin."""

from __future__ import annotations

import pytest

from lucene_solr_spark.functions.token_filters import (
    double_metaphone_emissions,
    phonetic_emissions,
)
from lucene_solr_spark.oracle.phonetic import (
    caverphone2,
    cologne,
    double_metaphone,
    metaphone,
    nysiis,
    refined_soundex,
    soundex,
    soundex_sql_expr,
)

# ------------------------------------------------- reference filter goldens
# TestPhoneticFilter.java:36-103 testAlgorithms

GOLDEN_INPUT = "aaa bbb ccc easgasg".split()


@pytest.mark.parametrize(
    "encode,expected",
    [
        (metaphone, ["A", "B", "KKK", "ESKS"]),
        (lambda w: double_metaphone(w)[0], ["A", "PP", "KK", "ASKS"]),
        (soundex, ["A000", "B000", "C000", "E220"]),
        (refined_soundex, ["A0", "B1", "C3", "E034034"]),
        (nysiis, ["A", "B", "C", "EASGAS"]),
    ],
)
def test_reference_filter_goldens(encode, expected):
    assert [encode(w) for w in GOLDEN_INPUT] == expected


def test_caverphone2_reference_goldens():
    assert [caverphone2(w) for w in "Darda Karleen Datha Carlene".split()] == [
        "TTA1111111",
        "KLN1111111",
        "TTA1111111",
        "KLN1111111",
    ]


# ------------------------------------------------ published encoder vectors


def test_metaphone_vectors():
    vec = {
        "howl": "HL", "testing": "TSTN", "The": "0", "quick": "KK",
        "brown": "BRN", "fox": "FKS", "jumped": "JMPT", "over": "OFR",
        "lazy": "LS", "dogs": "TKS", "COMB": "KM", "TOMB": "TM",
        "WOMB": "WM", "SCIENCE": "SNS", "SCENE": "SN", "SCY": "S",
        "SCHEDULE": "SKTL", "GHENT": "KNT", "BAUGH": "B", "GNU": "N",
        "SIGNED": "SNT", "PHISH": "FX", "SHOT": "XT", "ODSIAN": "OTXN",
        "PULSION": "PLXN", "OTIA": "OX", "PORTION": "PRXN",
        "DODGY": "TJ", "DODGE": "TJ", "ADGIEMTI": "AJMT",
        "XALAN": "SLN", "WHY": "",
    }
    assert {w: metaphone(w) for w in vec} == vec


def test_soundex_vectors():
    vec = {
        "testing": "T235", "The": "T000", "quick": "Q200", "brown": "B650",
        "fox": "F200", "jumped": "J513", "over": "O160", "lazy": "L200",
        "dogs": "D200", "Ashcraft": "A261", "Ashcroft": "A261",
        "Tymczak": "T522", "Pfister": "P236", "Robert": "R163",
        "Rupert": "R163", "Rubin": "R150", "HOLMES": "H452",
        "ADOMOMI": "A355", "VONDERLEHR": "V536", "BALL": "B400",
        "SHAW": "S000", "JACKSON": "J250", "SCANLON": "S545",
        "SAINTJOHN": "S532",
    }
    assert {w: soundex(w) for w in vec} == vec


def test_double_metaphone_vectors():
    assert double_metaphone("international", 4) == ("ANTR", "ANTR")
    assert double_metaphone("international", 8)[0] == "ANTRNXNL"
    assert double_metaphone("Kuczewski") == ("KSSK", "KXFS")
    assert double_metaphone("hello", 8)[0] == "HL"
    assert double_metaphone("12345") == ("", "")
    prim = {
        "testing": "TSTN", "The": "0", "quick": "KK", "brown": "PRN",
        "fox": "FKS", "jumped": "JMPT", "over": "AFR", "lazy": "LS",
        "dogs": "TKS", "MacCafferey": "MKFR", "Stevenson": "STFN",
        "Cunningham": "KNNK", "King": "KNK", "Baker": "PKR",
        "Black": "PLK", "Levine": "LFN", "Bella": "PL",
    }
    assert {w: double_metaphone(w)[0] for w in prim} == prim
    assert double_metaphone("Arnow") == ("ARN", "ARNF")
    assert double_metaphone("Thumbail") == ("0MPL", "TMPL")


def test_nysiis_vectors():
    vec = {
        "Bishop": "BASAP", "Carlson": "CARLSA", "Carr": "CAR",
        "Chapman": "CAPNAN", "Franklin": "FRANCL", "Greene": "GRAN",
        "Harper": "HARPAR", "Jacobs": "JACAB", "Larson": "LARSAN",
        "Lawrence": "LARANC", "Lawson": "LASAN", "Lynch": "LYNC",
        "Mackenzie": "MCANSY", "McCormack": "MCARNA", "Daly": "DALY",
        "Walters": "WALTAR", "Knight": "NAGT", "Mitchell": "MATCAL",
        "O'Daniel": "ODANAL", "Phillipson": "FALAPS",
    }
    assert {w: nysiis(w) for w in vec} == vec


def test_cologne_vectors():
    vec = {
        "Müller-Lüdenscheidt": "65752682", "Breschnew": "17863",
        "Wikipedia": "3412", "Mueller": "657", "meyer": "67",
        "Holz": "058", "Aabjoe": "01", "Aaclan": "0856",
        "Schmidt": "862", "Schneider": "8627",
    }
    assert {w: cologne(w) for w in vec} == vec


# --------------------------------------------------------- filter emissions


def test_phonetic_filter_emissions():
    # inject: code first (keeps the position increment), original stacked
    # as the overlap (PhoneticFilter.java:84-95)
    assert phonetic_emissions("easgasg", metaphone, True) == [
        ("ESKS", False),
        ("easgasg", True),
    ]
    assert phonetic_emissions("easgasg", metaphone, False) == [
        ("ESKS", False)
    ]
    # unencodable and identical codes pass through
    assert phonetic_emissions("12345", metaphone, True) == [("12345", False)]
    assert phonetic_emissions("A", metaphone, False) == [("A", False)]


def test_double_metaphone_filter_emissions():
    # TestDoubleMetaphoneFilter.java:30-70
    assert double_metaphone_emissions("international", 4, False) == [
        ("ANTR", False)
    ]
    assert double_metaphone_emissions("international", 4, True) == [
        ("international", False),
        ("ANTR", True),
    ]
    assert double_metaphone_emissions("Kuczewski", 4, False) == [
        ("KSSK", False),
        ("KXFS", True),
    ]
    assert double_metaphone_emissions("Kuczewski", 4, True) == [
        ("Kuczewski", False),
        ("KSSK", True),
        ("KXFS", True),
    ]
    assert double_metaphone_emissions("12345", 8, False) == [("12345", False)]
    assert double_metaphone_emissions("12345", 8, True) == [("12345", False)]


# ------------------------------------------------------------ SQL twin


def test_soundex_sql_matches_python_on_corpus_vocab():
    """The layered-SQL soundex omits the pre-H/W swallow branch (not
    expressible without RE2 lookbehind); assert it agrees with the exact
    Python encoder on EVERY term of the gate corpora, so the value-exact
    gate claim is checked against the data it runs on."""
    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01"):
        vocab = [
            r[0]
            for r in con.execute(
                "SELECT DISTINCT unnest(regexp_extract_all(text, '[a-z0-9]+'))"
                f" FROM '/root/testdata/{sf}/documents.parquet'"
            ).fetchall()
        ]
        got = [
            r[0]
            for r in con.execute(
                f"SELECT {soundex_sql_expr('term')} FROM "
                "(SELECT unnest(?::VARCHAR[]) AS term)",
                [vocab],
            ).fetchall()
        ]
        for w, g in zip(vocab, got):
            c = soundex(w)
            want = c if c and c != w else w
            assert g == want, (sf, w, g, want)


def test_soundex_sql_matches_python_on_simple_words():
    """Beyond the corpus: plain ascii words without adjacent-H/W
    pathologies agree exactly."""
    import duckdb

    words = (
        "testing the quick brown fox jumped over lazy dogs robert rupert "
        "ashcraft tymczak pfister merge window table scan hash join dup "
        "supercalifragilistic a 42"
    ).split()
    con = duckdb.connect()
    got = [
        r[0]
        for r in con.execute(
            f"SELECT {soundex_sql_expr('term')} FROM "
            "(SELECT unnest(?::VARCHAR[]) AS term)",
            [words],
        ).fetchall()
    ]
    for w, g in zip(words, got):
        c = soundex(w)
        want = c if c and c != w else w
        assert g == want, (w, g, want)


# ------------------------------------------------------- end-to-end kernel


def test_postings_frame_phonetic_chain(spark):
    from lucene_solr_spark.functions.analysis import postings_frame

    docs = spark.createDataFrame(
        [(0, "easgasg aaa knight"), (1, "easgasg easgasg")],
        "doc_id: long, text: string",
    )
    # replace mode: terms become metaphone codes where encodable
    rows = postings_frame(
        docs,
        text_col="text",
        id_col="doc_id",
        token_filters=(("phonetic", "metaphone", False),),
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.term] = (r.tf, r.otf)
    assert by_doc[0] == {"ESKS": (1, 0), "A": (1, 0), "NT": (1, 0)}
    assert by_doc[1] == {"ESKS": (2, 0)}
    # inject mode: original stacked as overlap at the same position
    rows = postings_frame(
        docs,
        text_col="text",
        id_col="doc_id",
        token_filters=(("phonetic", "metaphone", True),),
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.term] = (r.tf, r.otf)
    assert by_doc[1] == {"ESKS": (2, 0), "easgasg": (2, 2)}
    # positions of code and original coincide
    pos = {
        (r.doc_id, r.term): list(r.positions)
        for r in postings_frame(
            docs,
            text_col="text",
            id_col="doc_id",
            token_filters=(("phonetic", "metaphone", True),),
        ).collect()
    }
    assert pos[(0, "ESKS")] == pos[(0, "easgasg")]


def test_postings_frame_double_metaphone(spark):
    from lucene_solr_spark.functions.analysis import postings_frame

    docs = spark.createDataFrame(
        [(0, "kuczewski hello 12345")], "doc_id: long, text: string"
    )
    rows = postings_frame(
        docs,
        text_col="text",
        id_col="doc_id",
        token_filters=(("double_metaphone", 4, False),),
    ).collect()
    terms = {r.term: (r.tf, r.otf) for r in rows}
    # primary keeps the position, alternate stacks; numbers pass through
    assert terms == {"KSSK": (1, 0), "KXFS": (1, 1), "HL": (1, 0), "12345": (1, 0)}


# ------------------------------------------------------- Daitch–Mokotoff


def test_daitch_mokotoff_reference_goldens():
    from lucene_solr_spark.oracle.phonetic import daitch_mokotoff

    # TestDaitchMokotoffSoundexFilter.java:31-45 — including the branch
    # fork ORDER for 'ccc'
    assert daitch_mokotoff("aaa") == ("000000",)
    assert daitch_mokotoff("bbb") == ("700000",)
    assert daitch_mokotoff("ccc") == (
        "400000", "450000", "454000", "540000", "545000", "500000",
    )
    assert daitch_mokotoff("easgasg") == ("045450",)


def test_daitch_mokotoff_published_vectors():
    from lucene_solr_spark.oracle.phonetic import daitch_mokotoff

    for w, want in [
        ("Moskowitz", {"645740"}), ("Mintz", {"664000"}),
        ("Topf", {"370000"}), ("Haber", {"579000"}),
        ("Mannheim", {"665600"}), ("Auerbach", {"097400", "097500"}),
        ("Peters", {"739400", "734000"}),
        ("Jackson", {"154600", "454600", "145460", "445460"}),
        ("Kleinman", {"586660"}), ("12345", set()),
    ]:
        assert set(daitch_mokotoff(w)) == want, w


def test_daitch_mokotoff_filter_emissions():
    from lucene_solr_spark.functions.token_filters import (
        daitch_mokotoff_emissions,
    )

    # inject: original first, all branch codes stacked
    assert daitch_mokotoff_emissions("bbb", True) == [
        ("bbb", False),
        ("700000", True),
    ]
    ems = daitch_mokotoff_emissions("ccc", False)
    assert ems[0] == ("400000", False)
    assert all(ov for _, ov in ems[1:]) and len(ems) == 6
    assert daitch_mokotoff_emissions("12345", False) == [("12345", False)]
    assert daitch_mokotoff_emissions("12345", True) == [("12345", False)]


def test_postings_frame_daitch_mokotoff(spark):
    from lucene_solr_spark.functions.analysis import postings_frame

    docs = spark.createDataFrame(
        [(0, "ccc topf 12345")], "doc_id: long, text: string"
    )
    rows = postings_frame(
        docs,
        text_col="text",
        id_col="doc_id",
        token_filters=(("daitch_mokotoff", True),),
    ).collect()
    terms = {r.term: (r.tf, r.otf) for r in rows}
    assert terms["ccc"] == (1, 0) and terms["topf"] == (1, 0)
    assert terms["400000"] == (1, 1) and terms["370000"] == (1, 1)
    assert terms["12345"] == (1, 0)
    assert len([t for t in terms if t.isdigit() and len(t) == 6]) == 7
