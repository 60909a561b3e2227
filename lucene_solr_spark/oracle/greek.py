"""GreekAnalyzer chain stages — GreekLowerCaseFilter and GreekStemmer
(``analysis/common/src/java/org/apache/lucene/analysis/el/
GreekLowerCaseFilter.java``, ``GreekStemmer.java`` — Ntais'
"Development of a Stemmer for the Greek Language" with the Saroukos
improvements the reference carries).

The 22-rule machine is ported rule-for-rule INCLUDING the reference's
Java operator-precedence quirks (in rule0's σκαγιου block and rule8's
suffix ladders the ``len >`` guard binds only to the FIRST alternative
of the ``||`` chain — ``GreekStemmer.java:105-113,368-384``); exception
word sets are extracted verbatim from the source. GreekLowerCaseFilter
folds both sigmas to σ and strips tonos/dialytika
(``GreekLowerCaseFilter.java:54-113``).
"""

from __future__ import annotations

__all__ = ["greek_lower", "greek_stem", "GREEK_STOP_WORDS"]

_GREEK_FOLD = {
    "\u03C2": "σ",
    "\u0386": "α", "\u03AC": "α",
    "\u0388": "ε", "\u03AD": "ε",
    "\u0389": "η", "\u03AE": "η",
    "\u038A": "ι", "\u03AA": "ι", "\u03AF": "ι", "\u03CA": "ι",
    "\u0390": "ι",
    "\u038E": "υ", "\u03AB": "υ", "\u03CD": "υ", "\u03CB": "υ",
    "\u03B0": "υ",
    "\u038C": "ο", "\u03CC": "ο",
    "\u038F": "ω", "\u03CE": "ω",
    "\u03A2": "\u03C2",
}


def greek_lower(term: str) -> str:
    """GreekLowerCaseFilter: per-codepoint fold table, then plain
    lowercase."""
    return "".join(_GREEK_FOLD.get(c, c.lower()) for c in term)


_EXC4 = frozenset(
(
    "θ δ ελ γαλ ν π ιδ παρ "
).split()
)

_EXC6 = frozenset(
(
    "αλ αδ ενδ αμαν αμμοχαλ ηθ ανηθ αντιδ φυσ βρωμ γερ εξωδ καλπ "
    "καλλιν καταδ μουλ μπαν μπαγιατ μπολ μποσ νιτ ξικ συνομηλ πετσ "
    "πιτσ πικαντ πλιατσ ποστελν πρωτοδ σερτ συναδ τσαμ υποδ φιλον "
    "φυλοδ χασ "
).split()
)

_EXC7 = frozenset(
(
    "αναπ αποθ αποκ αποστ βουβ ξεθ ουλ πεθ πικρ ποτ σιχ χ "
).split()
)

_EXC8A = frozenset(
(
    "τρ τσ "
).split()
)

_EXC8B = frozenset(
(
    "βετερ βουλκ βραχμ γ δραδουμ θ καλπουζ καστελ κορμορ λαοπλ μωαμεθ "
    "μ μουσουλμ ν ουλ π πελεκ πλ πολισ πορτολ σαρακατσ σουλτ τσαρλατ "
    "ορφ τσιγγ τσοπ φωτοστεφ χ ψυχοπλ αγ ορφ γαλ γερ δεκ διπλ "
    "αμερικαν ουρ πιθ πουριτ σ ζωντ ικ καστ κοπ λιχ λουθηρ μαιντ μελ "
    "σιγ σπ στεγ τραγ τσαγ φ ερ αδαπ αθιγγ αμηχ ανικ ανοργ απηγ απιθ "
    "ατσιγγ βασ βασκ βαθυγαλ βιομηχ βραχυκ διατ διαφ ενοργ θυσ "
    "καπνοβιομηχ καταγαλ κλιβ κοιλαρφ λιβ μεγλοβιομηχ μικροβιομηχ "
    "νταβ ξηροκλιβ ολιγοδαμ ολογαλ πενταρφ περηφ περιτρ πλατ πολυδαπ "
    "πολυμηχ στεφ ταβ τετ υπερηφ υποκοπ χαμηλοδαπ ψηλοταβ "
).split()
)

_EXC9 = frozenset(
(
    "αβαρ βεν εναρ αβρ αδ αθ αν απλ βαρον ντρ σκ κοπ μπορ νιφ παγ "
    "παρακαλ σερπ σκελ συρφ τοκ υ δ εμ θαρρ θ "
).split()
)

_EXC12A = frozenset(
(
    "π απ συμπ ασυμπ ακαταπ αμεταμφ "
).split()
)

_EXC12B = frozenset(
(
    "αλ αρ εκτελ ζ μ ξ παρακαλ αρ προ νισ "
).split()
)

_EXC13 = frozenset(
(
    "διαθ θ παρακαταθ προσθ συνθ "
).split()
)

_EXC14 = frozenset(
(
    "φαρμακ χαδ αγκ αναρρ βρομ εκλιπ λαμπιδ λεχ μ πατ ρ λ μεδ μεσαζ "
    "υποτειν αμ αιθ ανηκ δεσποζ ενδιαφερ δε δευτερευ καθαρευ πλε τσα "
).split()
)

_EXC15A = frozenset(
(
    "αβαστ πολυφ αδηφ παμφ ρ ασπ αφ αμαλ αμαλλι ανυστ απερ ασπαρ αχαρ "
    "δερβεν δροσοπ ξεφ νεοπ νομοτ ολοπ ομοτ προστ προσωποπ συμπ συντ "
    "τ υποτ χαρ αειπ αιμοστ ανυπ αποτ αρτιπ διατ εν επιτ κροκαλοπ "
    "σιδηροπ λ ναυ ουλαμ ουρ π τρ μ "
).split()
)

_EXC15B = frozenset(
(
    "ψοφ ναυλοχ "
).split()
)

_EXC16 = frozenset(
(
    "ν χερσον δωδεκαν ερημον μεγαλον επταν "
).split()
)

_EXC17 = frozenset(
(
    "ασβ σβ αχρ χρ απλ αειμν δυσχρ ευχρ κοινοχρ παλιμψ "
).split()
)

_EXC18 = frozenset(
(
    "ν ρ σπι στραβομουτσ κακομουτσ εξων "
).split()
)

_EXC19 = frozenset(
(
    "παρασουσ φ χ ωριοπλ αζ αλλοσουσ ασουσ "
).split()
)


_VOWELS = set("αεηιουω")
_VOWELS_NO_Y = set("αεηιοω")


def _ev(s: str) -> bool:
    return bool(s) and s[-1] in _VOWELS


def _ev_noy(s: str) -> bool:
    return bool(s) and s[-1] in _VOWELS_NO_Y


def _r0(s):
    L = len(s)
    if L > 9 and s.endswith(("καθεστωτοσ", "καθεστωτων")):
        return s[:-4]
    if L > 8 and s.endswith(("γεγονοτοσ", "γεγονοτων")):
        return s[:-4]
    if L > 8 and s.endswith("καθεστωτα"):
        return s[:-3]
    if L > 7 and s.endswith(("τατογιου", "τατογιων")):
        return s[:-4]
    if L > 7 and s.endswith("γεγονοτα"):
        return s[:-3]
    if L > 7 and s.endswith("καθεστωσ"):
        return s[:-2]
    # the reference's precedence quirk (:105-113): len > 6 guards ONLY
    # the first alternative
    if (L > 6 and s.endswith("σκαγιου")) or s.endswith(
        ("σκαγιων", "ολογιου", "ολογιων", "κρεατοσ", "κρεατων",
         "περατοσ", "περατων", "τερατοσ", "τερατων")
    ):
        return s[:-4]
    if L > 6 and s.endswith("τατογια"):
        return s[:-3]
    if L > 6 and s.endswith("γεγονοσ"):
        return s[:-2]
    if L > 5 and s.endswith(("φαγιου", "φαγιων", "σογιου", "σογιων")):
        return s[:-4]
    if L > 5 and s.endswith(("σκαγια", "ολογια", "κρεατα", "περατα", "τερατα")):
        return s[:-3]
    if L > 4 and s.endswith(("φαγια", "σογια", "φωτοσ", "φωτων")):
        return s[:-3]
    if L > 4 and s.endswith(("κρεασ", "περασ", "τερασ")):
        return s[:-2]
    if L > 3 and s.endswith("φωτα"):
        return s[:-2]
    if L > 2 and s.endswith("φωσ"):
        return s[:-1]
    return s


def _r1(s):
    if len(s) > 4 and s.endswith(("αδεσ", "αδων")):
        s = s[:-4]
        if not s.endswith(("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι",
                           "νταντ", "κυρ", "θει", "πεθερ")):
            s += "αδ"
    return s


def _r2(s):
    if len(s) > 4 and s.endswith(("εδεσ", "εδων")):
        s = s[:-4]
        if s.endswith(("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ", "μιλ")):
            s += "εδ"
    return s


def _r3(s):
    if len(s) > 5 and s.endswith(("ουδεσ", "ουδων")):
        s = s[:-5]
        if s.endswith(("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ", "σ",
                       "φλ", "φρ", "βελ", "λουλ", "χν", "σπ", "τραγ", "φε")):
            s += "ουδ"
    return s


def _r4(s):
    if len(s) > 3 and s.endswith(("εωσ", "εων")):
        s = s[:-3]
        if s in _EXC4:
            s += "ε"
    return s


def _r5(s):
    if len(s) > 2 and s.endswith("ια"):
        s = s[:-2]
        if _ev(s):
            s += "ι"
    elif len(s) > 3 and s.endswith(("ιου", "ιων")):
        s = s[:-3]
        if _ev(s):
            s += "ι"
    return s


def _r6(s):
    removed = False
    if len(s) > 3 and s.endswith(("ικα", "ικο")):
        s = s[:-3]
        removed = True
    elif len(s) > 4 and s.endswith(("ικου", "ικων")):
        s = s[:-4]
        removed = True
    if removed and (_ev(s) or s in _EXC6):
        s += "ικ"
    return s


def _r7(s):
    if len(s) == 5 and s.endswith("αγαμε"):
        return s[:-1]
    if len(s) > 7 and s.endswith("ηθηκαμε"):
        s = s[:-7]
    elif len(s) > 6 and s.endswith("ουσαμε"):
        s = s[:-6]
    elif len(s) > 5 and s.endswith(("αγαμε", "ησαμε", "ηκαμε")):
        s = s[:-5]
    if len(s) > 3 and s.endswith("αμε"):
        s = s[:-3]
        if s in _EXC7:
            s += "αμ"
    return s


def _r8(s):
    removed = False
    L = len(s)
    if L > 8 and s.endswith("ιουντανε"):
        s = s[:-8]
        removed = True
    # precedence quirk (:368-384): the len guard binds only to the
    # first alternative of each ladder step
    elif (L > 7 and s.endswith("ιοντανε")) or s.endswith(("ουντανε", "ηθηκανε")):
        s = s[:-7]
        removed = True
    elif (L > 6 and s.endswith("ιοτανε")) or s.endswith(("οντανε", "ουσανε")):
        s = s[:-6]
        removed = True
    elif (L > 5 and s.endswith("αγανε")) or s.endswith(("ησανε", "οτανε", "ηκανε")):
        s = s[:-5]
        removed = True
    if removed and s in _EXC8A:
        s += "αγαν"
    if len(s) > 3 and s.endswith("ανε"):
        s = s[:-3]
        if _ev_noy(s) or s in _EXC8B:
            s += "αν"
    return s


def _r9(s):
    if len(s) > 5 and s.endswith("ησετε"):
        s = s[:-5]
    if len(s) > 3 and s.endswith("ετε"):
        s = s[:-3]
        if (s in _EXC9 or _ev_noy(s) or s.endswith((
            "οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ", "ευρ", "τιθ",
            "υπερθ", "ραθ", "ενθ", "ροθ", "σθ", "πυρ", "αιν", "συνδ",
            "συν", "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ", "εκθ", "νετ",
            "ρον", "αρκ", "βαρ", "βολ", "ωφελ",
        ))):
            s += "ετ"
    return s


def _r10(s):
    if len(s) > 5 and s.endswith(("οντασ", "ωντασ")):
        s = s[:-5]
        if len(s) == 3 and s.endswith("αρχ"):
            s += "οντ"  # add back *ντ with ο
        if s.endswith("κρε"):
            s += "ωντ"  # add back *ντ with ω
    return s


def _r11(s):
    if len(s) > 6 and s.endswith("ομαστε"):
        s = s[:-6]
        if len(s) == 2 and s.endswith("ον"):
            s += "ομαστ"
    elif len(s) > 7 and s.endswith("ιομαστε"):
        s = s[:-7]
        if len(s) == 2 and s.endswith("ον"):
            s += "ομαστ"
    return s


def _r12(s):
    if len(s) > 5 and s.endswith("ιεστε"):
        s = s[:-5]
        if s in _EXC12A:
            s += "ιεστ"
    if len(s) > 4 and s.endswith("εστε"):
        s = s[:-4]
        if s in _EXC12B:
            s += "εστ"
    return s


def _r13(s):
    if len(s) > 6 and s.endswith("ηθηκεσ"):
        s = s[:-6]
    elif len(s) > 5 and s.endswith(("ηθηκα", "ηθηκε")):
        s = s[:-5]
    removed = False
    if len(s) > 4 and s.endswith("ηκεσ"):
        s = s[:-4]
        removed = True
    elif len(s) > 3 and s.endswith(("ηκα", "ηκε")):
        s = s[:-3]
        removed = True
    if removed and (s in _EXC13 or s.endswith(
        ("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ")
    )):
        s += "ηκ"
    return s


def _r14(s):
    removed = False
    if len(s) > 5 and s.endswith("ουσεσ"):
        s = s[:-5]
        removed = True
    elif len(s) > 4 and s.endswith(("ουσα", "ουσε")):
        s = s[:-4]
        removed = True
    if removed and (s in _EXC14 or _ev(s) or s.endswith(
        ("ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ", "μαλλ", "κυματ",
         "λαχ", "ληγ", "φαγ", "ομ", "πρωτ")
    )):
        s += "ουσ"
    return s


def _r15(s):
    removed = False
    if len(s) > 4 and s.endswith("αγεσ"):
        s = s[:-4]
        removed = True
    elif len(s) > 3 and s.endswith(("αγα", "αγε")):
        s = s[:-3]
        removed = True
    if removed:
        cond1 = s in _EXC15A or s.endswith(
            ("οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ", "φρ", "πρ", "λοχ", "σμην")
        )
        cond2 = s in _EXC15B or s.endswith("κολλ")
        if cond1 and not cond2:
            s += "αγ"
    return s


def _r16(s):
    removed = False
    if len(s) > 4 and s.endswith("ησου"):
        s = s[:-4]
        removed = True
    elif len(s) > 3 and s.endswith(("ησε", "ησα")):
        s = s[:-3]
        removed = True
    if removed and s in _EXC16:
        s += "ησ"
    return s


def _r17(s):
    if len(s) > 4 and s.endswith("ηστε"):
        s = s[:-4]
        if s in _EXC17:
            s += "ηστ"
    return s


def _r18(s):
    removed = False
    if len(s) > 6 and s.endswith(("ησουνε", "ηθουνε")):
        s = s[:-6]
        removed = True
    elif len(s) > 4 and s.endswith("ουνε"):
        s = s[:-4]
        removed = True
    if removed and s in _EXC18:
        s += "ουν"
    return s


def _r19(s):
    removed = False
    if len(s) > 6 and s.endswith(("ησουμε", "ηθουμε")):
        s = s[:-6]
        removed = True
    elif len(s) > 4 and s.endswith("ουμε"):
        s = s[:-4]
        removed = True
    if removed and s in _EXC19:
        s += "ουμ"
    return s


def _r20(s):
    if len(s) > 5 and s.endswith(("ματων", "ματοσ")):
        return s[:-3]
    if len(s) > 4 and s.endswith("ματα"):
        return s[:-2]
    return s


_R21_STEPS = (
    (9, ("ιοντουσαν",), 9),
    (8, ("ιομασταν", "ιοσασταν", "ιουμαστε", "οντουσαν"), 8),
    (7, ("ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε", "ιοσουνα",
         "ιουνται", "ιουνταν", "ηθηκατε", "ομασταν", "οσασταν",
         "ουμαστε"), 7),
    (6, ("ιομουν", "ιονταν", "ιοσουν", "ηθειτε", "ηθηκαν", "ομουνα",
         "οσαστε", "οσουνα", "ουνται", "ουνταν", "ουσατε"), 6),
    (5, ("αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν", "ιουμα", "ηθεισ",
         "ηθουν", "ηκατε", "ησατε", "ησουν", "ομουν", "ονται", "ονταν",
         "οσουν", "ουμαι", "ουσαν"), 5),
    (4, ("αγαν", "αμαι", "ασαι", "αται", "ειτε", "εσαι", "εται", "ηδεσ",
         "ηδων", "ηθει", "ηκαν", "ησαν", "ησει", "ησεσ", "ομαι",
         "οταν"), 4),
    (3, ("αει", "εισ", "ηθω", "ησω", "ουν", "ουσ"), 3),
    (2, ("αν", "ασ", "αω", "ει", "εσ", "ησ", "οι", "οσ", "ου", "υσ",
         "ων"), 2),
)


def _r21(s):
    for gate, sufs, cut in _R21_STEPS:
        if len(s) > gate and s.endswith(sufs):
            return s[:-cut]
    if len(s) > 1 and _ev(s):
        return s[:-1]
    return s


def _r22(s):
    if s.endswith(("εστερ", "εστατ")):
        return s[:-5]
    if s.endswith(("οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ")):
        return s[:-4]
    return s


def greek_stem(term: str) -> str:
    """GreekStemmer.stem (``el/GreekStemmer.java:42-73``): the 20 short
    rules, rule21 only when none of them changed the length, rule22
    always."""
    if len(term) < 4:
        return term
    s = term
    orig = len(s)
    for r in (_r0, _r1, _r2, _r3, _r4, _r5, _r6, _r7, _r8, _r9, _r10,
              _r11, _r12, _r13, _r14, _r15, _r16, _r17, _r18, _r19, _r20):
        s = r(s)
    if len(s) == orig:
        s = _r21(s)
    return _r22(s)


#: el/stopwords.txt ("#"-comment wordlist, 75 entries; ships
#: already lowercased+folded for the GreekLowerCaseFilter output)
GREEK_STOP_WORDS = frozenset(
    (
        "ο η το οι τα του τησ των τον την και κι κ ειμαι εισαι ειναι "
        "ειμαστε ειστε στο στον στη στην μα αλλα απο για προσ με σε ωσ "
        "παρα αντι κατα μετα θα να δε δεν μη μην επι ενω εαν αν τοτε που "
        "πωσ ποιοσ ποια ποιο ποιοι ποιεσ ποιων ποιουσ αυτοσ αυτη αυτο "
        "αυτοι αυτων αυτουσ αυτεσ αυτα εκεινοσ εκεινη εκεινο εκεινοι "
        "εκεινεσ εκεινα εκεινων εκεινουσ οπωσ ομωσ ισωσ οσο οτι "
    ).split()
)
