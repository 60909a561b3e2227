"""IndicNormalizationFilter + HindiNormalizationFilter + HindiStemmer
(``analysis/common/src/java/org/apache/lucene/analysis/in/
IndicNormalizer.java``, ``hi/HindiNormalizer.java``,
``hi/HindiStemmer.java``) — the HindiAnalyzer chain stages.

The decomposition table transcribes the Unicode 5.2 Indic composition
data the reference embeds (``IndicNormalizer.java:64-216`` cites
Unicode 5.2 and the LDC Indian-scripts chart) as (ch1, ch2, ch3, res,
scripts) offsets into each script's 128-codepoint block; the algorithm
(first matching row at each position, same-block lookahead, ZWJ as the
0xFF wildcard, compose-then-delete) is ``IndicNormalizer.java:
218-265``. HindiNormalizer is the Pingali & Varma scheme plus the
Larkey additions (dead-n → anusvara, ZWJ/ZWNJ removal); HindiStemmer
the Ramanathan & Rao suffix cascade.
"""

from __future__ import annotations

__all__ = [
    "indic_normalize",
    "hindi_normalize",
    "hindi_stem",
    "hindi_fold",
    "HINDI_STEM_SQL",
    "HINDI_STOP_WORDS",
]

#: script letter -> block base (all nine blocks are 128 codepoints)
_BASES = {
    "D": 0x0900, "B": 0x0980, "G": 0x0A00, "J": 0x0A80, "O": 0x0B00,
    "T": 0x0B80, "E": 0x0C00, "K": 0x0C80, "M": 0x0D00,
}

#: (ch1, ch2, ch3, res, scripts) — IndicNormalizer.java:64-216
_DECOMP = (
    (0x05, 0x3e, 0x45, 0x11, "DJ"),
    (0x05, 0x3e, 0x46, 0x12, "D"),
    (0x05, 0x3e, 0x47, 0x13, "DJ"),
    (0x05, 0x3e, 0x48, 0x14, "DJ"),
    (0x05, 0x3e, -0x1, 0x06, "DBGJO"),
    (0x05, 0x45, -0x1, 0x72, "D"),
    (0x05, 0x45, -0x1, 0x0d, "J"),
    (0x05, 0x46, -0x1, 0x04, "D"),
    (0x05, 0x47, -0x1, 0x0f, "J"),
    (0x05, 0x48, -0x1, 0x10, "GJ"),
    (0x05, 0x49, -0x1, 0x11, "DJ"),
    (0x05, 0x4a, -0x1, 0x12, "D"),
    (0x05, 0x4b, -0x1, 0x13, "DJ"),
    (0x05, 0x4c, -0x1, 0x14, "DGJ"),
    (0x06, 0x45, -0x1, 0x11, "DJ"),
    (0x06, 0x46, -0x1, 0x12, "D"),
    (0x06, 0x47, -0x1, 0x13, "DJ"),
    (0x06, 0x48, -0x1, 0x14, "DJ"),
    (0x07, 0x57, -0x1, 0x08, "M"),
    (0x09, 0x41, -0x1, 0x0a, "D"),
    (0x09, 0x57, -0x1, 0x0a, "TM"),
    (0x0e, 0x46, -0x1, 0x10, "M"),
    (0x0f, 0x45, -0x1, 0x0d, "D"),
    (0x0f, 0x46, -0x1, 0x0e, "D"),
    (0x0f, 0x47, -0x1, 0x10, "D"),
    (0x0f, 0x57, -0x1, 0x10, "O"),
    (0x12, 0x3e, -0x1, 0x13, "M"),
    (0x12, 0x4c, -0x1, 0x14, "EK"),
    (0x12, 0x55, -0x1, 0x13, "E"),
    (0x12, 0x57, -0x1, 0x14, "TM"),
    (0x13, 0x57, -0x1, 0x14, "O"),
    (0x15, 0x3c, -0x1, 0x58, "D"),
    (0x16, 0x3c, -0x1, 0x59, "DG"),
    (0x17, 0x3c, -0x1, 0x5a, "DG"),
    (0x1c, 0x3c, -0x1, 0x5b, "DG"),
    (0x21, 0x3c, -0x1, 0x5c, "DBO"),
    (0x22, 0x3c, -0x1, 0x5d, "DBO"),
    (0x23, 0x4d, 0xff, 0x7a, "M"),
    (0x24, 0x4d, 0xff, 0x4e, "B"),
    (0x28, 0x3c, -0x1, 0x29, "D"),
    (0x28, 0x4d, 0xff, 0x7b, "M"),
    (0x2b, 0x3c, -0x1, 0x5e, "DG"),
    (0x2f, 0x3c, -0x1, 0x5f, "DB"),
    (0x2c, 0x41, 0x41, 0x0b, "E"),
    (0x30, 0x3c, -0x1, 0x31, "D"),
    (0x30, 0x4d, 0xff, 0x7c, "M"),
    (0x32, 0x4d, 0xff, 0x7d, "M"),
    (0x33, 0x3c, -0x1, 0x34, "D"),
    (0x33, 0x4d, 0xff, 0x7e, "M"),
    (0x35, 0x41, -0x1, 0x2e, "E"),
    (0x3e, 0x45, -0x1, 0x49, "DJ"),
    (0x3e, 0x46, -0x1, 0x4a, "D"),
    (0x3e, 0x47, -0x1, 0x4b, "DJ"),
    (0x3e, 0x48, -0x1, 0x4c, "DJ"),
    (0x3f, 0x55, -0x1, 0x40, "K"),
    (0x41, 0x41, -0x1, 0x42, "G"),
    (0x46, 0x3e, -0x1, 0x4a, "TM"),
    (0x46, 0x42, 0x55, 0x4b, "K"),
    (0x46, 0x42, -0x1, 0x4a, "K"),
    (0x46, 0x46, -0x1, 0x48, "M"),
    (0x46, 0x55, -0x1, 0x47, "EK"),
    (0x46, 0x56, -0x1, 0x48, "EK"),
    (0x46, 0x57, -0x1, 0x4c, "TM"),
    (0x47, 0x3e, -0x1, 0x4b, "BOTM"),
    (0x47, 0x57, -0x1, 0x4c, "BO"),
    (0x4a, 0x55, -0x1, 0x4b, "K"),
    (0x72, 0x3f, -0x1, 0x07, "G"),
    (0x72, 0x40, -0x1, 0x08, "G"),
    (0x72, 0x47, -0x1, 0x0f, "G"),
    (0x73, 0x41, -0x1, 0x09, "G"),
    (0x73, 0x42, -0x1, 0x0a, "G"),
    (0x73, 0x4b, -0x1, 0x13, "G"),
)

_DECOMP_CH0 = {}
for _row in _DECOMP:
    for _s in _row[4]:
        _DECOMP_CH0.setdefault(_s, set()).add(_row[0])


def _block_of(cp: int):
    for s, base in _BASES.items():
        if base <= cp < base + 0x80:
            return s, base
    return None, None


def indic_normalize(term: str) -> str:
    """IndicNormalizer.normalize/compose (in/IndicNormalizer.java:
    218-265): per position, the FIRST table row whose script matches and
    whose ch2 (same block) and optional ch3 (same block, or ZWJ as
    0xFF) follow composes and deletes the consumed chars."""
    s = list(term)
    i = 0
    while i < len(s):
        cp = ord(s[i])
        script, base = _block_of(cp)
        if script is not None and (cp - base) in _DECOMP_CH0.get(script, ()):
            ch0 = cp - base
            if i + 1 < len(s):
                cp1 = ord(s[i + 1])
                s1, _ = _block_of(cp1)
                if s1 == script:
                    ch1 = cp1 - base
                    ch2 = -1
                    if i + 2 < len(s):
                        cp2 = ord(s[i + 2])
                        if cp2 == 0x200D:  # ZWJ
                            ch2 = 0xFF
                        else:
                            s2, _ = _block_of(cp2)
                            ch2 = cp2 - base if s2 == script else -1
                    for r0, r1, r2, res, scripts in _DECOMP:
                        if r0 == ch0 and script in scripts:
                            if r1 == ch1 and (r2 < 0 or r2 == ch2):
                                s[i] = chr(base + res)
                                del s[i + 1]
                                if r2 >= 0:
                                    del s[i + 1]
                                break
        i += 1
    return "".join(s)


def hindi_normalize(term: str) -> str:
    """HindiNormalizer (``hi/HindiNormalizer.java:46-170``): dead
    n → anusvara, candrabindu → bindu, nukta folds/deletions, ZWJ/ZWNJ
    and virama deletion, chandra/short vowel folds, long → short vowel
    folds — a sequential scan with in-place deletions."""
    s = list(term)
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\u0928":  # dead n -> bindu
            if i + 1 < len(s) and s[i + 1] == "\u094D":
                s[i] = "\u0902"
                del s[i + 1]
        elif c == "\u0901":
            s[i] = "\u0902"
        elif c in "\u093C\u200D\u200C\u094D":  # nukta/zwj/zwnj/virama
            del s[i]
            continue
        elif c in _HN_MAP:
            s[i] = _HN_MAP[c]
        i += 1
    return "".join(s)


_HN_MAP = {
    "\u0929": "\u0928", "\u0931": "\u0930", "\u0934": "\u0933",
    "\u0958": "\u0915", "\u0959": "\u0916", "\u095A": "\u0917",
    "\u095B": "\u091C", "\u095C": "\u0921", "\u095D": "\u0922",
    "\u095E": "\u092B", "\u095F": "\u092F",
    "\u0945": "\u0947", "\u0946": "\u0947",
    "\u0949": "\u094B", "\u094A": "\u094B",
    "\u090D": "\u090F", "\u090E": "\u090F",
    "\u0911": "\u0913", "\u0912": "\u0913",
    "\u0972": "\u0905", "\u0906": "\u0905", "\u0908": "\u0907",
    "\u090A": "\u0909", "\u0960": "\u090B", "\u0961": "\u090C",
    "\u0910": "\u090F", "\u0914": "\u0913",
    "\u0940": "\u093F", "\u0942": "\u0941", "\u0944": "\u0943",
    "\u0963": "\u0962", "\u0948": "\u0947", "\u094C": "\u094B",
}

#: HindiStemmer suffix cascade (hi/HindiStemmer.java:29-110):
#: (min_len_exclusive, suffixes, cut)
_HI_STEPS = (
    (6, ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां"), 5),
    (5, ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
         "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
         "ियों", "ियां"), 4),
    (4, ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
         "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
         "ुआं"), 3),
    (3, ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं", "ती",
         "ता", "ाँ", "ां", "ों", "ें"), 2),
    (2, ("ो", "े", "ू", "ु", "ी", "ि", "ा"), 1),
)


def hindi_stem(term: str) -> str:
    """HindiStemmer (``hi/HindiStemmer.java:29-110``): longest-first
    suffix cascade (lightweight Ramanathan & Rao)."""
    n = len(term)
    for gate, sufs, cut in _HI_STEPS:
        if n > gate and term.endswith(sufs):
            return term[:-cut]
    return term


def hindi_fold(term: str) -> str:
    """The HindiAnalyzer pre-stop stages (``hi/HindiAnalyzer.java:
    114-124``): LowerCase → DecimalDigit → IndicNormalization →
    HindiNormalization, all BEFORE the stop filter."""
    from lucene_solr_spark.oracle.lang_pack import decimal_digit_fold

    return hindi_normalize(indic_normalize(decimal_digit_fold(term.lower())))


def _hi_case(pairs):
    out = []
    for gate, sufs, cut in pairs:
        lst = ", ".join("'" + s + "'" for s in sufs)
        ln = len(sufs[0])
        out.append(
            f"WHEN length(term) > {gate} AND right(term, {ln}) IN ({lst})"
            f" THEN left(term, length(term)-{cut})"
        )
    return "CASE\n      " + "\n      ".join(out) + "\n      ELSE term END"


#: one-layer SQL twin of hindi_stem (all suffixes in one first-match
#: CASE, longest group first — identical order to the Java cascade)
HINDI_STEM_SQL = (_hi_case(_HI_STEPS),)

#: hi/stopwords.txt ("#"-comment wordlist, 227 entries; ships in
#: normalized form per its header)
HINDI_STOP_WORDS = frozenset(
    (
        "अंदर अत अपना अपनी अपने अभी आदि आप इत्यादि इन इनका इन्हीं "
        "इन्हें इन्हों इस इसका इसकी इसके इसमें इसी इसे उन उनका उनकी "
        "उनके उनको उन्हीं उन्हें उन्हों उस उसके उसी उसे एक एवं एस ऐसे "
        "और कई कर करता करते करना करने करें कहते कहा का काफ़ी कि कितना "
        "किन्हें किन्हों किया किर किस किसी किसे की कुछ कुल के को कोई "
        "कौन कौनसा गया घर जब जहाँ जा जितना जिन जिन्हें जिन्हों जिस "
        "जिसे जीधर जैसा जैसे जो तक तब तरह तिन तिन्हें तिन्हों तिस "
        "तिसे तो था थी थे दबारा दिया दुसरा दूसरे दो द्वारा न नहीं ना "
        "निहायत नीचे ने पर पर पहले पूरा पे फिर बनी बही बहुत बाद बाला "
        "बिलकुल भी भीतर मगर मानो मे में यदि यह यहाँ यही या यिह ये "
        "रखें रहा रहे ऱ्वासा लिए लिये लेकिन व वर्ग वह वह वहाँ वहीं "
        "वाले वुह वे वग़ैरह संग सकता सकते सबसे सभी साथ साबुत साभ सारा "
        "से सो ही हुआ हुई हुए है हैं हो होता होती होते होना होने अपनि "
        "जेसे होति सभि तिंहों इंहों दवारा इसि किंहें थि उंहों ओर "
        "जिंहें वहिं अभि बनि हि उंहिं उंहें हें वगेरह एसे रवासा कोन "
        "निचे काफि उसि पुरा भितर हे बहि वहां कोइ यहां जिंहों तिंहें "
        "किसि कइ यहि इंहिं जिधर इंहें अदि इतयादि हुइ कोनसा इसकि दुसरे "
        "जहां अप किंहों उनकि भि वरग हुअ जेसा नहिं "
    ).split()
)


# -------------------------------------------------------------- Bengali

def bengali_normalize(term: str) -> str:
    """BengaliNormalizer (``bn/BengaliNormalizer.java:36-152`` — the
    Bengali CLIR normalization of Majumder et al.): chandrabindu
    deletion, long→short kars, khio/nga folds, ja/ba phala
    contractions, positional visarga handling, sh/na/ra class merges —
    a sequential mutating scan with index re-entry."""
    s = list(term)
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\u0981":  # chandrabindu
            del s[i]
            continue
        elif c == "\u09C0":
            s[i] = "\u09BF"
        elif c == "\u09C2":
            s[i] = "\u09C1"
        elif c == "\u0995":  # khio: Ka + hoshonto + murdorno-sh
            if i + 2 < len(s) and s[i + 1] == "\u09CD" and s[i + 2] == "\u09BF":
                if i == 0:
                    s[i] = "\u0996"
                    del s[i + 2]
                    del s[i + 1]
                else:
                    s[i + 1] = "\u0996"
                    del s[i + 2]
        elif c == "\u0999":  # nga -> anusvara
            s[i] = "\u0982"
        elif c == "\u09AF":  # ja phala
            if i - 2 == 0 and s[i - 1] == "\u09CD":
                s[i - 1] = "\u09C7"
                if i + 1 < len(s) and s[i + 1] == "\u09BE":
                    del s[i + 1]
                del s[i]
                continue
            elif i - 1 >= 0 and s[i - 1] == "\u09CD":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
        elif c == "\u09AC":  # ba phala
            if i == 0 or s[i - 1] != "\u09CD":
                pass
            elif i - 2 == 0:
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            elif i - 5 >= 0 and s[i - 3] == "\u09CD":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            elif i - 2 >= 0:
                s[i - 1] = s[i - 2]
                del s[i]
                continue
        elif c == "\u0983":  # visarga
            if i == len(s) - 1:
                if len(s) <= 3:
                    s[i] = "\u09B9"
                else:
                    del s[i]
                    continue
            else:
                s[i] = s[i + 1]
        elif c in "\u09B6\u09B7":
            s[i] = "\u09B8"
        elif c == "\u09A3":
            s[i] = "\u09A8"
        elif c in "\u09DC\u09DD":
            s[i] = "\u09B0"
        elif c == "\u09CE":
            s[i] = "\u09A4"
        i += 1
    return "".join(s)


#: BengaliStemmer cascade (bn/BengaliStemmer.java:31-163), suffixes
#: extracted byte-exact from the reference source
_BN_STEPS = (
    (9, ("িয়াছিলাম", "িতেছিলাম", "িতেছিলেন", "ইতেছিলেন", "িয়াছিলেন", "ইয়াছিলেন"), 8),
    (8, ("িতেছিলি", "িতেছিলে", "িয়াছিলা", "িয়াছিলে", "িতেছিলা", "িয়াছিলি", "য়েদেরকে"), 7),
    (7, ("িতেছিস", "িতেছেন", "িয়াছিস", "িয়াছেন", "েছিলাম", "েছিলেন", "েদেরকে"), 6),
    (6, ("িতেছি", "িতেছা", "িতেছে", "ছিলাম", "ছিলেন", "িয়াছি", "িয়াছা", "িয়াছে", "েছিলে", "েছিলা", "য়েদের", "দেরকে"), 5),
    (5, ("িলাম", "িলেন", "িতাম", "িতেন", "িবেন", "ছিলি", "ছিলে", "ছিলা", "তেছে", "িতেছ", "খানা", "খানি", "গুলো", "গুলি", "য়েরা", "েদের"), 4),
    (4, ("লাম", "িলি", "ইলি", "িলে", "ইলে", "লেন", "িলা", "ইলা", "তাম", "িতি", "ইতি", "িতে", "ইতে", "তেন", "িতা", "িবা", "ইবা", "িবি", "ইবি", "বেন", "িবে", "ইবে", "ছেন", "য়োন", "য়ের", "েরা", "দের"), 3),
    (3, ("িস", "েন", "লি", "লে", "লা", "তি", "তে", "তা", "বি", "বে", "বা", "ছি", "ছা", "ছে", "ুন", "ুক", "টা", "টি", "নি", "ের", "তে", "রা", "কে"), 2),
    (2, ("ি", "ী", "া", "ো", "ে", "ব", "ত"), 1),
)


def bengali_stem(term: str) -> str:
    """BengaliStemmer: longest-first suffix cascade (Sengupta &
    Chaudhuri verb-phrase suffixes + Savoy light criteria)."""
    n = len(term)
    for gate, sufs, cut in _BN_STEPS:
        if n > gate and term.endswith(sufs):
            return term[:-cut]
    return term


def bengali_fold(term: str) -> str:
    """BengaliAnalyzer pre-stop stages (``bn/BengaliAnalyzer.java:
    112-123``): LowerCase → DecimalDigit → IndicNormalization →
    BengaliNormalization."""
    from lucene_solr_spark.oracle.lang_pack import decimal_digit_fold

    return bengali_normalize(
        indic_normalize(decimal_digit_fold(term.lower()))
    )


#: one-layer SQL twin of bengali_stem (same generator as Hindi)
BENGALI_STEM_SQL = (_hi_case(_BN_STEPS),)

#: bn/stopwords.txt ("#"-comment wordlist)
BENGALI_STOP_WORDS = frozenset(
    (
        "এই ও থেকে করে এ না ওই এক্ নিয়ে করা বলেন সঙ্গে যে এব তা আর "
        "কোনো বলে সেই দিন হয় কি দু পরে সব দেওয়া মধ্যে এর সি শুরু কাজ "
        "কিছু কাছে সে তবে বা বন আগে জ্নজন পি পর তো ছিল এখন আমরা প্রায় "
        "দুই আমাদের তাই অন্য গিয়ে প্রযন্ত মনে নতুন মতো কেখা প্রথম আজ "
        "টি ধামার অনেক বিভিন্ন র হাজার জানা নয় অবশ্য বেশি এস করে কে "
        "হতে বি কয়েক সহ বেশ এমন এমনি কেন কেউ নেওয়া চেষ্টা লক্ষ বলা "
        "কারণ আছে শুধু তখন যা এসে চার ছিল যদি আবার কোটি উত্তর সামনে "
        "উপর বক্তব্য এত প্রাথমিক উপরে আছে প্রতি কাজে যখন খুব বহু গেল "
        "পেয়্র্ চালু ই নাগাদ থাকা পাচ যাওয়া রকম সাধারণ কমনে "
    ).split()
)
