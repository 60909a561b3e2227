"""Phonetic encoders backing the reference's analysis/phonetic module
(``lucene/analysis/phonetic/src/java/.../PhoneticFilter.java``,
``DoubleMetaphoneFilter.java``).  The reference delegates the encoding
itself to Apache commons-codec's language package; these are pure-Python
re-implementations of those published algorithms (Soundex, Refined
Soundex, Metaphone, Double Metaphone, Caverphone 2.0, NYSIIS, Kölner
Phonetik), pinned by the reference's TestPhoneticFilter /
TestDoubleMetaphoneFilter goldens plus the algorithms' published test
vectors.

All encoders take a single token and return its code ("" when nothing
encodable); ``double_metaphone`` returns ``(primary, alternate)``.
"""

from __future__ import annotations

__all__ = [
    "soundex",
    "refined_soundex",
    "metaphone",
    "double_metaphone",
    "caverphone2",
    "nysiis",
    "cologne",
    "ENCODERS",
]

_VOWELS = "AEIOU"


def _clean(s: str) -> str:
    """Uppercase and keep letters only (SoundexUtils.clean role)."""
    return "".join(ch for ch in s.upper() if ch.isalpha())


# --------------------------------------------------------------------------
# Soundex (American Soundex, commons-codec Soundex US_ENGLISH semantics)
# --------------------------------------------------------------------------

_SOUNDEX_MAP = "01230120022455012623010202"  # A..Z


def _soundex_map(ch: str) -> str:
    i = ord(ch) - 65
    return _SOUNDEX_MAP[i] if 0 <= i < 26 else ""


def soundex(term: str) -> str:
    """American Soundex with the H/W pass-through rule: letters coding
    equal on both sides of an H or W collapse to one code."""
    s = _clean(term)
    if not s:
        return ""

    def mapping_code(idx: int) -> str:
        mapped = _soundex_map(s[idx])
        if idx > 1 and mapped != "0":
            hw = s[idx - 1]
            if hw in "HW":
                pre = s[idx - 2]
                if _soundex_map(pre) == mapped or pre in "HW":
                    return ""  # swallowed (the \0 return)
        return mapped

    out = [s[0], "0", "0", "0"]
    last = mapping_code(0)
    count, incount = 1, 1
    while incount < len(s) and count < 4:
        mapped = mapping_code(incount)
        incount += 1
        if mapped:  # '\0' (here "") leaves `last` untouched
            if mapped != "0" and mapped != last:
                out[count] = mapped
                count += 1
            last = mapped
    return "".join(out)


# --------------------------------------------------------------------------
# Refined Soundex
# --------------------------------------------------------------------------

_REFINED_MAP = "01360240043788015936020505"  # A..Z


def refined_soundex(term: str) -> str:
    s = _clean(term)
    if not s:
        return ""
    out = [s[0]]
    last = "*"
    for ch in s:
        i = ord(ch) - 65
        cur = _REFINED_MAP[i] if 0 <= i < 26 else ""
        if cur == last:
            continue
        if cur:
            out.append(cur)
        last = cur
    return "".join(out)


# --------------------------------------------------------------------------
# Metaphone (Lawrence Philips 1990; commons-codec semantics, max code 4)
# --------------------------------------------------------------------------

_FRONTV = "EIY"
_VARSON = "CSPTG"


def metaphone(term: str, max_code_len: int = 4) -> str:
    if not term:
        return ""
    if len(term) == 1:
        return term.upper()
    inwd = term.upper()

    # initial-two-letter exceptions
    if inwd[0] in "KGP" and inwd[1] == "N":
        local = inwd[1:]
    elif inwd[0] == "A" and inwd[1] == "E":
        local = inwd[1:]
    elif inwd[0] == "W" and inwd[1] == "R":
        local = inwd[1:]
    elif inwd[0] == "W" and inwd[1] == "H":
        local = "W" + inwd[2:]
    elif inwd[0] == "X":
        local = "S" + inwd[1:]
    else:
        local = inwd

    wdsz = len(local)
    code: list[str] = []
    n = 0

    def is_vowel(i: int) -> bool:
        return 0 <= i < wdsz and local[i] in _VOWELS

    def prev_is(i: int, c: str) -> bool:
        return i > 0 and local[i - 1] == c

    def next_is(i: int, c: str) -> bool:
        return i + 1 < wdsz and local[i + 1] == c

    def region(i: int, test: str) -> bool:
        return local.startswith(test, i)

    def is_last(i: int) -> bool:
        return i + 1 == wdsz

    while len(code) < max_code_len and n < wdsz:
        symb = local[n]
        if symb != "C" and prev_is(n, symb):
            n += 1
            continue
        if symb in _VOWELS:
            if n == 0:
                code.append(symb)
        elif symb == "B":
            if not (is_last(n) and prev_is(n, "M")):
                code.append(symb)
        elif symb == "C":
            if (
                prev_is(n, "S")
                and not is_last(n)
                and local[n + 1] in _FRONTV
            ):
                pass  # SCE/SCI/SCY: dropped
            elif region(n, "CIA"):
                code.append("X")
            elif not is_last(n) and local[n + 1] in _FRONTV:
                code.append("S")
            elif prev_is(n, "S") and next_is(n, "H"):
                code.append("K")
            elif next_is(n, "H"):
                # initial CH with a vowel at index 2 hardens to K
                # (CHARACTER → KRKTR); any other CH → X (TEACH → TX)
                if n == 0 and wdsz >= 3 and is_vowel(2):
                    code.append("K")
                else:
                    code.append("X")
            else:
                code.append("K")
        elif symb == "D":
            if (
                not is_last(n + 1)
                and next_is(n, "G")
                and local[n + 2] in _FRONTV
            ):
                code.append("J")
                n += 2
            else:
                code.append("T")
        elif symb == "G":
            silent = False
            if is_last(n + 1) and next_is(n, "H"):
                silent = True
            if (
                not is_last(n + 1)
                and next_is(n, "H")
                and not is_vowel(n + 2)
            ):
                silent = True
            if n > 0 and (region(n, "GN") or region(n, "GNED")):
                silent = True
            hard = prev_is(n, "G")
            if not silent:
                if (
                    not is_last(n)
                    and local[n + 1] in _FRONTV
                    and not hard
                ):
                    code.append("J")
                else:
                    code.append("K")
        elif symb == "H":
            if is_last(n):
                pass  # terminal H
            elif n > 0 and local[n - 1] in _VARSON:
                pass
            elif is_vowel(n + 1):
                code.append("H")
        elif symb in "FJLMNR":
            code.append(symb)
        elif symb == "K":
            if n > 0:
                if not prev_is(n, "C"):
                    code.append(symb)
            else:
                code.append(symb)
        elif symb == "P":
            code.append("F" if next_is(n, "H") else symb)
        elif symb == "Q":
            code.append("K")
        elif symb == "S":
            if region(n, "SH") or region(n, "SIO") or region(n, "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif symb == "T":
            if region(n, "TIA") or region(n, "TIO"):
                code.append("X")
            elif region(n, "TCH"):
                pass
            elif region(n, "TH"):
                code.append("0")
            else:
                code.append("T")
        elif symb == "V":
            code.append("F")
        elif symb in "WY":
            if not is_last(n) and is_vowel(n + 1):
                code.append(symb)
        elif symb == "X":
            code.append("K")
            code.append("S")
        elif symb == "Z":
            code.append("S")
        n += 1
    return "".join(code[:max_code_len])


# --------------------------------------------------------------------------
# Caverphone 2.0 (David Hood, Caversham project, 2004 revision)
# --------------------------------------------------------------------------

import re as _re

_CAVERPHONE2_RULES: tuple[tuple[str, str], ...] = (
    ("e$", ""),
    ("^cough", "cou2f"),
    ("^rough", "rou2f"),
    ("^tough", "tou2f"),
    ("^enough", "enou2f"),
    ("^trough", "trou2f"),
    ("^gn", "2n"),
    ("mb$", "m2"),
    ("cq", "2q"),
    ("ci", "si"),
    ("ce", "se"),
    ("cy", "sy"),
    ("tch", "2ch"),
    ("c", "k"),
    ("q", "k"),
    ("x", "k"),
    ("v", "f"),
    ("dg", "2g"),
    ("tio", "sio"),
    ("tia", "sia"),
    ("d", "t"),
    ("ph", "fh"),
    ("b", "p"),
    ("sh", "s2"),
    ("z", "s"),
    ("^[aeiou]", "A"),
    ("[aeiou]", "3"),
    ("j", "y"),
    ("^y3", "Y3"),
    ("^y", "A"),
    ("y", "3"),
    ("3gh3", "3kh3"),
    ("gh", "22"),
    ("g", "k"),
    ("s+", "S"),
    ("t+", "T"),
    ("p+", "P"),
    ("k+", "K"),
    ("f+", "F"),
    ("m+", "M"),
    ("n+", "N"),
    ("w3", "W3"),
    ("wh3", "Wh3"),
    ("w$", "3"),
    ("w", "2"),
    ("^h", "A"),
    ("h", "2"),
    ("r3", "R3"),
    ("r$", "3"),
    ("r", "2"),
    ("l3", "L3"),
    ("l$", "3"),
    ("l", "2"),
    ("2", ""),
    ("3$", "A"),
    ("3", ""),
)


def caverphone2(term: str) -> str:
    txt = _re.sub(r"[^a-z]", "", term.lower())
    if not txt:
        return "1111111111"
    for pat, repl in _CAVERPHONE2_RULES:
        txt = _re.sub(pat, repl, txt)
    return (txt + "1111111111")[:10]


# --------------------------------------------------------------------------
# NYSIIS (New York State Identification and Intelligence System; strict
# 6-char variant — the commons-codec default)
# --------------------------------------------------------------------------


def _nysiis_transcode(prev: str, curr: str, nxt: str, anext: str) -> str:
    if curr == "E" and nxt == "V":
        return "AF"
    if curr in _VOWELS:
        return "A"
    if curr == "Q":
        return "G"
    if curr == "Z":
        return "S"
    if curr == "M":
        return "N"
    if curr == "K":
        return "NN" if nxt == "N" else "C"
    if curr == "S" and nxt == "C" and anext == "H":
        return "SSS"
    if curr == "P" and nxt == "H":
        return "FF"
    if curr == "H" and (prev not in _VOWELS or nxt not in _VOWELS):
        return prev
    if curr == "W" and prev in _VOWELS:
        return prev
    return curr


def nysiis(term: str, strict: bool = True) -> str:
    s = _clean(term)
    if not s:
        return ""
    # first-characters transcode
    if s.startswith("MAC"):
        s = "MCC" + s[3:]
    elif s.startswith("KN"):
        s = "NN" + s[2:]
    elif s.startswith("K"):
        s = "C" + s[1:]
    elif s.startswith(("PH", "PF")):
        s = "FF" + s[2:]
    elif s.startswith("SCH"):
        s = "SSS" + s[3:]
    # last-characters transcode
    if s.endswith(("EE", "IE")):
        s = s[:-2] + "Y"
    elif s.endswith(("DT", "RT", "RD", "NT", "ND")):
        s = s[:-2] + "D"
    key = [s[0]]
    chars = list(s)
    for i in range(1, len(chars)):
        nxt = chars[i + 1] if i < len(chars) - 1 else " "
        anext = chars[i + 2] if i < len(chars) - 2 else " "
        trans = _nysiis_transcode(chars[i - 1], chars[i], nxt, anext)
        # in-place overwrite, exactly the reference's arraycopy
        for j, tc in enumerate(trans):
            if i + j < len(chars):
                chars[i + j] = tc
        if chars[i] != chars[i - 1]:
            key.append(chars[i])
    if len(key) > 1:
        if key[-1] == "S":
            key.pop()
        if len(key) > 2 and key[-2] == "A" and key[-1] == "Y":
            del key[-2]
        if key and key[-1] == "A":
            key.pop()
    out = "".join(key)
    return out[:6] if strict else out


# --------------------------------------------------------------------------
# Kölner Phonetik (Postel 1969) — the ColognePhonetic encoder
# --------------------------------------------------------------------------

_COLOGNE_SIMPLE = {
    "A": "0", "E": "0", "I": "0", "J": "0", "O": "0", "U": "0", "Y": "0",
    "B": "1",
    "F": "3", "V": "3", "W": "3",
    "G": "4", "K": "4", "Q": "4",
    "L": "5",
    "M": "6", "N": "6",
    "R": "7",
    "S": "8", "Z": "8",
}
_COLOGNE_FOLD = {"Ä": "A", "Ö": "O", "Ü": "U", "ß": "S"}


def cologne(term: str) -> str:
    s = "".join(_COLOGNE_FOLD.get(c, c) for c in term.upper())
    s = "".join(c for c in s if "A" <= c <= "Z")
    if not s:
        return ""
    codes: list[str] = []
    n = len(s)
    for i, ch in enumerate(s):
        prev = s[i - 1] if i > 0 else ""
        nxt = s[i + 1] if i + 1 < n else ""
        if ch in _COLOGNE_SIMPLE:
            codes.append(_COLOGNE_SIMPLE[ch])
        elif ch == "H":
            codes.append("")  # H carries no code
        elif ch == "P":
            codes.append("3" if nxt == "H" else "1")
        elif ch in "DT":
            codes.append("8" if (nxt and nxt in "CSZ") else "2")
        elif ch == "X":
            codes.append("8" if (prev and prev in "CKQ") else "48")
        elif ch == "C":
            if i == 0:
                codes.append("4" if (nxt and nxt in "AHKLOQRUX") else "8")
            elif prev in "SZ":
                codes.append("8")
            elif nxt and nxt in "AHKOQUX":
                codes.append("4")
            else:
                codes.append("8")
        else:
            codes.append("")
    # collapse adjacent duplicates, then drop non-leading zeros
    flat = "".join(codes)
    dedup = []
    for c in flat:
        if not dedup or dedup[-1] != c:
            dedup.append(c)
    out = [c for k, c in enumerate(dedup) if c != "0" or k == 0]
    return "".join(out)


# resolved at import time below (double_metaphone defined in this module)
ENCODERS: dict[str, object] = {}


# --------------------------------------------------------------------------
# Double Metaphone (Lawrence Philips, C/C++ Users Journal 2000; the
# commons-codec encoder the reference's DoubleMetaphoneFilter wraps)
# --------------------------------------------------------------------------

_DM_VOWELS = "AEIOUY"
_DM_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_DM_ES_EP = ("ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER")
_DM_L_T_K = ("L", "T", "K", "S", "N", "M", "B", "Z")


class _DMResult:
    def __init__(self, max_len: int):
        self.max_len = max_len
        self.primary: list[str] = []
        self.alternate: list[str] = []

    def append(self, p: str, a: str | None = None) -> None:
        self.append_primary(p)
        self.append_alternate(p if a is None else a)

    def append_primary(self, s: str) -> None:
        for ch in s:
            if len(self.primary) < self.max_len:
                self.primary.append(ch)

    def append_alternate(self, s: str) -> None:
        for ch in s:
            if len(self.alternate) < self.max_len:
                self.alternate.append(ch)

    @property
    def complete(self) -> bool:
        return (
            len(self.primary) >= self.max_len
            and len(self.alternate) >= self.max_len
        )


def _dm_char(value: str, i: int) -> str:
    return value[i] if 0 <= i < len(value) else "\0"


def _dm_vowel(value: str, i: int) -> bool:
    return 0 <= i < len(value) and value[i] in _DM_VOWELS


def _dm_has(value: str, start: int, length: int, *criteria: str) -> bool:
    if start < 0 or start + length > len(value):
        return False
    return value[start : start + length] in criteria


def double_metaphone(term: str, max_code_len: int = 4) -> tuple[str, str]:
    """(primary, alternate) codes."""
    value = term.strip().upper()
    if not value:
        return ("", "")
    slavo = (
        "W" in value or "K" in value or "CZ" in value or "WITZ" in value
    )
    r = _DMResult(max_code_len)
    index = 1 if value.startswith(_DM_SILENT_START) else 0
    n = len(value)
    while not r.complete and index < n:
        ch = value[index]
        if ch in _DM_VOWELS:
            if index == 0:
                r.append("A")
            index += 1
        elif ch == "B":
            r.append("P")
            index += 2 if _dm_char(value, index + 1) == "B" else 1
        elif ch == "Ç":  # Ç
            r.append("S")
            index += 1
        elif ch == "C":
            index = _dm_c(value, r, index)
        elif ch == "D":
            if _dm_has(value, index, 2, "DG"):
                if _dm_has(value, index + 2, 1, "I", "E", "Y"):
                    r.append("J")
                    index += 3
                else:
                    r.append("TK")
                    index += 2
            elif _dm_has(value, index, 2, "DT", "DD"):
                r.append("T")
                index += 2
            else:
                r.append("T")
                index += 1
        elif ch == "F":
            r.append("F")
            index += 2 if _dm_char(value, index + 1) == "F" else 1
        elif ch == "G":
            index = _dm_g(value, r, index, slavo)
        elif ch == "H":
            if (index == 0 or _dm_vowel(value, index - 1)) and _dm_vowel(
                value, index + 1
            ):
                r.append("H")
                index += 2
            else:
                index += 1
        elif ch == "J":
            index = _dm_j(value, r, index, slavo)
        elif ch == "K":
            r.append("K")
            index += 2 if _dm_char(value, index + 1) == "K" else 1
        elif ch == "L":
            if _dm_char(value, index + 1) == "L":
                if _dm_l0(value, index):
                    r.append_primary("L")
                else:
                    r.append("L")
                index += 2
            else:
                r.append("L")
                index += 1
        elif ch == "M":
            r.append("M")
            cond = _dm_char(value, index + 1) == "M" or (
                _dm_has(value, index - 1, 3, "UMB")
                and (
                    index + 1 == n - 1
                    or _dm_has(value, index + 2, 2, "ER")
                )
            )
            index += 2 if cond else 1
        elif ch == "N":
            r.append("N")
            index += 2 if _dm_char(value, index + 1) == "N" else 1
        elif ch == "Ñ":  # Ñ
            r.append("N")
            index += 1
        elif ch == "P":
            if _dm_char(value, index + 1) == "H":
                r.append("F")
                index += 2
            else:
                r.append("P")
                index += (
                    2 if _dm_char(value, index + 1) in ("P", "B") else 1
                )
        elif ch == "Q":
            r.append("K")
            index += 2 if _dm_char(value, index + 1) == "Q" else 1
        elif ch == "R":
            if (
                index == n - 1
                and not slavo
                and _dm_has(value, index - 2, 2, "IE")
                and not _dm_has(value, index - 4, 2, "ME", "MA")
            ):
                r.append_alternate("R")
            else:
                r.append("R")
            index += 2 if _dm_char(value, index + 1) == "R" else 1
        elif ch == "S":
            index = _dm_s(value, r, index, slavo)
        elif ch == "T":
            index = _dm_t(value, r, index)
        elif ch == "V":
            r.append("F")
            index += 2 if _dm_char(value, index + 1) == "V" else 1
        elif ch == "W":
            index = _dm_w(value, r, index)
        elif ch == "X":
            if index == 0:
                r.append("S")
                index += 1
            else:
                if not (
                    index == n - 1
                    and (
                        _dm_has(value, index - 3, 3, "IAU", "EAU")
                        or _dm_has(value, index - 2, 2, "AU", "OU")
                    )
                ):
                    r.append("KS")
                index += (
                    2 if _dm_char(value, index + 1) in ("C", "X") else 1
                )
        elif ch == "Z":
            if _dm_char(value, index + 1) == "H":
                r.append("J")
                index += 2
            else:
                if _dm_has(value, index + 1, 2, "ZO", "ZI", "ZA") or (
                    slavo
                    and index > 0
                    and _dm_char(value, index - 1) != "T"
                ):
                    r.append("S", "TS")
                else:
                    r.append("S")
                index += 2 if _dm_char(value, index + 1) == "Z" else 1
        else:
            index += 1
    return "".join(r.primary), "".join(r.alternate)


def _dm_c0(value: str, index: int) -> bool:
    """Germanic 'ACH' hardening."""
    if _dm_has(value, index, 4, "CHIA"):
        return True
    if index <= 1:
        return False
    if _dm_vowel(value, index - 2):
        return False
    if not _dm_has(value, index - 1, 3, "ACH"):
        return False
    c = _dm_char(value, index + 2)
    return (c != "I" and c != "E") or _dm_has(
        value, index - 2, 6, "BACHER", "MACHER"
    )


def _dm_c(value: str, r: _DMResult, index: int) -> int:
    if _dm_c0(value, index):
        r.append("K")
        return index + 2
    if index == 0 and _dm_has(value, index, 6, "CAESAR"):
        r.append("S")
        return index + 2
    if _dm_has(value, index, 2, "CH"):
        return _dm_ch(value, r, index)
    if _dm_has(value, index, 2, "CZ") and not _dm_has(
        value, index - 2, 4, "WICZ"
    ):
        r.append("S", "X")
        return index + 2
    if _dm_has(value, index + 1, 3, "CIA"):
        r.append("X")
        return index + 3
    if _dm_has(value, index, 2, "CC") and not (
        index == 1 and _dm_char(value, 0) == "M"
    ):
        return _dm_cc(value, r, index)
    if _dm_has(value, index, 2, "CK", "CG", "CQ"):
        r.append("K")
        return index + 2
    if _dm_has(value, index, 2, "CI", "CE", "CY"):
        if _dm_has(value, index, 3, "CIO", "CIE", "CIA"):
            r.append("S", "X")
        else:
            r.append("S")
        return index + 2
    r.append("K")
    if _dm_has(value, index + 1, 2, " C", " Q", " G"):
        return index + 3
    if _dm_has(value, index + 1, 1, "C", "K", "Q") and not _dm_has(
        value, index + 1, 2, "CE", "CI"
    ):
        return index + 2
    return index + 1


def _dm_cc(value: str, r: _DMResult, index: int) -> int:
    if _dm_has(value, index + 2, 1, "I", "E", "H") and not _dm_has(
        value, index + 2, 2, "HU"
    ):
        if (index == 1 and _dm_char(value, index - 1) == "A") or _dm_has(
            value, index - 1, 5, "UCCEE", "UCCES"
        ):
            r.append("KS")
        else:
            r.append("X")
        return index + 3
    r.append("K")
    return index + 2


def _dm_ch(value: str, r: _DMResult, index: int) -> int:
    if index > 0 and _dm_has(value, index, 4, "CHAE"):
        r.append("K", "X")
        return index + 2
    if _dm_ch0(value, index):
        r.append("K")
        return index + 2
    if _dm_ch1(value, index):
        r.append("K")
        return index + 2
    if index > 0:
        if _dm_has(value, 0, 2, "MC"):
            r.append("K")
        else:
            r.append("X", "K")
    else:
        r.append("X")
    return index + 2


def _dm_ch0(value: str, index: int) -> bool:
    """Greek roots: CHARAC/CHARIS/CHOR/CHYM/CHIA/CHEM (not CHORE)."""
    if index != 0:
        return False
    if not _dm_has(value, index + 1, 5, "HARAC", "HARIS") and not _dm_has(
        value, index + 1, 3, "HOR", "HYM", "HIA", "HEM"
    ):
        return False
    if _dm_has(value, 0, 5, "CHORE"):
        return False
    return True


def _dm_ch1(value: str, index: int) -> bool:
    """Germanic/Greek 'CH' → K contexts."""
    return (
        _dm_has(value, 0, 4, "VAN ", "VON ")
        or _dm_has(value, 0, 3, "SCH")
        or _dm_has(value, index - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
        or _dm_has(value, index + 2, 1, "T", "S")
        or (
            (
                _dm_has(value, index - 1, 1, "A", "O", "U", "E")
                or index == 0
            )
            and (
                _dm_has(
                    value, index + 2, 1,
                    "L", "R", "N", "M", "B", "H", "F", "V", "W", " ",
                )
                or index + 1 == len(value) - 1
            )
        )
    )


def _dm_g(value: str, r: _DMResult, index: int, slavo: bool) -> int:
    nxt = _dm_char(value, index + 1)
    if nxt == "H":
        return _dm_gh(value, r, index)
    if nxt == "N":
        if index == 1 and _dm_vowel(value, 0) and not slavo:
            r.append("KN", "N")
        elif (
            not _dm_has(value, index + 2, 2, "EY")
            and nxt != "Y"
            and not slavo
        ):
            r.append("N", "KN")
        else:
            r.append("KN")
        return index + 2
    if _dm_has(value, index + 1, 2, "LI") and not slavo:
        r.append("KL", "L")
        return index + 2
    if index == 0 and (
        nxt == "Y" or _dm_has(value, index + 1, 2, *_DM_ES_EP)
    ):
        r.append("K", "J")
        return index + 2
    if (
        (_dm_has(value, index + 1, 2, "ER") or nxt == "Y")
        and not _dm_has(value, 0, 6, "DANGER", "RANGER", "MANGER")
        and not _dm_has(value, index - 1, 1, "E", "I")
        and not _dm_has(value, index - 1, 3, "RGY", "OGY")
    ):
        r.append("K", "J")
        return index + 2
    if _dm_has(value, index + 1, 1, "E", "I", "Y") or _dm_has(
        value, index - 1, 4, "AGGI", "OGGI"
    ):
        if (
            _dm_has(value, 0, 4, "VAN ", "VON ")
            or _dm_has(value, 0, 3, "SCH")
            or _dm_has(value, index + 1, 2, "ET")
        ):
            r.append("K")
        elif _dm_has(value, index + 1, 3, "IER"):
            r.append("J")
        else:
            r.append("J", "K")
        return index + 2
    if nxt == "G":
        r.append("K")
        return index + 2
    r.append("K")
    return index + 1


def _dm_gh(value: str, r: _DMResult, index: int) -> int:
    if index > 0 and not _dm_vowel(value, index - 1):
        r.append("K")
        return index + 2
    if index == 0:
        if _dm_char(value, index + 2) == "I":
            r.append("J")
        else:
            r.append("K")
        return index + 2
    if (
        (index > 1 and _dm_has(value, index - 2, 1, "B", "H", "D"))
        or (index > 2 and _dm_has(value, index - 3, 1, "B", "H", "D"))
        or (index > 3 and _dm_has(value, index - 4, 1, "B", "H"))
    ):
        return index + 2
    if (
        index > 2
        and _dm_char(value, index - 1) == "U"
        and _dm_has(value, index - 3, 1, "C", "G", "L", "R", "T")
    ):
        r.append("F")
    elif index > 0 and _dm_char(value, index - 1) != "I":
        r.append("K")
    return index + 2


def _dm_j(value: str, r: _DMResult, index: int, slavo: bool) -> int:
    if _dm_has(value, index, 4, "JOSE") or _dm_has(value, 0, 4, "SAN "):
        if (
            index == 0
            and (
                _dm_char(value, index + 4) == " " or len(value) == 4
            )
        ) or _dm_has(value, 0, 4, "SAN "):
            r.append("H")
        else:
            r.append("J", "H")
        return index + 1
    if index == 0:
        r.append("J", "A")
    elif (
        _dm_vowel(value, index - 1)
        and not slavo
        and _dm_char(value, index + 1) in ("A", "O")
    ):
        r.append("J", "H")
    elif index == len(value) - 1:
        r.append("J", " ")
    elif not _dm_has(value, index + 1, 1, *_DM_L_T_K) and not _dm_has(
        value, index - 1, 1, "S", "K", "L"
    ):
        r.append("J")
    return index + 2 if _dm_char(value, index + 1) == "J" else index + 1


def _dm_l0(value: str, index: int) -> bool:
    """Spanish 'LL' → silent in the primary."""
    last = len(value) - 1
    if index == len(value) - 3 and _dm_has(
        value, index - 1, 4, "ILLO", "ILLA", "ALLE"
    ):
        return True
    if (
        _dm_has(value, last - 1, 2, "AS", "OS")
        or _dm_has(value, last, 1, "A", "O")
    ) and _dm_has(value, index - 1, 4, "ALLE"):
        return True
    return False


def _dm_s(value: str, r: _DMResult, index: int, slavo: bool) -> int:
    if _dm_has(value, index - 1, 3, "ISL", "YSL"):
        return index + 1
    if index == 0 and _dm_has(value, index, 5, "SUGAR"):
        r.append("X", "S")
        return index + 1
    if _dm_has(value, index, 2, "SH"):
        if _dm_has(value, index + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            r.append("S")
        else:
            r.append("X")
        return index + 2
    if _dm_has(value, index, 3, "SIO", "SIA") or _dm_has(
        value, index, 4, "SIAN"
    ):
        if slavo:
            r.append("S")
        else:
            r.append("S", "X")
        return index + 3
    if (
        index == 0 and _dm_has(value, index + 1, 1, "M", "N", "L", "W")
    ) or _dm_has(value, index + 1, 1, "Z"):
        r.append("S", "X")
        return index + 2 if _dm_has(value, index + 1, 1, "Z") else index + 1
    if _dm_has(value, index, 2, "SC"):
        return _dm_sc(value, r, index)
    if index == len(value) - 1 and _dm_has(value, index - 2, 2, "AI", "OI"):
        r.append_alternate("S")
    else:
        r.append("S")
    return index + 2 if _dm_has(value, index + 1, 1, "S", "Z") else index + 1


def _dm_sc(value: str, r: _DMResult, index: int) -> int:
    if _dm_char(value, index + 2) == "H":
        if _dm_has(value, index + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
            if _dm_has(value, index + 3, 2, "ER", "EN"):
                r.append("X", "SK")
            else:
                r.append("SK")
            return index + 3
        if (
            index == 0
            and not _dm_vowel(value, 3)
            and _dm_char(value, 3) != "W"
        ):
            r.append("X", "S")
        else:
            r.append("X")
        return index + 3
    if _dm_has(value, index + 2, 1, "I", "E", "Y"):
        r.append("S")
        return index + 3
    r.append("SK")
    return index + 3


def _dm_t(value: str, r: _DMResult, index: int) -> int:
    if _dm_has(value, index, 4, "TION"):
        r.append("X")
        return index + 3
    if _dm_has(value, index, 3, "TIA", "TCH"):
        r.append("X")
        return index + 3
    if _dm_has(value, index, 2, "TH") or _dm_has(value, index, 3, "TTH"):
        if (
            _dm_has(value, index + 2, 2, "OM", "AM")
            or _dm_has(value, 0, 4, "VAN ", "VON ")
            or _dm_has(value, 0, 3, "SCH")
        ):
            r.append("T")
        else:
            r.append("0", "T")
        return index + 2
    r.append("T")
    return index + 2 if _dm_has(value, index + 1, 1, "T", "D") else index + 1


def _dm_w(value: str, r: _DMResult, index: int) -> int:
    if _dm_has(value, index, 2, "WR"):
        r.append("R")
        return index + 2
    if index == 0 and (
        _dm_vowel(value, index + 1) or _dm_has(value, index, 2, "WH")
    ):
        if _dm_vowel(value, index + 1):
            r.append("A", "F")
        else:
            r.append("A")
    if (
        (index == len(value) - 1 and _dm_vowel(value, index - 1))
        or _dm_has(value, index - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
        or _dm_has(value, 0, 3, "SCH")
    ):
        r.append_alternate("F")
        return index + 1
    if _dm_has(value, index, 4, "WICZ", "WITZ"):
        r.append("TS", "FX")
        return index + 4
    return index + 1


ENCODERS.update(
    {
        "soundex": soundex,
        "refined_soundex": refined_soundex,
        "metaphone": metaphone,
        "caverphone2": caverphone2,
        "nysiis": nysiis,
        "cologne": cologne,
    }
)


def soundex_sql_expr(col: str = "term") -> str:
    """DuckDB twin of ``soundex`` in replace-filter position: the code
    when encodable and different, else the original token.  The H/W rule
    is modeled as "strip H/W after the first letter, then collapse
    same-digit runs" — exact for the equal-code-across-H/W swallow (the
    removed H/W makes the equal codes adjacent, and the run collapse
    eats them), but the rarer swallow whose *pre-pre* char is itself
    H/W (e.g. 'FHHK') needs RE2 lookbehind and is NOT modeled;
    tests/test_phonetic.py asserts the twin agrees with the exact
    Python encoder on every term of the gate corpora."""
    letters = f"regexp_replace(upper({col}), '[^A-Z]', '', 'g')"
    first = f"substr({letters}, 1, 1)"
    rest = f"regexp_replace(substr({letters}, 2), '[HW]', '', 'g')"
    codes = (
        f"translate({first} || {rest}, "
        "'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '01230120022455012623010202')"
    )
    dedup = codes
    for d in "0123456":
        dedup = f"regexp_replace({dedup}, '{d}{d}+', '{d}', 'g')"
    tail = f"replace(substr({dedup}, 2), '0', '')"
    code = f"substr({first} || {tail} || '000', 1, 4)"
    return (
        f"CASE WHEN {letters} = '' THEN {col} "
        f"WHEN {code} = {col} THEN {col} ELSE {code} END"
    )


# --------------------------------------------------------------------------
# Daitch–Mokotoff Soundex (Daitch & Mokotoff 1985, the standard published
# coding table; branching alternatives produce MULTIPLE codes per word —
# the commons-codec encoder behind DaitchMokotoffSoundexFilter)
# --------------------------------------------------------------------------

#: pattern -> (at_start, before_vowel, other); each context is a tuple of
#: alternatives ("" = no code); adjacent identical codes collapse unless
#: something (e.g. an uncoded vowel) resets the run, and directly
#: adjacent M/N force both codes (the 'MN'/'NM' = 66 rule)
_DM_RULES_LIST: tuple[tuple[str, tuple, tuple, tuple], ...] = tuple(
    (pat, s if isinstance(s, tuple) else (s,), v if isinstance(v, tuple) else (v,), o if isinstance(o, tuple) else (o,))
    for pat, s, v, o in [
        ("ai", "0", "1", ""), ("aj", "0", "1", ""), ("ay", "0", "1", ""),
        ("au", "0", "7", ""),
        ("a", "0", "", ""),
        ("b", "7", "7", "7"),
        ("chs", "5", "54", "54"),
        ("ch", ("4", "5"), ("4", "5"), ("4", "5")),
        ("ck", ("5", "45"), ("5", "45"), ("5", "45")),
        ("cz", "4", "4", "4"), ("cs", "4", "4", "4"),
        ("csz", "4", "4", "4"), ("czs", "4", "4", "4"),
        ("c", ("4", "5"), ("4", "5"), ("4", "5")),
        ("drz", "4", "4", "4"), ("drs", "4", "4", "4"),
        ("ds", "4", "4", "4"), ("dsh", "4", "4", "4"),
        ("dsz", "4", "4", "4"),
        ("dz", "4", "4", "4"), ("dzh", "4", "4", "4"),
        ("dzs", "4", "4", "4"),
        ("dt", "3", "3", "3"), ("d", "3", "3", "3"),
        ("ei", "0", "1", ""), ("ej", "0", "1", ""), ("ey", "0", "1", ""),
        ("eu", "1", "1", ""),
        ("e", "0", "", ""),
        ("fb", "7", "7", "7"), ("f", "7", "7", "7"),
        ("g", "5", "5", "5"),
        ("h", "5", "5", ""),
        ("ia", "1", "", ""), ("ie", "1", "", ""),
        ("io", "1", "", ""), ("iu", "1", "", ""),
        ("i", "0", "", ""),
        ("j", ("1", "4"), ("1", "4"), ("1", "4")),
        ("ks", "5", "54", "54"),
        ("kh", "5", "5", "5"), ("k", "5", "5", "5"),
        ("l", "8", "8", "8"),
        ("m", "6", "6", "6"), ("n", "6", "6", "6"),
        ("oi", "0", "1", ""), ("oj", "0", "1", ""), ("oy", "0", "1", ""),
        ("o", "0", "", ""),
        ("pf", "7", "7", "7"), ("ph", "7", "7", "7"), ("p", "7", "7", "7"),
        ("q", "5", "5", "5"),
        ("rs", ("94", "4"), ("94", "4"), ("94", "4")),
        ("rz", ("94", "4"), ("94", "4"), ("94", "4")),
        ("r", "9", "9", "9"),
        ("schtsch", "2", "4", "4"), ("schtsh", "2", "4", "4"),
        ("schtch", "2", "4", "4"),
        ("schd", "2", "43", "43"), ("scht", "2", "43", "43"),
        ("sch", "4", "4", "4"),
        ("shtch", "2", "4", "4"), ("shch", "2", "4", "4"),
        ("shtsh", "2", "4", "4"),
        ("sht", "2", "43", "43"), ("shd", "2", "43", "43"),
        ("sh", "4", "4", "4"),
        ("stch", "2", "4", "4"), ("stsch", "2", "4", "4"),
        ("sc", "2", "4", "4"),
        ("strz", "2", "4", "4"), ("strs", "2", "4", "4"),
        ("stsh", "2", "4", "4"),
        ("st", "2", "43", "43"),
        ("szcz", "2", "4", "4"), ("szcs", "2", "4", "4"),
        ("szt", "2", "43", "43"), ("szd", "2", "43", "43"),
        ("sd", "2", "43", "43"),
        ("sz", "4", "4", "4"),
        ("s", "4", "4", "4"),
        ("ttsch", "4", "4", "4"), ("tsch", "4", "4", "4"),
        ("ttch", "4", "4", "4"), ("tch", "4", "4", "4"),
        ("th", "3", "3", "3"),
        ("trz", "4", "4", "4"), ("trs", "4", "4", "4"),
        ("tsh", "4", "4", "4"),
        ("ttsz", "4", "4", "4"), ("tts", "4", "4", "4"),
        ("tsz", "4", "4", "4"), ("ts", "4", "4", "4"),
        ("tc", "4", "4", "4"),
        ("ttz", "4", "4", "4"), ("tzs", "4", "4", "4"),
        ("tz", "4", "4", "4"),
        ("t", "3", "3", "3"),
        ("ui", "0", "1", ""), ("uj", "0", "1", ""), ("uy", "0", "1", ""),
        ("ue", "0", "", ""),
        ("u", "0", "", ""),
        ("v", "7", "7", "7"), ("w", "7", "7", "7"),
        ("x", "5", "54", "54"),
        ("y", "1", "", ""),
        ("zhdzh", "2", "4", "4"), ("zdzh", "2", "4", "4"),
        ("zdz", "2", "4", "4"),
        ("zhd", "2", "43", "43"), ("zd", "2", "43", "43"),
        ("zsch", "4", "4", "4"), ("zsh", "4", "4", "4"),
        ("zh", "4", "4", "4"), ("zs", "4", "4", "4"),
        ("z", "4", "4", "4"),
    ]
)

_DM_BY_FIRST: dict[str, list] = {}
for _r in _DM_RULES_LIST:
    _DM_BY_FIRST.setdefault(_r[0][0], []).append(_r)
for _lst in _DM_BY_FIRST.values():
    _lst.sort(key=lambda r: -len(r[0]))

_DM_CODE_LEN = 6


def daitch_mokotoff(term: str) -> tuple[str, ...]:
    """All branch codes for one word, first-fork-first order, 6 digits
    0-padded; () when nothing encodable."""
    s = "".join(ch for ch in term.lower() if "a" <= ch <= "z")
    if not s:
        return ()
    # branches: (code_so_far, last_replacement)
    branches: list[tuple[str, str | None]] = [("", None)]
    index = 0
    last_char = ""
    while index < len(s):
        ch = s[index]
        rules = _DM_BY_FIRST.get(ch, ())
        matched = None
        for pat, at_start, before_vowel, other in rules:
            if s.startswith(pat, index):
                matched = (pat, at_start, before_vowel, other)
                break
        if matched is None:
            last_char = ch
            index += 1
            continue
        pat, at_start, before_vowel, other = matched
        if index == 0:
            reps = at_start
        elif (
            index + len(pat) < len(s)
            and s[index + len(pat)] in "aeiou"
        ):
            reps = before_vowel
        else:
            reps = other
        # 'mn'/'nm' force both codes even when adjacent (the 66 rule)
        force = (last_char == "m" and ch == "n") or (
            last_char == "n" and ch == "m"
        )
        nxt: list[tuple[str, str | None]] = []
        seen: set[tuple[str, str | None]] = set()
        for code, last in branches:
            for rep in reps:
                add = last is None or not last.endswith(rep) or force
                ncode = code + rep if add and rep else code
                nb = (ncode, rep)
                if nb not in seen:
                    seen.add(nb)
                    nxt.append(nb)
        branches = nxt
        last_char = ch
        index += len(pat)
    out: list[str] = []
    for code, _last in branches:
        padded = (code + "0" * _DM_CODE_LEN)[:_DM_CODE_LEN]
        if padded not in out:
            out.append(padded)
    return tuple(out)
