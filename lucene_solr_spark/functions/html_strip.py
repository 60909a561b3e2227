"""HTMLStripCharFilter — HTML → text char filter
(``analysis/common/src/java/org/apache/lucene/analysis/charfilter/
HTMLStripCharFilter.jflex``; the .java is jflex-generated).

Scope: a faithful scanner for the documented behaviors — tags
(inline elements vanish, block-level tags and ``<br>`` become ``\\n``,
quote-aware attribute scanning so ``>`` inside attr values doesn't end
the tag), comments (``<!-- -->`` incl. ``<!---...--->``),
``<!``/``<?`` declarations, CDATA sections (content kept),
``<script>``/``<style>`` element removal (content dropped even when the
tag names are in ``escaped_tags``; the content scan is comment- and
quote-aware with backslash escapes, so ``'</script>'`` inside a quoted
string does not terminate — ``TestHTMLStripCharFilter.
testScriptQuotes``), ``escaped_tags`` passing tags through verbatim,
and character entities (the HTML5 named set via the stdlib table,
``;``-terminated only, plus decimal/hex numeric refs). The jflex
machine's recovery behavior on pathologically malformed input (the
``testMalformedHTML`` suite) is NOT reproduced beyond the cases pinned
in ``tests/test_html_strip.py`` — this is a documented subset.

``html_strip_frame`` is the DataFrame seam: an Arrow-batched
``mapInPandas``-free column transform (pandas map over the stripped
scanner — a char filter runs once per document, the same cost class as
tokenization).
"""

from __future__ import annotations

import re

__all__ = ["html_strip", "html_strip_frame", "INLINE_ELEMENTS"]

#: the jflex InlineElment alternation (HTMLStripCharFilter.jflex:117-143)
INLINE_ELEMENTS = frozenset(
    "a b i q s u abbr acronym basefont bdo big cite code dfn em font img"
    " input kbd label samp select small span strike strong sub sup"
    " textarea tt var".split()
)

_TAG_OPEN_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9:._-]*)")


def _scan_quoted(text: str, i: int, quote: str, escapes: bool) -> int:
    """Position just past the closing quote (or EOF)."""
    n = len(text)
    i += 1
    while i < n:
        c = text[i]
        if escapes and c == "\\":
            i += 2
            continue
        if c == quote:
            return i + 1
        i += 1
    return n


def _scan_comment(text: str, i: int) -> int:
    """i at '<!--'; returns position past the matching '-->'. Quoted
    strings (with backslash escapes) hide '-->' — the script/SSI
    comment semantics."""
    n = len(text)
    i += 4
    while i < n:
        c = text[i]
        if c in "'\"":
            i = _scan_quoted(text, i, c, escapes=True)
            continue
        if text.startswith("-->", i):
            return i + 3
        i += 1
    return n


def _scan_tag_end(text: str, i: int) -> int:
    """i inside a tag; returns position past the closing '>' (or EOF).
    Quote-aware: '>' inside attribute values doesn't close."""
    n = len(text)
    while i < n:
        c = text[i]
        if c in "'\"":
            i = _scan_quoted(text, i, c, escapes=False)
            continue
        if c == ">":
            return i + 1
        i += 1
    return n


def _scan_element_content(text: str, i: int, name: str) -> int:
    """Skip <script>/<style> content from ``i`` to past the closing
    ``</name ...>``: comment-aware (quoted strings inside comments hide
    terminators)."""
    n = len(text)
    close = re.compile(r"</\s*%s" % re.escape(name), re.IGNORECASE)
    while i < n:
        if text.startswith("<!--", i):
            i = _scan_comment(text, i)
            continue
        m = close.match(text, i)
        if m:
            return _scan_tag_end(text, m.end())
        i += 1
    return n


def _decode_entity(text: str, i: int):
    """Entity at '&'; returns (decoded, next_index) or None."""
    from html.entities import html5

    n = len(text)
    if i + 1 >= n:
        return None
    if text[i + 1] == "#":
        m = re.match(r"&#(?:[xX]([0-9a-fA-F]+)|([0-9]+));", text[i:])
        if not m:
            return None
        cp = int(m.group(1), 16) if m.group(1) else int(m.group(2))
        if cp == 0 or cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
            return "�", i + m.end()
        return chr(cp), i + m.end()
    m = re.match(r"&([a-zA-Z][a-zA-Z0-9]*);", text[i:])
    if not m:
        return None
    decoded = html5.get(m.group(1) + ";")
    if decoded is None:
        return None
    return decoded, i + m.end()


def html_strip(text: str, escaped_tags=frozenset()) -> str:
    """Strip HTML constructs from ``text`` (see module docstring)."""
    esc = {t.lower() for t in escaped_tags}
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "&":
            got = _decode_entity(text, i)
            if got is not None:
                out.append(got[0])
                i = got[1]
                continue
            out.append(c)
            i += 1
            continue
        if c != "<":
            out.append(c)
            i += 1
            continue
        if text.startswith("<!--", i):
            i = _scan_comment(text, i)
            continue
        if text.startswith("<![CDATA[", i):
            j = text.find("]]>", i + 9)
            out.append(text[i + 9 : n if j == -1 else j])
            i = n if j == -1 else j + 3
            continue
        if text.startswith("<!", i) or text.startswith("<?", i):
            j = text.find(">", i)
            i = n if j == -1 else j + 1
            continue
        m = _TAG_OPEN_RE.match(text, i)
        if m is None:
            out.append(c)  # bare '<'
            i += 1
            continue
        name = m.group(1).lower()
        closing = text[i + 1] == "/"
        end = _scan_tag_end(text, m.end())
        tag_text = text[i:end]
        if name in ("script", "style") and not closing:
            # content always dropped; escaped keeps the tags verbatim
            k = _scan_element_content(text, end, name)
            if name in esc:
                cm = re.search(
                    r"</\s*%s[^>]*>$" % re.escape(name),
                    text[end:k],
                    re.IGNORECASE,
                )
                out.append(tag_text)
                out.append(cm.group(0) if cm else "</%s>" % name)
            else:
                out.append("\n")
            i = k
            continue
        if name in esc:
            out.append(tag_text)
        elif name == "br":
            out.append("\n")  # BR_START/END_TAG_REPLACEMENT
        elif name in INLINE_ELEMENTS:
            pass
        else:
            out.append("\n")  # BLOCK_LEVEL_*_TAG_REPLACEMENT
        i = end
    return "".join(out)


def html_strip_frame(docs, text_col: str = "text", escaped_tags=frozenset()):
    """DataFrame char-filter seam: returns ``docs`` with ``text_col``
    stripped (Arrow-batched pandas map — one scan per document, before
    any tokenizer)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    tags = frozenset(escaped_tags)

    def _strip(s):
        return s.map(lambda t: html_strip("" if t is None else t, tags))

    # module uses `from __future__ import annotations`, so inline hints
    # would reach pandas_udf as strings — set them as real types
    _strip.__annotations__ = {"s": pd.Series, "return": pd.Series}
    strip_udf = pandas_udf(_strip, "string")
    return docs.withColumn(text_col, strip_udf(F.col(text_col)))
