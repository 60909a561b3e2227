"""Shared SQL fragments for the DuckDB correctness oracles.

The driver (CORRECTNESS gate) runs our Spark queries AND these ANSI-SQL
equivalents side-by-side; both must produce identical values. The BM25
formulas here mirror plans.df_executor double mode 1:1 (same literals,
same association order), so the only cross-engine risk is ln()'s last
ulp — covered by the local harness tools/check_correctness.py.
"""

from __future__ import annotations

from lucene_solr_spark.oracle import bm25
from lucene_solr_spark.oracle.smallfloat import LENGTH_TABLE

__all__ = ["norm_lut_sql", "tokens_cte", "index_ctes", "bm25_score_sql", "idf_sql"]


def norm_lut_sql() -> str:
    """256-row inline LUT: (norm, lo, hi, declen).

    ``norm`` = SmallFloat.intToByte4 bucket for raw length in [lo, hi);
    ``declen`` = the float32 decoded length BM25 uses
    (BM25Similarity.java:129-135 LENGTH_TABLE) emitted as exact doubles.
    """
    rows = []
    for b in range(256):
        lo = int(LENGTH_TABLE[b])
        hi = int(LENGTH_TABLE[b + 1]) if b < 255 else 2**62
        declen = float(bm25.LENGTH_TABLE_F32[b])  # exact double of the f32
        rows.append(f"({b},{lo},{hi},{declen!r})")
    return "norm_lut(norm, lo, hi, declen) AS (VALUES " + ",".join(rows) + ")"


def tokens_cte(
    text_col: str = "text",
    table: str = "documents",
    stopwords: tuple = (),
    name: str = "tokens",
    token_regex: str = "[a-z0-9]+",
    elide_regex: str | None = None,
    term_expr=None,
    raw_stop: tuple = (),
    pre_term_expr: str | None = None,
) -> str:
    """Tokenize: documents text is [a-z0-9 ]-clean, so StandardAnalyzer
    tokens == regexp [a-z0-9]+ runs (verified by analyzer parity tests).
    pos is 0-based; with ``stopwords`` the filter runs AFTER position
    assignment, so surviving positions keep gaps (StopFilter /
    FilteringTokenFilter.java:49-63).

    Language-chain hooks (each stage mirrors one token filter, applied
    in the reference's chain order elide → stop → stem):

    - ``token_regex``: override for corpora beyond [a-z0-9 ] (umlauts,
      apostrophe-joined tokens — the MidNumLet rule);
    - ``elide_regex``: anchored first-match article strip applied BEFORE
      the stop filter (ElisionFilter's slot in FrenchAnalyzer);
    - ``term_expr``: a SQL expression over ``term`` — or a sequence of
      them, applied as successive layers (a multi-step stemmer stays
      readable instead of one exploded CASE) — applied AFTER the stop
      filter (the stem filter's slot);
    - ``raw_stop``: a case-insensitive stop applied to RAW tokens BEFORE
      elision — IrishAnalyzer's StopFilter(HYPHENATIONS) slot
      (``ga/IrishAnalyzer.java:121``); positions were already assigned,
      so gaps survive exactly like the engine's ``pre_stop``;
    - ``pre_term_expr``: a SQL expression over ``term`` applied AFTER
      elision but BEFORE the stop filter — the IrishLowerCaseFilter slot
      (the fold must see original casing, the stop set the folded
      term)."""
    stop_sql = ""
    if stopwords:
        # quote-escape: stop sets may contain apostrophes (Irish b'/d'/m')
        stops = ", ".join("'{}'".format(w.replace("'", "''")) for w in sorted(stopwords))
        stop_sql = f" WHERE term NOT IN ({stops})"
    rx = token_regex.replace("'", "''")
    body = f"""SELECT doc_id,
               unnest(regexp_extract_all({text_col}, '{rx}')) AS term,
               generate_subscripts(regexp_extract_all({text_col}, '{rx}'), 1) - 1 AS pos
        FROM {table}"""
    if raw_stop:
        rstops = ", ".join("'{}'".format(w.replace("'", "''")) for w in sorted(raw_stop))
        body = f"""SELECT * FROM ({body}) WHERE lower(term) NOT IN ({rstops})"""
    if elide_regex:
        erx = elide_regex.replace("'", "''")
        body = f"""SELECT doc_id, regexp_replace(term, '{erx}', '') AS term, pos
        FROM ({body})"""
    if pre_term_expr:
        body = f"""SELECT doc_id, {pre_term_expr} AS term, pos
        FROM ({body})"""
    body = f"SELECT * FROM (\n        {body}\n      ){stop_sql}"
    if not term_expr:
        return f"""{name} AS (
      {body}
    )"""
    # Each stemmer layer references `term` many times; nested subqueries
    # would be INLINED by the optimizer, multiplying the expression tree
    # exponentially (a 5-layer cascade OOMs the planner). MATERIALIZED
    # CTEs pin each layer to one evaluation.
    exprs = [term_expr] if isinstance(term_expr, str) else list(term_expr)
    ctes = [f"{name}_l0 AS MATERIALIZED (\n      {body}\n    )"]
    for i, expr in enumerate(exprs):
        ctes.append(
            f"{name}_l{i + 1} AS MATERIALIZED (\n"
            f"      SELECT doc_id, {expr} AS term, pos FROM {name}_l{i}\n"
            f"    )"
        )
    ctes.append(f"{name} AS (SELECT * FROM {name}_l{len(exprs)})")
    return ",\n    ".join(ctes)


def index_ctes(
    index_options: str = "positions",
    stopwords: tuple = (),
    table: str = "documents",
    shingles: bool = False,
    text_col: str = "text",
    prefix: str = "",
    with_lut: bool = True,
    token_regex: str = "[a-z0-9]+",
    elide_regex: str | None = None,
    term_expr=None,
    raw_stop: tuple = (),
    pre_term_expr: str | None = None,
    ngram: tuple[int, int] | None = None,
    edge_ngram: tuple[int, int] | None = None,
    ngram_preserve: bool = False,
    common_grams: tuple = (),
    term_where: str | None = None,
) -> str:
    """The inverted-index tables as CTEs over ``table`` (default
    `documents`; pass a subquery to model an index whose deleted docs
    were purged by a merge — stats re-derive from the survivors).

    ``index_options="docs"`` mirrors Lucene's DOCS-only fields: tf
    collapses to 1 and the norm length is the uniqueTermCount
    (``BM25Similarity.java:139-141``).

    ``shingles=True`` appends space-joined bigrams to the token stream
    (ShingleFilter with the default no-stopword chain — no holes, so a
    bigram is exactly pos/pos+1 adjacency); shingle tokens count toward
    the norm length like every emitted token.

    ``prefix`` namespaces every CTE (``{prefix}postings`` etc.) so the
    index CTEs of TWO FIELDS coexist in one query — the per-field oracle
    for the multi-field gates (each field has its own postings / norms /
    gstats, the FieldInfos model); pass ``with_lut=False`` on the second
    field to share the first's norm_lut. ``text_col`` may be any SQL
    expression over ``table`` (computed fields)."""
    p = prefix
    shingle_cte = ""
    tokens_src = f"{p}tokens"
    gram_cte = ""
    normlen_cte = ""
    norms_src = f"{p}doclen"
    if ngram is not None or edge_ngram is not None:
        # NGramTokenFilter / EdgeNGramTokenFilter (ngram/NGramTokenFilter
        # .java:104-143): every gram of a token sits at the token's
        # position; only the FIRST (start 0, size minGram — or a
        # preserved-short original) carries the increment, the rest are
        # numOverlap overlaps, so norms use the non-overlap count while
        # avgdl/ttf count every gram (BM25Similarity.java:114-117,138-148).
        # substr/left/length are character-based in DuckDB, matching the
        # codePointCount contract. Docs whose every token is shorter than
        # minGram drop out of doclen — same zero-token caveat as above.
        if shingles:
            raise ValueError("ngram + shingles not modeled")
        mn, mx = ngram or edge_ngram
        if edge_ngram is not None:
            gram_body = f"""
      SELECT doc_id, left(term, g::INT) AS term, pos,
             (g > {mn}) AS overlap
      FROM (
        SELECT doc_id, pos, term,
               unnest(range({mn}, least({mx}, length(term)) + 1)) AS g
        FROM {tokens_src} WHERE length(term) >= {mn}
      )"""
        else:
            gram_body = f"""
      SELECT doc_id, substr(term, s::INT + 1, g::INT) AS term, pos,
             NOT (s = 0 AND g = {mn}) AS overlap
      FROM (
        SELECT doc_id, pos, term, s,
               unnest(range({mn}, least({mx}, length(term) - s) + 1)) AS g
        FROM (
          SELECT doc_id, pos, term,
                 unnest(range(0, length(term) - {mn} + 1)) AS s
          FROM {tokens_src} WHERE length(term) >= {mn}
        )
      )"""
        if ngram_preserve:
            gram_body += f"""
      UNION ALL
      SELECT doc_id, term, pos, FALSE AS overlap
      FROM {tokens_src} WHERE length(term) < {mn}
      UNION ALL
      SELECT doc_id, term, pos, TRUE AS overlap
      FROM {tokens_src} WHERE length(term) > {mx}"""
        gram_cte = f""",
    {p}tokens_ng AS ({gram_body}
    )"""
        normlen_cte = f""",
    {p}normlen AS (
      SELECT doc_id, count(*)::BIGINT AS length FROM {p}tokens_ng
      WHERE NOT overlap GROUP BY doc_id
    )"""
        tokens_src = f"{p}tokens_ng"
        norms_src = f"{p}normlen"
    if common_grams:
        # CommonGramsFilter (commongrams/CommonGramsFilter.java:98-171):
        # unigrams pass through; each adjacent pair with a common member
        # adds 'a_b' at a's position as a posIncr-0 overlap. pos+1
        # adjacency models the no-hole chain only (like shingles).
        if shingles or ngram is not None or edge_ngram is not None or stopwords:
            raise ValueError("common_grams composes with the plain chain only")
        cg = ", ".join(
            "'{}'".format(w.replace("'", "''")) for w in sorted(common_grams)
        )
        gram_cte = f""",
    {p}tokens_cg AS (
      SELECT doc_id, term, pos, FALSE AS overlap FROM {tokens_src}
      UNION ALL
      SELECT a.doc_id, a.term || '_' || b.term AS term, a.pos, TRUE AS overlap
      FROM {tokens_src} a JOIN {tokens_src} b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      WHERE a.term IN ({cg}) OR b.term IN ({cg})
    )"""
        normlen_cte = f""",
    {p}normlen AS (
      SELECT doc_id, count(*)::BIGINT AS length FROM {p}tokens_cg
      WHERE NOT overlap GROUP BY doc_id
    )"""
        tokens_src = f"{p}tokens_cg"
        norms_src = f"{p}normlen"
    if term_where:
        # post-chain FilteringTokenFilter slot (LengthFilter etc.):
        # dropped tokens keep their position gaps
        gram_cte += f""",
    {p}tokens_tw AS (
      SELECT * FROM {tokens_src} WHERE {term_where}
    )"""
        tokens_src = f"{p}tokens_tw"
    if shingles:
        if stopwords:
            raise ValueError("SQL shingle oracle models the no-hole chain only")
        tokens_src = f"{p}tokens_sh"
        shingle_cte = f""",
    {p}tokens_sh AS (
      SELECT doc_id, term, pos FROM {p}tokens
      UNION ALL
      SELECT a.doc_id, a.term || ' ' || b.term AS term, a.pos
      FROM {p}tokens a JOIN {p}tokens b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    )"""
    if index_options == "docs":
        postings = (
            f"SELECT term, doc_id, 1::BIGINT AS tf FROM {tokens_src} "
            "GROUP BY term, doc_id"
        )
        doclen = (
            f"SELECT doc_id, count(*)::BIGINT AS length FROM {p}postings "
            "GROUP BY doc_id"
        )
    else:
        postings = (
            f"SELECT term, doc_id, count(*)::BIGINT AS tf FROM {tokens_src} "
            "GROUP BY term, doc_id"
        )
        doclen = (
            f"SELECT doc_id, count(*)::BIGINT AS length FROM {tokens_src} "
            "GROUP BY doc_id"
        )
    lut = f"{norm_lut_sql()},\n    " if with_lut else ""
    return f"""{lut}{tokens_cte(text_col=text_col, stopwords=stopwords, table=table, name=f"{p}tokens", token_regex=token_regex, elide_regex=elide_regex, term_expr=term_expr, raw_stop=raw_stop, pre_term_expr=pre_term_expr)}{shingle_cte}{gram_cte},
    {p}postings AS ({postings}),
    {p}doclen AS ({doclen}){normlen_cte},
    {p}norms AS (
      SELECT d.doc_id, d.length, l.norm, l.declen
      FROM {norms_src} d JOIN norm_lut l ON d.length >= l.lo AND d.length < l.hi
    ),
    {p}gstats AS (
      SELECT count(*)::BIGINT AS doc_count, sum(length)::BIGINT AS sum_ttf,
             sum(length)::DOUBLE / count(*) AS avgdl
      FROM {p}doclen
    ),
    {p}term_stats AS (
      SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS ttf
      FROM {p}postings GROUP BY term
    )"""


def bm25_score_sql(
    tf_expr: str = "p.tf",
    df_expr: str = "ts.df",
    w_expr: str | None = None,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """score = w - w/(1 + tf*inv); w = boost * ln(1 + (N-df+0.5)/(df+0.5));
    inv = 1/(k1*((1-b) + b*declen/avgdl)) — mirrors
    DFExecutor._score_double_col exactly. ``w_expr`` overrides the weight
    (boosted / multi-term-summed idf); k1/b parametrize the pluggable-
    similarity entries (BM25Similarity ctor args, BM25Similarity.java:52)."""
    w = w_expr or f"ln(1.0 + (g.doc_count - {df_expr} + 0.5) / ({df_expr} + 0.5))"
    inv = f"(1.0 / ({k1!r} * ({(1.0 - b)!r} + ({b!r} * n.declen) / g.avgdl)))"
    return f"({w} - {w} / (1.0 + {tf_expr}::DOUBLE * {inv}))"


def idf_sql(term: str) -> str:
    """Weight of one term via a scalar subquery on term_stats (for boosted
    and phrase weights composed outside the standard join shape)."""
    t = term.replace("'", "''")  # the analyzer preserves apostrophes (can't)
    return (
        "ln(1.0 + (g.doc_count - "
        f"(SELECT df FROM term_stats WHERE term = '{t}') + 0.5) / "
        f"((SELECT df FROM term_stats WHERE term = '{t}') + 0.5))"
    )
