"""Logical query rewrites — the role of ``BooleanQuery.rewrite``
(``search/BooleanQuery.java:236-503``) driven to fixpoint like
``IndexSearcher.rewrite`` (``search/IndexSearcher.java:761-767``).

Implemented rewrites (reference line cites in comments):
  1. empty boolean → MatchNoDocs; single-clause unwrap        (:237-261)
  2. recursive clause rewrite                                  (:264-284)
  3. dedup FILTER / MUST_NOT clauses                           (:286-305)
  4. same query MUST & MUST_NOT → MatchNoDocs;
     MUST_NOT MatchAll → MatchNoDocs                           (:307-317)
  5. drop FILTER duplicated by MUST; FILTER∩SHOULD → MUST      (:319-368)
  6. dedup SHOULD / MUST summing boosts                        (:370-430)
  7. MUST=MatchAll alone with filters → ConstantScore          (:434-475)
  8. flatten nested pure disjunctions (WAND enabler)           (:482-503)
  plus MatchNoDocs propagation and boost algebra
  (BoostQuery of BoostQuery multiplies; boost==1 unwraps —
   search/BoostQuery.java rewrite).

Multi-term expansion (prefix/wildcard/fuzzy/range → TermInSet /
constant-score disjunction, ``search/MultiTermQuery.java:53+``) is
index-dependent and lives in the executors (they own the dictionary).
"""

from __future__ import annotations

from collections import Counter

from lucene_solr_spark.plans import ir

__all__ = ["rewrite"]

_MAX_PASSES = 10  # IndexSearcher.rewrite loops to fixpoint


def rewrite(q: ir.Query) -> ir.Query:
    for _ in range(_MAX_PASSES):
        nq = _rewrite_once(q)
        if nq == q:
            return nq
        q = nq
    return q


def _rewrite_once(q: ir.Query) -> ir.Query:
    if isinstance(q, ir.BoostQuery):
        inner = _rewrite_once(q.query)
        if isinstance(inner, ir.BoostQuery):
            return ir.BoostQuery(inner.query, q.boost * inner.boost)
        if isinstance(inner, ir.MatchNoDocsQuery):
            return inner
        if q.boost == 1.0:
            return inner
        return ir.BoostQuery(inner, q.boost)
    if isinstance(q, ir.ConstantScoreQuery):
        inner = _rewrite_once(q.query)
        if isinstance(inner, ir.MatchNoDocsQuery):
            return inner
        if isinstance(inner, ir.ConstantScoreQuery):
            inner = inner.query
        return ir.ConstantScoreQuery(inner)
    if isinstance(q, ir.DisjunctionMaxQuery):
        subs = tuple(
            s for s in (_rewrite_once(s) for s in q.queries)
            if not isinstance(s, ir.MatchNoDocsQuery)
        )
        if not subs:
            return ir.MatchNoDocsQuery("empty dismax")
        if len(subs) == 1:
            return subs[0]
        return ir.DisjunctionMaxQuery(subs, q.tie_breaker)
    if isinstance(q, ir.NGramPhraseQuery):
        # NGramPhraseQuery.rewrite (search/NGramPhraseQuery.java:42-77):
        # keep grams at 0, n, 2n, … plus the last; positions preserved so
        # the lowered PhraseQuery matches the identical doc set
        terms = q.terms
        if len(terms) < 3 or q.n == 1:
            return ir.PhraseQuery(terms)
        keep = list(range(0, len(terms), q.n))
        if keep[-1] != len(terms) - 1:
            keep.append(len(terms) - 1)
        return ir.PhraseQuery(
            tuple(terms[i] for i in keep), positions=tuple(keep)
        )
    if isinstance(q, ir.SynonymQuery) and len(q.terms) == 1:
        return ir.TermQuery(q.terms[0], field=q.field)
    if isinstance(q, ir.TermInSetQuery):
        if not q.terms:
            return ir.MatchNoDocsQuery("empty term set")
        if len(q.terms) == 1:
            # TermInSetQuery rewrites to a constant-score term
            return ir.ConstantScoreQuery(ir.TermQuery(q.terms[0], field=q.field))
        return q
    if not isinstance(q, ir.BooleanQuery):
        return q
    return _rewrite_boolean(q)


def _rewrite_boolean(q: ir.BooleanQuery) -> ir.Query:  # noqa: C901
    clauses = [ir.BooleanClause(c.occur, _rewrite_once(c.query)) for c in q.clauses]
    msm = q.min_should_match

    # MatchNoDocs propagation
    out = []
    for c in clauses:
        if isinstance(c.query, ir.MatchNoDocsQuery):
            if c.occur in (ir.Occur.MUST, ir.Occur.FILTER):
                return ir.MatchNoDocsQuery("required clause matches nothing")
            continue  # drop no-op SHOULD / MUST_NOT
        if c.occur == ir.Occur.MUST_NOT and isinstance(c.query, ir.MatchAllDocsQuery):
            return ir.MatchNoDocsQuery("MUST_NOT MatchAll")  # :312-316
        out.append(c)
    clauses = out

    # dedup FILTER and MUST_NOT (:286-305)
    seen_f, seen_n, out = set(), set(), []
    for c in clauses:
        if c.occur == ir.Occur.FILTER:
            if c.query in seen_f:
                continue
            seen_f.add(c.query)
        elif c.occur == ir.Occur.MUST_NOT:
            if c.query in seen_n:
                continue
            seen_n.add(c.query)
        out.append(c)
    clauses = out

    # MUST ∩ MUST_NOT → MatchNoDocs (:307-311)
    musts = {c.query for c in clauses if c.occur in (ir.Occur.MUST, ir.Occur.FILTER)}
    if musts & {c.query for c in clauses if c.occur == ir.Occur.MUST_NOT}:
        return ir.MatchNoDocsQuery("query appears required and prohibited")

    # drop FILTER already required by MUST (:319-337)
    must_only = {c.query for c in clauses if c.occur == ir.Occur.MUST}
    clauses = [
        c
        for c in clauses
        if not (c.occur == ir.Occur.FILTER and c.query in must_only)
    ]

    # FILTER ∩ SHOULD → MUST (scoring required clause) when msm permits (:339-368)
    if msm <= 1:
        filters = {c.query for c in clauses if c.occur == ir.Occur.FILTER}
        shoulds = {c.query for c in clauses if c.occur == ir.Occur.SHOULD}
        promote = filters & shoulds
        if promote:
            n_should_before = sum(1 for c in clauses if c.occur == ir.Occur.SHOULD)
            out = []
            for c in clauses:
                if c.query in promote and c.occur in (ir.Occur.FILTER, ir.Occur.SHOULD):
                    if c.occur == ir.Occur.SHOULD:
                        out.append(ir.BooleanClause(ir.Occur.MUST, c.query))
                    # drop the FILTER twin
                else:
                    out.append(c)
            clauses = out
            if msm == 1 and n_should_before == len(promote):
                msm = 0

    # dedup SHOULD and MUST, summing boosts (:370-430)
    clauses = _merge_duplicates(clauses, ir.Occur.SHOULD) if msm <= 1 else clauses
    clauses = _merge_duplicates(clauses, ir.Occur.MUST)

    # flatten nested pure disjunctions into this one (:482-503)
    if msm <= 1:
        out = []
        changed = False
        for c in clauses:
            iq = c.query
            if (
                c.occur == ir.Occur.SHOULD
                and isinstance(iq, ir.BooleanQuery)
                and iq.min_should_match <= 1
                and all(cc.occur == ir.Occur.SHOULD for cc in iq.clauses)
            ):
                out.extend(iq.clauses)
                changed = True
            else:
                out.append(c)
        if changed:
            clauses = out

    # MUST=MatchAll cases (:434-475)
    n_should = sum(1 for c in clauses if c.occur == ir.Occur.SHOULD)
    if msm > n_should:
        return ir.MatchNoDocsQuery("minShouldMatch unsatisfiable")

    if not clauses:
        return ir.MatchNoDocsQuery("empty BooleanQuery")  # :237-240

    # single-clause unwrap (:242-261)
    if len(clauses) == 1:
        c = clauses[0]
        if c.occur == ir.Occur.MUST or (c.occur == ir.Occur.SHOULD and msm <= 1):
            return c.query
        if c.occur == ir.Occur.FILTER:
            return ir.ConstantScoreQuery(c.query)
        if c.occur == ir.Occur.MUST_NOT:
            return ir.MatchNoDocsQuery("pure negation")

    # pure negation with no positive clause → MatchNoDocs (:255-259 semantics)
    if all(c.occur == ir.Occur.MUST_NOT for c in clauses):
        return ir.MatchNoDocsQuery("pure negation")

    return ir.BooleanQuery(tuple(clauses), msm)


def _merge_duplicates(clauses, occur):
    """Duplicate clauses of one occur merge into a single boosted clause
    (boosts sum — BooleanQuery.java:370-430)."""
    counts = Counter(c.query for c in clauses if c.occur == occur)
    dups = {qq for qq, n in counts.items() if n > 1}
    if not dups:
        return clauses
    out, done = [], set()
    for c in clauses:
        if c.occur == occur and c.query in dups:
            if c.query in done:
                continue
            done.add(c.query)
            base = c.query
            boost = float(counts[base])
            if isinstance(base, ir.BoostQuery):
                # sum of identical boosts: n * boost
                out.append(
                    ir.BooleanClause(occur, ir.BoostQuery(base.query, base.boost * boost))
                )
            else:
                out.append(ir.BooleanClause(occur, ir.BoostQuery(base, boost)))
        else:
            out.append(c)
    return out
