"""Single-node oracle index + searcher with Lucene-exact semantics.

This plays the role of Lucene's test oracle (CheckHits delta-0 standard,
``test-framework/.../search/CheckHits.java:329``): every Spark result —
top-k docIDs AND float32 scores, including tie-breaks — must match this
implementation exactly.

Scoring / combination semantics (cited in oracle.bm25 and here):
- term score: float32 ``weight - weight / (1 + freq * cache[norm])``
  (``BM25Similarity.java:246-258``)
- conjunction & disjunction-sum & WAND: per-clause float32 scores summed
  in DOUBLE, cast once to float32 (``ConjunctionScorer.java:59-64``,
  ``DisjunctionSumScorer.java:38-44``, ``WANDScorer.java:518-525``)
- required+optional: float32 add (``ReqOptSumScorer.java:260-277``)
- dismax: ``(float)(max + otherSum_double * tieBreaker)``
  (``DisjunctionMaxScorer.java:60-74``)
- synonym: pseudo-term df = max(sub df), ttf = sum; per-doc freq = sum of
  sub freqs, scored ONCE (``SynonymQuery.java:198-215``)
- phrase: weight = boost * Σ(double) per-term float32 idfs
  (``BM25Similarity.java:191-199``); exact-phrase freq = match count
  (``search/ExactPhraseMatcher.java:109-155``)
- top-k tie-break: score desc, then docID ASC (``search/HitQueue.java:78-84``)
- FILTER/ConstantScore: match without scoring; constant score = boost
  (``BooleanClause.java:93``, ``ConstantScoreQuery.java:29``)
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from dataclasses import dataclass

import numpy as np

from lucene_solr_spark.oracle import bm25, smallfloat
from lucene_solr_spark.oracle.tokenizer import analyze
from lucene_solr_spark.plans import ir

__all__ = ["OracleIndex", "ScoreDoc"]


@dataclass(frozen=True)
class ScoreDoc:
    doc_id: int
    score: float  # exact float32 value (stored as Python float)


def _f32(x) -> np.float32:
    return np.float32(x)


class _PreTok:
    __slots__ = ("term", "pos")

    def __init__(self, term: str, pos: int):
        self.term, self.pos = term, pos


class OracleIndex:
    """In-memory inverted index over (doc_id, text) with BM25 search."""

    def __init__(
        self,
        docs,  # iterable[(doc_id:int, text:str)]
        *,
        k1: float = bm25.K1_DEFAULT,
        b: float = bm25.B_DEFAULT,
        lowercase: bool = True,
        stopwords: frozenset[str] = frozenset(),
        max_token_length: int = 255,
        strip_possessive: bool = False,
        stemmer: str | None = None,
        index_options: str = "positions",
        pre_tokenized: bool = False,
    ) -> None:
        """``pre_tokenized=True`` takes ``docs`` as
        ``(doc_id, [(term, pos), ...])`` — the batch-kernel fast path
        (tokens from functions.fast_tokenizer, pinned identical to
        ``analyze``); analyzer kwargs are ignored then."""
        self.k1, self.b = k1, b
        self.index_options = index_options
        # postings: term -> {doc_id: tf}; positions: term -> {doc_id: [pos...]}
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        self.positions: dict[str, dict[int, list[int]]] = defaultdict(dict)
        self.norms: dict[int, int] = {}  # doc_id -> unsigned norm byte
        self.doc_count = 0
        self.sum_ttf = 0  # sumTotalTermFreq = total surviving tokens
        self.all_docs: list[int] = []
        for doc_id, text in docs:
            if pre_tokenized:
                toks = [_PreTok(t, p) for t, p in text]
            else:
                toks = analyze(
                    text,
                    lowercase=lowercase,
                    stopwords=stopwords,
                    max_token_length=max_token_length,
                    strip_possessive=strip_possessive,
                    stemmer=stemmer,
                )
            tf = Counter(t.term for t in toks)
            for term, f in tf.items():
                self.postings[term][doc_id] = 1 if index_options == "docs" else f
                self.positions[term][doc_id] = [t.pos for t in toks if t.term == term]
            if index_options == "docs":
                # DOCS-only: norm from uniqueTermCount (BM25Similarity.java:139-141)
                length = len(tf)
            else:
                length = len(toks)  # FieldInvertState.length, numOverlap=0
            self.norms[doc_id] = int(smallfloat.int_to_byte4(length))
            self.doc_count += 1
            self.sum_ttf += length
            self.all_docs.append(doc_id)
        self.all_docs.sort()
        self.avgdl = bm25.avg_field_length(self.sum_ttf, self.doc_count) if self.doc_count else _f32(0)
        self.cache = bm25.norm_inverse_cache(self.k1, self.b, self.avgdl)

    @classmethod
    def from_flat(
        cls,
        doc_ids,
        tdoc,
        terms,
        pos,
        *,
        k1: float = bm25.K1_DEFAULT,
        b: float = bm25.B_DEFAULT,
    ) -> "OracleIndex":
        """Vectorized constructor from the batch tokenizer's flat arrays
        (``functions.fast_tokenizer.batch_tokenize`` output): one numpy
        sort + reduceat instead of per-token Python — the monitor's
        per-batch DocumentBatch index at kernel speed."""
        import numpy as np

        self = cls.__new__(cls)
        self.k1, self.b = k1, b
        self.index_options = "positions"
        self.postings = defaultdict(dict)
        self.positions = defaultdict(dict)
        self.norms = {}
        doc_ids = np.asarray(doc_ids, np.int64)
        tdoc = np.asarray(tdoc, np.int64)
        pos = np.asarray(pos, np.int64)
        lengths = np.bincount(tdoc, minlength=len(doc_ids)).astype(np.int64)
        for i, d in enumerate(doc_ids):
            self.norms[int(d)] = int(smallfloat.int_to_byte4(int(lengths[i])))
        self.doc_count = int(len(doc_ids))
        self.sum_ttf = int(lengths.sum())
        self.all_docs = sorted(int(d) for d in doc_ids)
        self.avgdl = (
            bm25.avg_field_length(self.sum_ttf, self.doc_count)
            if self.doc_count
            else _f32(0)
        )
        self.cache = bm25.norm_inverse_cache(self.k1, self.b, self.avgdl)
        if len(tdoc) == 0:
            return self
        import pyarrow as pa
        import pyarrow.compute as pc

        if not isinstance(terms, (pa.Array, pa.ChunkedArray)):
            terms = pa.array(list(terms), pa.string())
        denc = pc.dictionary_encode(terms)
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        codes = np.asarray(denc.indices, np.int64)
        vocab = denc.dictionary.to_pylist()
        order = np.lexsort((pos, codes, tdoc))
        sd, sc, sp = tdoc[order], codes[order], pos[order]
        new_group = np.empty(len(sd), bool)
        new_group[0] = True
        new_group[1:] = (sd[1:] != sd[:-1]) | (sc[1:] != sc[:-1])
        starts = np.flatnonzero(new_group)
        counts = np.diff(np.append(starts, len(sd)))
        split_pos = np.split(sp, starts[1:])
        for s0, n, plist in zip(starts, counts, split_pos):
            term = vocab[sc[s0]]
            did = int(doc_ids[sd[s0]])
            self.postings[term][did] = int(n)
            self.positions[term][did] = [int(x) for x in plist]
        return self

    # ---- stats ----
    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def ttf(self, term: str) -> int:
        return sum(self.postings.get(term, {}).values())

    def dictionary(self) -> list[str]:
        return sorted(self.postings.keys())

    # ---- scoring primitives ----
    def _term_scores(self, term: str, boost: float = 1.0) -> dict[int, np.float32]:
        plist = self.postings.get(term)
        if not plist:
            return {}
        w = bm25.term_weight(boost, bm25.idf(len(plist), self.doc_count))
        out = {}
        for doc, tf in plist.items():
            out[doc] = bm25.score(tf, self.norms[doc], weight=w, cache=self.cache)[()]
        return out

    # ---- recursive evaluation: query -> {doc_id: float32 score} ----
    def matches(self, q: ir.Query, boost: float = 1.0) -> dict[int, np.float32]:
        if isinstance(q, ir.TermQuery):
            return self._term_scores(q.term, boost)
        if isinstance(q, ir.BoostQuery):
            return self.matches(q.query, _f32(_f32(boost) * _f32(q.boost))[()])
        if isinstance(q, ir.ConstantScoreQuery):
            inner = self.matches(q.query, 1.0)
            return {d: _f32(boost) for d in inner}
        if isinstance(q, ir.MatchAllDocsQuery):
            return {d: _f32(boost) for d in self.all_docs}
        if isinstance(q, ir.MatchNoDocsQuery):
            return {}
        if isinstance(q, ir.TermInSetQuery):
            # rewrites to constant-score over the union
            docs = set()
            for t in q.terms:
                docs.update(self.postings.get(t, ()))
            return {d: _f32(boost) for d in docs}
        if isinstance(q, ir.SynonymQuery):
            return self._synonym_scores(q.terms, boost)
        if isinstance(q, ir.PhraseQuery):
            return self._phrase_scores(q, boost)
        if isinstance(
            q,
            (
                ir.SpanNearQuery,
                ir.SpanNearClauseQuery,
                ir.SpanMultiTermWrapper,
                ir.SpanTermQuery,
                ir.SpanOrQuery,
                ir.SpanNotQuery,
                ir.SpanWithinQuery,
                ir.SpanContainingQuery,
                ir.SpanNotContainingQuery,
                ir.SpanNotWithinQuery,
                ir.SpanFirstQuery,
            ),
        ):
            return self._span_scores(q, boost)
        if isinstance(q, ir.MultiPhraseQuery):
            return self._multi_phrase_scores(q, boost)
        if isinstance(q, ir.DisjunctionMaxQuery):
            subs = [self.matches(s, boost) for s in q.queries]
            docs = set().union(*[set(s) for s in subs]) if subs else set()
            out = {}
            for d in docs:
                score_max = _f32(0.0)
                other = 0.0  # double
                for s in subs:
                    if d in s:
                        v = s[d]
                        if v >= score_max:
                            other += float(score_max)
                            score_max = v
                        else:
                            other += float(v)
                out[d] = _f32(float(score_max) + other * q.tie_breaker)
            return out
        if isinstance(q, ir.FuzzyQuery) and not q.constant_score:
            return self._scored_fuzzy_scores(q, boost)
        if isinstance(q, ir.BlendedTermQuery):
            return self._blended_scores(q, boost)
        if (
            isinstance(q, (ir.PrefixQuery, ir.WildcardQuery, ir.RegexpQuery))
            and not q.constant_score
        ):
            return self._scored_multiterm_scores(q, boost)
        if isinstance(q, (ir.PrefixQuery, ir.WildcardQuery, ir.RegexpQuery, ir.FuzzyQuery, ir.TermRangeQuery)):
            expanded = self.expand_multiterm(q)
            # CONSTANT_SCORE_REWRITE (MultiTermQuery.java / QueryParserBase.java:66)
            docs = set()
            for t in expanded:
                docs.update(self.postings.get(t, ()))
            return {d: _f32(boost) for d in docs}
        if isinstance(q, ir.BooleanQuery):
            return self._boolean_scores(q, boost)
        raise TypeError(f"unsupported query: {type(q).__name__}")

    def _scored_fuzzy_scores(self, q: "ir.FuzzyQuery", boost) -> dict:
        """TopTermsBlendedFreqScoringRewrite (FuzzyQuery.java:34,100;
        TopTermsRewrite.java:210-213 pq order; BlendedTermQuery.java:281-286
        df blending): top-N expansion by (boost desc, term asc), idf from
        the blended max-df, disjunction sum of the boosted term scores."""
        from lucene_solr_spark.oracle.editdist import fuzzy_boost, osa_distance

        cands = []
        for t in self.dictionary():
            if q.prefix_length and not t.startswith(q.term[: q.prefix_length]):
                continue
            if abs(len(t) - len(q.term)) > q.max_edits:
                continue
            ed = osa_distance(t, q.term)
            if ed <= q.max_edits:
                cands.append((fuzzy_boost(t, q.term, ed), t))
        cands.sort(key=lambda x: (-x[0], x[1]))
        cands = cands[: q.max_expansions]
        if not cands:
            return {}
        df_blend = max(len(self.postings[t]) for _, t in cands)
        acc: dict[int, float] = {}
        # accumulate in term-sorted order — the deterministic clause order
        # both executors fold in (Lucene's heap order is unspecified)
        for bst, t in sorted(cands, key=lambda x: x[1]):
            # Lucene's boost is SINGLE-precision arithmetic end-to-end:
            # 1.0f - (float) ed / (float) minTermLength
            # (FuzzyTermsEnum.java:254) — not a rounded double
            ed = osa_distance(t, q.term)
            if ed == 0:
                bst32 = np.float32(1.0)
            else:
                bst32 = np.float32(1.0) - np.float32(ed) / np.float32(
                    min(len(t), len(q.term))
                )
            bt = np.float32(np.float32(boost) * bst32)
            w = bm25.term_weight(float(bt), bm25.idf(df_blend, self.doc_count))
            for d, tf in self.postings[t].items():
                s = bm25.score(tf, self.norms[d], weight=w, cache=self.cache)[()]
                acc[d] = acc.get(d, 0.0) + float(s)  # double accumulator
        return {d: np.float32(v) for d, v in acc.items()}

    def _blended_scores(self, q: "ir.BlendedTermQuery", boost) -> dict:
        """Pre-expanded BlendedTermQuery leaf (round 5): same chain as the
        tail of ``_scored_fuzzy_scores`` with the expansion and blended df
        carried on the node — all three engines share the semantics."""
        acc: dict[int, float] = {}
        for t, ed in sorted(zip(q.terms, q.edits)):  # term-sorted fold
            if t not in self.postings:
                continue
            if ed == 0:
                bst32 = np.float32(1.0)
            else:
                bst32 = np.float32(1.0) - np.float32(ed) / np.float32(
                    min(len(t), q.query_len)
                )
            bt = np.float32(np.float32(boost) * bst32)
            w = bm25.term_weight(float(bt), bm25.idf(q.df_blend, self.doc_count))
            for d, tf in self.postings[t].items():
                s = bm25.score(tf, self.norms[d], weight=w, cache=self.cache)[()]
                acc[d] = acc.get(d, 0.0) + float(s)
        return {d: np.float32(v) for d, v in acc.items()}

    def _scored_multiterm_scores(self, q: ir.Query, boost) -> dict:
        """SCORING_BOOLEAN_REWRITE (ScoringRewrite.java:67-74): one SHOULD
        TermQuery per matching dictionary term, each scored with its OWN
        df (no blending — only fuzzy blends), boost identical across
        terms. TooManyClauses past MAX_CLAUSE_COUNT
        (MultiTermQuery.java:40). Clause fold in term-sorted order (the
        deterministic order both executors use)."""
        expanded = sorted(self.expand_multiterm(q))
        top_n = getattr(q, "max_expansions", None)
        if top_n is not None:
            # TOP_TERMS variant: N lexicographically smallest at the
            # constant boost (TopTermsRewrite.java:210-213 PQ order);
            # PQ size clamps to maxClauseCount (TopTermsRewrite.java:66)
            expanded = expanded[: min(int(top_n), ir.MAX_CLAUSE_COUNT)]
        elif len(expanded) > ir.MAX_CLAUSE_COUNT:
            raise ir.TooManyClauses(
                f"scoring rewrite expanded past {ir.MAX_CLAUSE_COUNT} terms"
            )
        acc: dict[int, float] = {}
        for t in expanded:
            for d, s in self._term_scores(t, boost).items():
                acc[d] = acc.get(d, 0.0) + float(s)  # double accumulator
        return {d: np.float32(v) for d, v in acc.items()}

    # ---- multi-term expansion over the dictionary ----
    def expand_multiterm(self, q: ir.Query) -> list[str]:
        terms = self.dictionary()
        if isinstance(q, ir.PrefixQuery):
            return [t for t in terms if t.startswith(q.prefix)]
        if isinstance(q, ir.WildcardQuery):
            pat = re.compile(
                "".join(
                    ".*" if c == "*" else "." if c == "?" else re.escape(c)
                    for c in q.pattern
                )
                + r"\Z"
            )
            return [t for t in terms if pat.match(t)]
        if isinstance(q, ir.RegexpQuery):
            pat = re.compile(q.regexp + r"\Z")
            return [t for t in terms if pat.match(t)]
        if isinstance(q, ir.TermRangeQuery):
            out = []
            for t in terms:
                if q.lower is not None:
                    if t < q.lower or (t == q.lower and not q.include_lower):
                        continue
                if q.upper is not None:
                    if t > q.upper or (t == q.upper and not q.include_upper):
                        continue
                out.append(t)
            return out
        if isinstance(q, ir.FuzzyQuery):
            # OSA (transpositions=true), the reference FuzzyQuery default
            # (search/FuzzyQuery.java:46-48) — same metric as both
            # executors' constant-score and scored paths
            from lucene_solr_spark.oracle.editdist import osa_distance

            return [
                t
                for t in terms
                if t[: q.prefix_length] == q.term[: q.prefix_length]
                and abs(len(t) - len(q.term)) <= q.max_edits
                and osa_distance(t, q.term) <= q.max_edits
            ]
        raise TypeError(type(q).__name__)

    def _synonym_scores(self, terms, boost) -> dict[int, np.float32]:
        plists = [self.postings.get(t, {}) for t in terms]
        df = max((len(p) for p in plists), default=0)
        if df == 0:
            return {}
        w = bm25.term_weight(boost, bm25.idf(df, self.doc_count))
        freqs: dict[int, int] = Counter()
        for p in plists:
            for d, tf in p.items():
                freqs[d] += tf
        return {
            d: bm25.score(f, self.norms[d], weight=w, cache=self.cache)[()]
            for d, f in freqs.items()
        }

    def _phrase_freq(self, q: ir.PhraseQuery, doc: int) -> int:
        """Exact-phrase match count (slop=0): positions of term i must equal
        first-term position + positions[i] offset."""
        pos_lists = []
        for t in q.terms:
            pl = self.positions.get(t, {}).get(doc)
            if not pl:
                return 0
            pos_lists.append(set(pl))
        base_off = q.positions[0]
        count = 0
        for p0 in sorted(pos_lists[0]):
            if all(
                (p0 - base_off + off) in pos_lists[i]
                for i, off in enumerate(q.positions)
            ):
                count += 1
        return count

    def _phrase_scores(self, q: ir.PhraseQuery, boost) -> dict[int, np.float32]:
        dfs = [self.df(t) for t in q.terms]
        if min(dfs, default=0) == 0:
            return {}
        w = bm25.term_weight(boost, bm25.idf_sum(dfs, self.doc_count))
        out = {}
        cand = set(self.postings[q.terms[0]])
        for t in q.terms[1:]:
            cand &= set(self.postings[t])
        for d in cand:
            if q.slop == 0:
                f = self._phrase_freq(q, d)
            else:
                # SloppyPhraseMatcher semantics (float freq into BM25)
                from lucene_solr_spark.oracle.sloppy import sloppy_phrase_freq

                f = sloppy_phrase_freq(
                    [self.positions[t][d] for t in q.terms],
                    list(q.positions),
                    q.slop,
                    terms=list(q.terms),
                )
            if f > 0:
                out[d] = bm25.score(f, self.norms[d], weight=w, cache=self.cache)[()]
        return out

    def _span_scores(self, q: ir.Query, boost) -> dict[int, np.float32]:
        """Span algebra (near/or/not/within/containing over term
        sub-spans): summed-idf weight over the scoring-side terms
        (SpanWeight.buildSimWeight — per-term stats deduped, df==0
        skipped), float freq from the shared span kernel
        (oracle.spans.eval_spans). Term order/dedup matches
        plans.df_executor.span_term_sets exactly so the idf sum
        accumulates identically."""
        from lucene_solr_spark.oracle.spans import eval_spans, spans_freq
        from lucene_solr_spark.plans.df_executor import span_term_sets
        from lucene_solr_spark.plans.span_rewrite import expand_span_wrappers

        q = expand_span_wrappers(q, self.expand_multiterm)
        all_terms, positive, required = span_term_sets(q)
        if any(self.df(t) == 0 for t in required):
            return {}
        live = [t for t in positive if self.df(t) > 0]
        if not live:
            return {}
        w = bm25.term_weight(
            boost, bm25.idf_sum([self.df(t) for t in live], self.doc_count)
        )
        if required:
            cand = set(self.postings[required[0]])
            for t in required[1:]:
                cand &= set(self.postings[t])
        else:
            cand = set()
            for t in positive:
                cand |= set(self.postings.get(t, ()))
        out = {}
        for d in cand:
            tp = {
                t: self.positions.get(t, {}).get(d, ())
                for t in all_terms
            }
            f = spans_freq(eval_spans(q, tp))
            if f > 0:
                out[d] = bm25.score(f, self.norms[d], weight=w, cache=self.cache)[()]
        return out

    def _multi_phrase_scores(self, q: "ir.MultiPhraseQuery", boost) -> dict[int, np.float32]:
        """MultiPhraseQuery: per-slot union postings, summed idf of ALL
        terms (MultiPhraseQuery.java:222-235), exact or sloppy matching
        over the merged per-slot position sets."""
        all_terms = q.all_terms
        # only terms with docFreq > 0 contribute to the summed idf
        # (MultiPhraseQuery.java:234-235)
        dfs = [self.df(t) for t in all_terms if self.df(t) > 0]
        if any(
            all(self.df(t) == 0 for t in g) for g in q.term_groups
        ):
            return {}
        w = bm25.term_weight(boost, bm25.idf_sum(dfs, self.doc_count))
        # per-slot doc -> merged position set
        slot_pos: list[dict[int, list[int]]] = []
        for g in q.term_groups:
            merged: dict[int, set] = {}
            for t in g:
                for d, pl in self.positions.get(t, {}).items():
                    merged.setdefault(d, set()).update(pl)
            slot_pos.append({d: sorted(ps) for d, ps in merged.items()})
        cand = set(slot_pos[0])
        for sp in slot_pos[1:]:
            cand &= set(sp)
        out = {}
        for d in cand:
            pos_lists = [sp[d] for sp in slot_pos]
            if q.slop == 0:
                base_off = q.positions[0]
                sets = [set(pl) for pl in pos_lists]
                f = sum(
                    1
                    for p0 in pos_lists[0]
                    if all(
                        (p0 - base_off + off) in sets[i]
                        for i, off in enumerate(q.positions)
                    )
                )
            else:
                from lucene_solr_spark.oracle.sloppy import sloppy_phrase_freq

                f = sloppy_phrase_freq(
                    [np.asarray(pl, np.int64) for pl in pos_lists],
                    list(q.positions),
                    q.slop,
                    terms=[frozenset(g) for g in q.term_groups],
                )
            if f > 0:
                out[d] = bm25.score(f, self.norms[d], weight=w, cache=self.cache)[()]
        return out

    def _boolean_scores(self, q: ir.BooleanQuery, boost) -> dict[int, np.float32]:
        must = [self.matches(c.query, boost) for c in q.clauses if c.occur == ir.Occur.MUST]
        filt = [set(self.matches(c.query, 1.0)) for c in q.clauses if c.occur == ir.Occur.FILTER]
        should = [self.matches(c.query, boost) for c in q.clauses if c.occur == ir.Occur.SHOULD]
        must_not = [set(self.matches(c.query, 1.0)) for c in q.clauses if c.occur == ir.Occur.MUST_NOT]
        msm = q.min_should_match

        excluded = set().union(*must_not) if must_not else set()

        if must or filt:
            # required conjunction
            req_sets = [set(m) for m in must] + filt
            docs = set.intersection(*req_sets) - excluded
            out = {}
            for d in docs:
                if should:
                    matching = [s[d] for s in should if d in s]
                    if len(matching) < msm:
                        continue
                    if msm > 0:
                        # planner: ConjunctionScorer([req, WAND(shoulds,msm)])
                        # (Boolean2ScorerSupplier.java:134-141). BOTH sides
                        # are float Scorer.score() outputs: the inner req
                        # conjunction rounds its double sum to f32 BEFORE
                        # the outer conjunction double-sums the two f32s
                        # (ConjunctionScorer.score is a float method) —
                        # caught by randomized fuzzing at 1 ulp.
                        wand = _f32(sum(float(v) for v in matching))
                        req_f32 = _f32(sum(float(m[d]) for m in must))
                        out[d] = _f32(float(req_f32) + float(wand))
                    else:
                        req = _f32(sum(float(m[d]) for m in must))
                        if matching:
                            opt = _f32(sum(float(v) for v in matching))
                            out[d] = _f32(req + opt)  # float add (ReqOptSumScorer)
                        else:
                            out[d] = req
                else:
                    out[d] = _f32(sum(float(m[d]) for m in must))
            return out

        # pure disjunction
        need = max(msm, 1)
        docs = set().union(*[set(s) for s in should]) if should else set()
        out = {}
        for d in docs - excluded:
            matching = [s[d] for s in should if d in s]
            if len(matching) < need:
                continue
            out[d] = _f32(sum(float(v) for v in matching))
        return out

    # ---- top-k ----
    def search(self, q: ir.Query, k: int = 10) -> list[ScoreDoc]:
        """Top-k by (score desc, docID asc) — HitQueue.java:78-84 tie-break.

        The query is REWRITTEN to fixpoint first, exactly like
        ``IndexSearcher.search`` (``IndexSearcher.java:683`` rewrite loop):
        rules such as nested-disjunction flattening change float32 rounding
        boundaries, so scoring the unrewritten tree is NOT equivalent —
        randomized fuzzing caught a 1-ulp divergence without this."""
        from lucene_solr_spark.plans.rewriter import rewrite

        scored = self.matches(rewrite(q), 1.0)
        ranked = sorted(scored.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return [ScoreDoc(d, float(s)) for d, s in ranked[:k]]

    def count(self, q: ir.Query) -> int:
        return len(self.matches(q, 1.0))


