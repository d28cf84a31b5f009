"""Pure-Python oracle implementing the reference search semantics.

This is the stand-in for running the Go binary: a tiny, obviously-correct,
single-node implementation of the reference's indexing + query pipeline
(tokenize -> postings -> typo candidates -> AND intersection -> BM25 ->
deterministic top-k). The Spark engine must be rank-identical to it.

Semantics and citations:
- tokenization: reference T1/T3 (tokenizer.go:19-78), via the shared
  functions.tokenizer module (itself golden-tested against the reference's
  own table tests);
- tf: per (doc, field, term) occurrence count; 1 in prefix-n-gram mode due
  to the reference's global dedup (service.go:258-261 + tokenizer.go:56-78);
- df dedups by doc across fields (bm25.go:44-57); IDF = ln(N/df)
  (bm25.go:26-41); |d| = whitespace word count over searchable fields
  (bm25.go:109-158); k1=1.2, b=0.75 (bm25.go:63-64);
- typo gates: 1 typo iff len(token) >= min1 (default 4), 2 iff >= min2
  (default 7) (service.go:176-226, defaults config/settings.go:141-153);
  non-typo-tolerant words skip typo search, including the prefix guard
  len(candidate)>=3 && candidate is a prefix of a non-typo word
  (service.go:204-218);
- typo penalties x0.8 / x0.6 (service.go:246,308); exact match on a token
  suppresses typo matches for that (token, doc) (service.go:234-236);
  among typo matches only the best (lowest) distance survives
  (service.go:239-257);
- the reference's 500-result / 50 ms dual typo cutoff
  (service.go:188-189) is wall-clock-nondeterministic; replaced by a
  deterministic cap: first MAX_TYPO_CANDIDATES ordered by
  (distance asc, term asc) -- the engine applies the identical cap;
- AND intersection over query tokens (service.go:328-361);
- scoring: BM25 (the north rule pins the reference's BM25 ranker); per
  (token, doc) the contribution is max over surviving candidate terms of
  penalty * BM25(term, doc) -- the "max over entries" shape of the
  reference's production scorer (service.go:392-438) applied to BM25;
  doc-level tf for a term sums that doc's tf over allowed fields;
- tie-break: (score desc, doc_id asc) -- a total order, required for rank
  identity (the reference relies on Go's stable sort, service.go:639-643).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from dataclasses import dataclass

from ..config import (
    BM25_B,
    BM25_K1,
    MAX_TYPO_CANDIDATES,
    TYPO_PENALTY_1,
    TYPO_PENALTY_2,
    IndexSettings,
)
from ..functions.edit_distance import damerau_levenshtein
from ..functions.tokenizer import (
    prefix_ngrams,
    tokenize,
    tokenize_with_prefix_ngrams,
    whitespace_word_count,
)


@dataclass
class OracleHit:
    doc_id: int
    document_id: str
    score: float
    num_typos: int
    number_exact_words: int = 0


def _prefix_tokens(text: str, max_ngram_len: int | None) -> list[str]:
    """T3 with the optional n-gram length cap (config.max_ngram_len)."""
    if max_ngram_len is None:
        return tokenize_with_prefix_ngrams(text)
    out: list[str] = []
    seen: set[str] = set()
    for t in tokenize(text):
        if t not in seen:
            out.append(t)
            seen.add(t)
        for g in prefix_ngrams(t)[:max_ngram_len]:
            if g not in seen:
                out.append(g)
                seen.add(g)
    return out


def _norm(v) -> str:
    """Array fields join with a space (indexing/service.go:233-241).
    Null/non-string elements are DROPPED, matching both the reference
    (its type switch keeps only string items) and the engine
    (array_join skips nulls) -- stringifying them would index the token
    'none' and inflate BM25 |d|, breaking oracle<->engine rank
    identity."""
    if v is None:
        return ""
    if isinstance(v, (list, tuple)):
        return " ".join(x for x in v if isinstance(x, str))
    return str(v)


class OracleIndex:
    def __init__(self, docs: list[dict], settings: IndexSettings,
                 id_col: str = "documentID"):
        self.settings = settings
        # deterministic dense ids: rank of documentID (matches build.ids)
        ordered = sorted(docs, key=lambda d: d[id_col])
        self.doc_ids = {d[id_col]: i for i, d in enumerate(ordered)}
        self.docs = {i: d for i, d in enumerate(ordered)}
        self.id_col = id_col

        # postings[(term, field)] = {doc_id: tf}
        self.postings: dict[tuple[str, str], dict[int, float]] = defaultdict(dict)
        self.doc_len: dict[int, int] = {}
        # full_words[(doc, field)]: the field's actual token set -- the A3
        # exactness check tokenizes field content per hit
        # (service.go:452-474); an n-gram-only match is NOT an exact word
        self.full_words: dict[tuple[int, str], set[str]] = {}
        for i, d in self.docs.items():
            dl = 0
            for f in settings.searchable_fields:
                text = _norm(d.get(f))
                dl += whitespace_word_count(text)
                real_toks = tokenize(text)
                self.full_words[(i, f)] = set(real_toks)
                toks = (
                    _prefix_tokens(text, settings.max_ngram_len)
                    if settings.uses_prefix(f)
                    else real_toks
                )
                for t, c in Counter(toks).items():
                    self.postings[(t, f)][i] = float(c)
            self.doc_len[i] = dl
        self.N = len(self.docs)
        self.avgdl = sum(self.doc_len.values()) / self.N if self.N else 0.0
        # df dedups by doc across fields
        df: Counter = Counter()
        seen: dict[str, set[int]] = defaultdict(set)
        for (t, _f), plist in self.postings.items():
            seen[t] |= set(plist)
        self.df = {t: len(s) for t, s in seen.items()}
        self.vocab = sorted(self.df)

    # ------------------------------------------------------------------
    def idf(self, term: str) -> float:
        d = self.df.get(term, 0)
        if d == 0 or self.N == 0:
            return 0.0
        return math.log(self.N / d)

    def bm25(self, term: str, doc_id: int, fields: list[str]) -> float:
        tf = 0.0
        for f in fields:
            tf += self.postings.get((term, f), {}).get(doc_id, 0.0)
        if tf == 0.0:
            return 0.0
        dl = self.doc_len[doc_id]
        denom = tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / self.avgdl)
        return self.idf(term) * tf * (BM25_K1 + 1) / denom

    def term_docs(self, term: str, fields: list[str]) -> set[int]:
        out: set[int] = set()
        for f in fields:
            out |= set(self.postings.get((term, f), {}))
        return out

    def typo_candidates(self, token: str, max_distance: int) -> list[tuple[str, int]]:
        """Deterministic replacement of the reference's 500/50ms scan:
        all vocab terms within max_distance, ordered (distance, term),
        capped at MAX_TYPO_CANDIDATES."""
        s = self.settings
        ntw = [w.lower() for w in s.non_typo_tolerant_words]
        if token in ntw:  # strings.EqualFold (service.go:179-183)
            return []
        cands = []
        for t in self.vocab:
            if t == token or abs(len(t) - len(token)) > max_distance:
                continue
            # candidate guard (service.go:204-228): case-insensitive
            # equality at any length + >=3-char prefix rejection
            if t in ntw:
                continue
            if len(t) >= 3 and any(w.startswith(t) for w in ntw):
                continue
            d = damerau_levenshtein(token, t, max_distance)
            if 0 < d <= max_distance:
                cands.append((d, t))
        cands.sort()
        return [(t, d) for d, t in cands[:MAX_TYPO_CANDIDATES]]

    # ------------------------------------------------------------------
    def search(
        self,
        query: str,
        k: int = 10,
        fields: list[str] | None = None,
        typo_tolerance: bool = True,
    ) -> list[OracleHit]:
        s = self.settings
        fields = fields or s.searchable_fields
        # no_typo_tolerance_fields: typo matches don't count in these
        # fields (setting declared at config/settings.go:39; the reference
        # never enforces it -- this engine implements the documented
        # semantics, mirrored by query/engine.py score_and_intersect)
        ntf = set(s.no_typo_tolerance_fields)
        typo_fields = [f for f in fields if f not in ntf]
        tokens = list(dict.fromkeys(tokenize(query)))  # unique, order kept
        if not tokens:
            return []

        # per token: candidate (term, distance, penalty)
        per_token: dict[str, list[tuple[str, int, float]]] = {}
        for tok in tokens:
            cands = [(tok, 0, 1.0)]
            if typo_tolerance:
                # `> 0` applies to the resolved setting: 0 disables the
                # distance tier (service.go:192-202)
                maxd = 0
                min1 = s.min_word_size_for_1_typo
                min2 = s.min_word_size_for_2_typos
                t1 = min1 > 0 and len(tok) >= min1
                if min2 > 0 and len(tok) >= min2:
                    maxd = 2
                elif t1:
                    maxd = 1
                # tier-based penalty (engine._token_gates has the full
                # citation): a distance-1 term found only because the
                # 2-typo pass ran (1-typo pass gated off) gets x0.6 in
                # the reference, not x0.8
                pen1 = TYPO_PENALTY_1 if t1 else TYPO_PENALTY_2
                if maxd:
                    for t, d in self.typo_candidates(tok, maxd):
                        pen = pen1 if d == 1 else TYPO_PENALTY_2
                        cands.append((t, d, pen))
            per_token[tok] = cands

        # per (token, doc): exact-skip + best-distance-wins, then max
        # penalized BM25 over surviving terms
        contrib: dict[str, dict[int, float]] = {}
        typo_only: dict[str, set[int]] = {}
        for tok, cands in per_token.items():
            doc_best_d: dict[int, int] = {}
            doc_entries: dict[int, list] = defaultdict(list)
            for term, d, pen in cands:
                f_ok = fields if d == 0 else typo_fields
                for doc in self.term_docs(term, f_ok):
                    doc_entries[doc].append((d, term, pen, f_ok))
                    if d < doc_best_d.get(doc, 99):
                        doc_best_d[doc] = d
            cmap: dict[int, float] = {}
            tset: set[int] = set()
            for doc, entries in doc_entries.items():
                best = doc_best_d[doc]
                vals = [
                    pen * self.bm25(term, doc, f_ok)
                    for d, term, pen, f_ok in entries
                    if d == best
                ]
                cmap[doc] = max(vals)
                if best > 0:
                    tset.add(doc)
            contrib[tok] = cmap
            typo_only[tok] = tset

        # AND intersection (service.go:328-361)
        docs = set(contrib[tokens[0]])
        for tok in tokens[1:]:
            docs &= set(contrib[tok])
        hits = []
        for doc in docs:
            score = sum(contrib[tok][doc] for tok in tokens)
            n_typos = sum(1 for tok in tokens if doc in typo_only[tok])
            # A3 (service.go:475-505): distinct tokens matched exactly
            # (term == token posting) in a field where the token is a
            # FULL word of that field's content
            n_exact = sum(
                1
                for tok in tokens
                if any(
                    # full-word membership implies the posting exists
                    # (every full token of a field is emitted into that
                    # field's postings)
                    tok in self.full_words.get((doc, f), ())
                    for f in fields
                )
            )
            hits.append(
                OracleHit(
                    doc, self.docs[doc][self.id_col], score, n_typos, n_exact
                )
            )
        hits.sort(key=lambda h: (-h.score, h.doc_id))
        return hits[:k]
