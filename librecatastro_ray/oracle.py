"""Pure-Python/numpy BM25 oracle — slow, obviously correct.

The analogue of the reference's oracle-backed golden assertions (live-server
golden counts, reference: src/tests/parsers/parser_xml_tests.py:9-21,
src/tests/scrappers/scrapper_xml_tests.py:107-155): the engine's top-k must be
rank-identical (ids exact, scores within 1e-6) to this oracle on the reference
query set.

The oracle shares the tokenizer and the BM25 formula modules with the engine,
but is otherwise an independent, in-memory, dictionary-based implementation:
no Ray, no Arrow, no compression, no pruning.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import numpy as np

from librecatastro_ray.functions.bm25 import B_DEFAULT, K1_DEFAULT, idf, tf_norm
from librecatastro_ray.functions.tokenizer import tokenize


def _canon_tokenize(s):
    return tokenize(s)


@dataclass
class OracleIndex:
    """In-memory inverted index over a corpus given as parallel lists."""

    doc_ids: list[int]
    repos: list[str]
    paths: list[str]
    langs: list[str]
    dl: dict[int, int] = field(default_factory=dict)
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {doc_id: tf}
    k1: float = K1_DEFAULT
    b: float = B_DEFAULT
    # per-string tokenizer (Analyzer.tokenize); canonical by default so the
    # whitespace-analyzer end-to-end test can share this oracle
    tokenize_fn: "object" = _canon_tokenize

    @property
    def n_docs(self) -> int:
        return len(self.doc_ids)

    @property
    def avgdl(self) -> float:
        if not self.dl:
            return 1.0
        return float(sum(self.dl.values())) / len(self.dl)

    @classmethod
    def build(
        cls,
        repos: list[str],
        paths: list[str],
        langs: list[str],
        contents: list[str | None],
        k1: float = K1_DEFAULT,
        b: float = B_DEFAULT,
        tokenize_fn=_canon_tokenize,
    ) -> "OracleIndex":
        """doc_ids are assigned by sorted (repo, path) order — the engine's
        deterministic id assignment (SURVEY.md §2.F F2)."""
        order = sorted(range(len(repos)), key=lambda i: (repos[i], paths[i]))
        idx = cls(
            doc_ids=list(range(len(order))),
            repos=[repos[i] for i in order],
            paths=[paths[i] for i in order],
            langs=[langs[i] for i in order],
            k1=k1,
            b=b,
            tokenize_fn=tokenize_fn,
        )
        for doc_id, i in enumerate(order):
            toks = tokenize_fn(contents[i])
            idx.dl[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                idx.postings.setdefault(term, {})[doc_id] = tf
        return idx

    # ---- query surface (the reference's ES contract, SURVEY.md §2.Q) ----

    def score_term(self, term: str) -> dict[int, float]:
        plist = self.postings.get(term)
        if not plist:
            return {}
        df = len(plist)
        n, avgdl = self.n_docs, self.avgdl
        w = float(idf(df, n))
        return {
            d: w * float(tf_norm(np.array([tf]), np.array([self.dl[d]]), avgdl, self.k1, self.b)[0])
            for d, tf in plist.items()
        }

    def match(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """BM25 ``match``: tokenize query, sum per-token contributions in
        query-token order (duplicated query tokens count twice, as in
        Lucene).  Returns [(doc_id, score)] rank-ordered, tiebreak
        (score desc, doc_id asc)."""
        scores: dict[int, float] = {}
        for term in self.tokenize_fn(text):
            for d, s in self.score_term(term).items():
                scores[d] = scores.get(d, 0.0) + s
        return self._topk(scores, k)

    def bool_must(
        self,
        content_terms: list[str],
        k: int = 10,
        keyword_eq: list[tuple[str, str]] | None = None,
        keyword_prefix: list[tuple[str, str]] | None = None,
    ) -> list[tuple[int, float]]:
        """``bool.must`` conjunction (reference:
        src/utils/elasticsearch_utils.py:111-119): every clause must match.
        Content-term clauses contribute their BM25 score; keyword
        equality/prefix clauses are constant-score 1.0 per matching doc."""
        candidate: set[int] | None = None
        scores: dict[int, float] = {}
        for term in content_terms:
            term_scores = self.score_term(term)
            docs = set(term_scores)
            candidate = docs if candidate is None else (candidate & docs)
            for d, s in term_scores.items():
                scores[d] = scores.get(d, 0.0) + s
        for field_name, value in keyword_eq or []:
            docs = self._keyword_docs(field_name, value, prefix=False)
            candidate = docs if candidate is None else (candidate & docs)
            for d in docs:
                scores[d] = scores.get(d, 0.0) + 1.0
        for field_name, value in keyword_prefix or []:
            docs = self._keyword_docs(field_name, value, prefix=True)
            candidate = docs if candidate is None else (candidate & docs)
            for d in docs:
                scores[d] = scores.get(d, 0.0) + 1.0
        if candidate is None:
            return []
        return self._topk({d: scores[d] for d in candidate}, k)

    def prefix_content(self, prefix: str, k: int = 10) -> list[tuple[int, float]]:
        """``prefix`` on the analyzed field: dictionary range scan, OR of
        postings, constant score 1.0 (ES multi-term rewrite)."""
        docs: set[int] = set()
        for term, plist in self.postings.items():
            if term.startswith(prefix):
                docs.update(plist)
        return self._topk({d: 1.0 for d in docs}, k)

    def count(self, text: str) -> int:
        """Exact ``hits.total`` for a match query (reference:
        src/librecatastro/domain/cadaster_entry/cadaster_entry.py:68-71)."""
        docs: set[int] = set()
        for term in self.tokenize_fn(text):
            docs.update(self.postings.get(term, {}))
        return len(docs)

    def _keyword_docs(self, field_name: str, value: str, prefix: bool) -> set[int]:
        col = {"repo": self.repos, "path": self.paths, "lang": self.langs}[field_name]
        if prefix:
            return {d for d, v in enumerate(col) if v.startswith(value)}
        return {d for d, v in enumerate(col) if v == value}

    @staticmethod
    def _topk(scores: dict[int, float], k: int) -> list[tuple[int, float]]:
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
