"""Deterministic synthetic source-code corpus generator (FIXTURES.md §1).

Produces the exact input_hint table shape:
    (repo: string, path: string, commit: string, lang: string, content: string)

Properties exercised (seed-fixed, no wall clock):
- Zipf(~1.1) token distribution over a vocabulary of identifiers plus a hot
  set of language keywords → hot-term salting is actually exercised;
- log-normal doc lengths (mean ~200 tokens) → dl/avgdl normalization and
  wide-row batching;
- planted rare "needle" tokens (needle_0001 …) with known placements →
  exact-answer queries (the analogue of the reference's golden fan-out
  counts 14/61/2/8/16, reference: src/tests/parsers/parser_xml_tests.py:11,18,
  src/tests/scrappers/scrapper_xml_tests.py:114,123,132);
- ~1% duplicate (repo, path) keys with differing content → upsert/keep-latest
  dedup (reference upsert by id, cadaster_entry.py:53);
- a few empty / whitespace-only content rows → null-edge semantics.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

KEYWORDS = ["def", "return", "if", "for", "i", "x", "self", "import", "class", "in", "none", "else"]
LANGS = ["py", "js", "java", "go", "rs", "md"]


def _commit_for_repo(repo: str) -> str:
    return hashlib.sha1(("commit:" + repo).encode()).hexdigest()


def make_corpus(
    n_docs: int = 1000,
    seed: int = 42,
    vocab_size: int = 5000,
    n_repos: int = 20,
    n_needles: int = 8,
    mean_tokens: int = 200,
    dup_frac: float = 0.01,
) -> pa.Table:
    rng = np.random.RandomState(seed)

    vocab = np.array([f"id_{i:05d}" for i in range(vocab_size)], dtype=object)
    full_vocab = np.concatenate([np.array(KEYWORDS, dtype=object), vocab])
    # Zipf ranks over the full vocabulary (keywords get the hottest ranks)
    ranks = np.arange(1, len(full_vocab) + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()

    # repo sizes ~ Zipf too (skewed partitions)
    repo_ids = rng.zipf(1.3, size=n_docs) % n_repos
    repos = np.array([f"org{r // 5:03d}/proj{r % 5:03d}_{r:03d}" for r in repo_ids], dtype=object)

    lengths = np.clip(rng.lognormal(np.log(mean_tokens), 0.8, size=n_docs).astype(np.int64), 2, 20000)
    langs = np.array([LANGS[i % len(LANGS)] for i in rng.randint(0, len(LANGS), size=n_docs)], dtype=object)

    contents = np.empty(n_docs, dtype=object)
    token_pool_size = int(lengths.sum())
    pool = rng.choice(len(full_vocab), size=token_pool_size, p=probs)
    pos = 0
    for i in range(n_docs):
        L = int(lengths[i])
        toks = full_vocab[pool[pos : pos + L]]
        pos += L
        # join with a mix of separators so tokenization is non-trivial
        seps = np.array([" ", "\n", "(", ").", " = ", "\t"], dtype=object)
        sep_choice = seps[rng.randint(0, len(seps), size=max(L - 1, 0))]
        parts = []
        for j, t in enumerate(toks):
            parts.append(t)
            if j < L - 1:
                parts.append(sep_choice[j])
        contents[i] = "".join(parts)

    # plant needles: needle_{k:04d} appears in a known doc set of size 1+k%5
    for k in range(n_needles):
        n_hits = 1 + (k % 5)
        hit_docs = rng.choice(n_docs, size=n_hits, replace=False)
        for d in hit_docs:
            contents[d] = contents[d] + f"\nneedle_{k:04d}()"

    # empty / whitespace-only rows
    n_edge = max(2, n_docs // 500)
    edge_docs = rng.choice(n_docs, size=n_edge, replace=False)
    for j, d in enumerate(edge_docs):
        contents[d] = "" if j % 2 == 0 else "   \n\t  "

    paths = np.array(
        [f"src/pkg{rng.randint(0, 30):02d}/mod_{i:06d}.py" for i in range(n_docs)], dtype=object
    )

    # duplicates: re-emit ~dup_frac of keys with different content (the
    # duplicate row comes LAST in generation order; keep-latest semantics are
    # pinned to deterministic winner selection at build time)
    n_dup = int(n_docs * dup_frac)
    if n_dup:
        dup_src = rng.choice(n_docs, size=n_dup, replace=False)
        repos = np.concatenate([repos, repos[dup_src]])
        paths = np.concatenate([paths, paths[dup_src]])
        langs = np.concatenate([langs, langs[dup_src]])
        dup_contents = np.array(
            [c + "\ndup_marker_token" for c in contents[dup_src]], dtype=object
        )
        contents = np.concatenate([contents, dup_contents])

    commits = np.array([_commit_for_repo(r) for r in repos], dtype=object)
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def reference_query_set(n_needles: int = 8) -> list[dict]:
    """The reference query set (FIXTURES.md §2): one entry per query kind in
    the reference's ES surface (SURVEY.md §2.Q)."""
    queries: list[dict] = [
        {"query_id": 0, "kind": "match", "text": "def", "k": 10},
        {"query_id": 1, "kind": "match", "text": "needle_0000", "k": 10},
        {"query_id": 2, "kind": "match", "text": "return if class", "k": 10},
        {"query_id": 3, "kind": "match", "text": "id_00001 id_00002", "k": 11},
        {"query_id": 4, "kind": "match", "text": "nonexistent_term_zzz", "k": 10},
        {"query_id": 5, "kind": "match", "text": "def", "k": 1},
        {"query_id": 6, "kind": "match", "text": "needle_0001", "k": 100000},
        {"query_id": 7, "kind": "bool_must", "must_terms": ["def", "return"], "k": 10},
        {"query_id": 8, "kind": "bool_must", "must_terms": ["def", "nonexistent_term_zzz"], "k": 10},
        {"query_id": 9, "kind": "bool_must", "must_terms": ["id_00000", "id_00003"], "k": 10},
        {"query_id": 10, "kind": "prefix_content", "prefix": "needle_", "k": 50},
        {"query_id": 11, "kind": "prefix_content", "prefix": "zzz_no_such_", "k": 10},
        {"query_id": 12, "kind": "count", "text": "def"},
        {"query_id": 13, "kind": "count", "text": "needle_0002"},
        {"query_id": 14, "kind": "count", "text": "nonexistent_term_zzz"},
    ]
    for k in range(min(n_needles, 4)):
        queries.append(
            {"query_id": 15 + k, "kind": "match", "text": f"needle_{k:04d}", "k": 10}
        )
    return queries
