"""Training-data pipeline operators over the ``documents`` / ``embeddings``
tables: text analysis, deduplication, similarity search, multimodal stubs.

These are the large-scale-corpus operations a 100 TB training-data pipeline
needs, expressed Ray-Data-first: vectorized map_batches for per-doc scoring,
bucketed groupby for pairwise work (never an unbucketed cross join), broadcast
(ray.put) for small query sides, partial top-k per batch before the final
merge.  Every SQL-expressible op has a DuckDB oracle in __ray_entry__.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

# shared token/char semantics (mirrored in oracle SQL)
STOPWORDS = ["a", "and", "in", "is", "it", "of", "the", "to"]
LANG_MARKERS = {
    "de": ["das", "der", "die", "ist", "und"],
    "en": ["and", "is", "of", "the"],
    "es": ["de", "el", "la", "los", "y"],
    "fr": ["des", "et", "le", "les", "un"],
}

_TOKEN_COUNT_RE = r"[a-z0-9_]+"
_ALPHA_CHAR_RE = r"[a-z0-9_]"


def _docs_ds(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _alt(words: list[str]) -> str:
    return r"\b(?:" + "|".join(words) + r")\b"


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def quality_scores(sf_dir: str) -> ray.data.Dataset:
    """Per-doc quality features: char/token counts, avg token length,
    punctuation ratio, stopword ratio — all vectorized pandas str kernels."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        low = text.str.lower()
        n_chars = text.str.len().astype("int64")
        n_tokens = low.str.count(_TOKEN_COUNT_RE).astype("int64")
        alpha_chars = low.str.count(_ALPHA_CHAR_RE).astype("int64")
        ws_chars = text.str.count(r"\s").astype("int64")
        n_ws_tokens = text.str.split().str.len().fillna(0).astype("int64")
        n_stop = low.str.count(_alt(STOPWORDS)).astype("int64")
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "n_ws_tokens": n_ws_tokens,
                "avg_token_len": np.round(
                    np.where(n_tokens > 0, alpha_chars / n_tokens.replace(0, 1), 0.0), 6
                ),
                "punct_ratio": np.round(
                    np.where(n_chars > 0, (n_chars - alpha_chars - ws_chars) / n_chars.replace(0, 1), 0.0), 6
                ),
                "stop_ratio": np.round(
                    np.where(n_tokens > 0, n_stop / n_tokens.replace(0, 1), 0.0), 6
                ),
            }
        )
        return out

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas", batch_size=4096
    )


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """n-gram/marker-word language ID heuristic: count per-language marker
    tokens, argmax with alphabetical tiebreak, 'und' when nothing matches."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        low = batch["text"].fillna("").str.lower()
        counts = {
            lang: low.str.count(_alt(words)).astype("int64")
            for lang, words in sorted(LANG_MARKERS.items())
        }
        cdf = pd.DataFrame(counts)
        best = cdf.idxmax(axis=1)  # first (alphabetical) max — columns sorted
        best[cdf.max(axis=1) == 0] = "und"
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": best.values,
                **{f"c_{lang}": cdf[lang].values for lang in sorted(LANG_MARKERS)},
            }
        )

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas", batch_size=4096
    )


def token_counts_by_lang(sf_dir: str) -> pa.Table:
    """Per-lang corpus totals — partial aggregate per batch, then a tiny
    groupby over the partials (never shuffling row-level data)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        low = batch["text"].fillna("").str.lower()
        b = pd.DataFrame(
            {
                "lang": batch["lang"],
                "n_tokens": low.str.count(_TOKEN_COUNT_RE).astype("int64"),
                "n_chars": batch["text"].fillna("").str.len().astype("int64"),
            }
        )
        g = b.groupby("lang", sort=True).agg(
            n_docs=("n_tokens", "size"),
            total_tokens=("n_tokens", "sum"),
            total_chars=("n_chars", "sum"),
        )
        return g.reset_index()

    partials = _docs_ds(sf_dir, ["lang", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=4096
    )
    final = (
        partials.groupby("lang")
        .aggregate(
            ray.data.aggregate.Sum("n_docs", alias_name="n_docs"),
            ray.data.aggregate.Sum("total_tokens", alias_name="total_tokens"),
            ray.data.aggregate.Sum("total_chars", alias_name="total_chars"),
        )
        .to_pandas()
    )
    return pa.Table.from_pandas(final.sort_values("lang", ignore_index=True), preserve_index=False)


def doc_fingerprints(sf_dir: str) -> ray.data.Dataset:
    """Rolling polynomial fingerprint of the token stream (Rabin-Karp style,
    mod 2^61-1) — order-sensitive document signature.  Not SQL-expressible;
    covered by hermetic unit tests."""
    MOD = (1 << 61) - 1
    BASE = 1_000_003

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        from librecatastro_ray.functions.hashing import term_hash
        from librecatastro_ray.functions.tokenizer import tokenize

        fps = []
        for s in batch["text"].fillna(""):
            h = 0
            for tok in tokenize(s):
                h = (h * BASE + term_hash(tok)) % MOD
            fps.append(h)
        return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": np.array(fps, dtype=np.int64)})

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas", batch_size=2048
    )


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------


def exact_dedup(sf_dir: str) -> pa.Table:
    """Exact dedup: hash text, keep the smallest doc_id per distinct content
    (hash-partition + per-group first; G1 in SURVEY.md §2.G)."""

    def add_sha(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["sha256"] = [
            hashlib.sha256((s or "").encode()).hexdigest() for s in batch["text"]
        ]
        return batch[["doc_id", "sha256"]]

    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        add_sha, batch_format="pandas", batch_size=4096
    )
    out = (
        ds.groupby("sha256")
        .aggregate(
            ray.data.aggregate.Min("doc_id", alias_name="doc_id_keep"),
            ray.data.aggregate.Count(alias_name="n_dups"),
        )
        .to_pandas()
    )
    return pa.Table.from_pandas(out.sort_values("sha256", ignore_index=True), preserve_index=False)


def _char_ngrams(s: str, n: int = 3) -> set[str]:
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.62) -> pa.Table:
    """Near-dup pairs by character-3-gram Jaccard, blocked by ``source``
    (pairwise work only inside a bucket, never a global cross join)."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", ignore_index=True)
        sets = [ _char_ngrams((s or "").lower()) for s in g["text"] ]
        ids = g["doc_id"].to_numpy()
        rows = []
        for i in range(len(g)):
            si = sets[i]
            for j in range(i + 1, len(g)):
                sj = sets[j]
                u = len(si | sj)
                jac = (len(si & sj) / u) if u else 0.0
                if round(jac, 6) >= threshold:
                    rows.append((int(ids[i]), int(ids[j]), round(jac, 6)))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"}
        )

    ds = _docs_ds(sf_dir, ["doc_id", "source", "text"])
    out = ds.groupby("source").map_groups(per_group, batch_format="pandas").to_pandas()
    return pa.Table.from_pandas(
        out.sort_values(["doc_a", "doc_b"], ignore_index=True), preserve_index=False
    )


_MINHASH_PERMS = 64
_LSH_BANDS = 16  # 16 bands x 4 rows
_MERSENNE = (1 << 61) - 1


def _minhash_params(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=_MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=_MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(s: str, n: int = 4) -> np.ndarray:
    out = {
        int.from_bytes(hashlib.md5(s[i : i + n].encode()).digest()[:8], "little")
        & 0x7FFFFFFFFFFFFFFF
        for i in range(max(len(s) - n + 1, 0))
    }
    return np.fromiter(out, dtype=np.uint64, count=len(out))


class MinHasher:
    """Actor-pool stage: permutation parameters built once per actor."""

    def __init__(self, seed: int = 42):
        self.a, self.b = _minhash_params(seed)

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes((text or "").lower())
        if len(h) == 0:
            return np.zeros(_MINHASH_PERMS, dtype=np.uint64)
        # (a*h + b) mod p, vectorized over perms x shingles
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        r = _MINHASH_PERMS // _LSH_BANDS
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            sig = self.signature(text)
            for band in range(_LSH_BANDS):
                key = hashlib.md5(sig[band * r : (band + 1) * r].tobytes()).hexdigest()[:16]
                rows.append((int(doc_id), band, key))
        return pd.DataFrame(rows, columns=["doc_id", "band", "bucket"])


def minhash_lsh_candidates(sf_dir: str, verify_threshold: float = 0.6) -> pa.Table:
    """MinHash+LSH near-dup: shingle → minhash → band → bucket groupby →
    candidate pairs → exact-Jaccard verification.  Deterministic (seeded
    permutations).  Probabilistic recall — covered by unit tests, not SQL."""
    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    bands = ds.map_batches(MinHasher, batch_format="pandas", batch_size=1024, concurrency=(1, 4))

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"].tolist()))
        rows = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return pd.DataFrame(rows, columns=["doc_a", "doc_b"]).astype("int64")

    cand = (
        bands.groupby(["band", "bucket"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(ignore_index=True)
    )
    if cand.empty:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    # verify candidates with exact 4-gram jaccard
    texts = {
        r["doc_id"]: (r["text"] or "").lower()
        for r in ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        ).take_all()
    }
    out_rows = []
    for a, b in cand.itertuples(index=False):
        sa, sb = _char_ngrams(texts[a], 4), _char_ngrams(texts[b], 4)
        u = len(sa | sb)
        jac = (len(sa & sb) / u) if u else 0.0
        if round(jac, 6) >= verify_threshold:
            out_rows.append((int(a), int(b), round(jac, 6)))
    out = pd.DataFrame(out_rows, columns=["doc_a", "doc_b", "jaccard"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"}
    )
    return pa.Table.from_pandas(out.sort_values(["doc_a", "doc_b"], ignore_index=True), preserve_index=False)


class SimHasher:
    """64-bit SimHash over the token multiset (term_hash bits weighted by
    tf)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        from librecatastro_ray.functions.hashing import term_hash
        from librecatastro_ray.functions.tokenizer import tokenize

        out = []
        for s in batch["text"].fillna(""):
            acc = np.zeros(64, dtype=np.int64)
            for tok, tf in Counter(tokenize(s)).items():
                h = term_hash(tok)
                bits = (h >> np.arange(64, dtype=np.uint64)) & 1
                acc += np.where(bits == 1, tf, -tf)
            sim = 0
            for bit in np.nonzero(acc > 0)[0]:
                sim |= 1 << int(bit)
            out.append(sim & 0x7FFFFFFFFFFFFFFF)
        return pd.DataFrame({"doc_id": batch["doc_id"], "simhash": np.array(out, dtype=np.int64)})


def simhash_signatures(sf_dir: str) -> ray.data.Dataset:
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        SimHasher, batch_format="pandas", batch_size=1024, concurrency=(1, 4)
    )


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------


def _load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    vid = t["vec_id"].to_numpy()
    mask = vid < n_queries
    qids = vid[mask]
    Q = np.array(t.filter(pa.array(mask))["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(qids)
    return qids[order], Q[order]


class AnnScorer:
    """Brute-force cosine scorer: the (small) query matrix is broadcast once
    via ray.put and fetched in __init__; each batch emits only its partial
    top-k per query (numpy matmul, no Python loops over rows)."""

    def __init__(self, queries_ref, k: int):
        self.qids, Q = ray.get(queries_ref)
        qn = np.linalg.norm(Q, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        self.Q = Q / qn
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch["vec_id"].to_numpy()
        E = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        en = np.linalg.norm(E, axis=1, keepdims=True)
        en[en == 0] = 1.0
        En = E / en
        C = self.Q @ En.T  # queries x batch
        out_q, out_v, out_c = [], [], []
        for qi, qid in enumerate(self.qids):
            row = C[qi]
            valid = vids != qid
            idx = np.nonzero(valid)[0]
            if len(idx) == 0:
                continue
            take = idx[np.argsort(-row[idx], kind="stable")[: self.k]]
            out_q.extend([int(qid)] * len(take))
            out_v.extend(vids[take].tolist())
            out_c.extend(row[take].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )


def ann_topk(sf_dir: str, n_queries: int = 5, k: int = 10) -> pa.Table:
    """Exact cosine top-k per query vector: per-batch partial top-k, final
    merge + deterministic (round(cos,6) desc, vec_id asc) ranking."""
    queries_ref = ray.put(_load_queries(sf_dir, n_queries))
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    partials = ds.map_batches(
        AnnScorer,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=(1, 4),
    ).to_pandas()
    rows = []
    for qid, g in partials.groupby("query_id", sort=True):
        cos6 = np.round(g["cos"].to_numpy(), 6)
        vids = g["vec_id"].to_numpy()
        order = np.lexsort((vids, -cos6))[:k]
        for rank, i in enumerate(order, 1):
            rows.append((int(qid), rank, int(vids[i]), float(cos6[i])))
    out = pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "cos"]).astype(
        {"query_id": "int64", "rank": "int64", "vec_id": "int64", "cos": "float64"}
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.4) -> pa.Table:
    """Embedding-cosine near-dup pairs (vec_a < vec_b, cos >= threshold).
    All-pairs via a single broadcast of the (small) full matrix per batch —
    at scale this becomes the LSH-bucketed variant (ivf_topk's partitioner)."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    vids_all = t["vec_id"].to_numpy()
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    n = np.linalg.norm(E, axis=1, keepdims=True)
    n[n == 0] = 1.0
    En = E / n
    full_ref = ray.put((vids_all, En))

    def fn(batch: pa.Table) -> pa.Table:
        vids_b = batch["vec_id"].to_numpy()
        Eb = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        nb = np.linalg.norm(Eb, axis=1, keepdims=True)
        nb[nb == 0] = 1.0
        Eb = Eb / nb
        vids_all_, En_ = ray.get(full_ref)
        C = Eb @ En_.T
        a_idx, b_idx = np.nonzero(np.round(C, 6) >= threshold)
        va = vids_b[a_idx]
        vb = vids_all_[b_idx]
        keep = va < vb
        return pa.table(
            {
                "vec_a": pa.array(va[keep], pa.int64()),
                "vec_b": pa.array(vb[keep], pa.int64()),
                "cos": pa.array(np.round(C[a_idx, b_idx][keep], 6), pa.float64()),
            }
        )

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    out = ds.map_batches(fn, batch_format="pyarrow", batch_size=1024).to_pandas()
    return pa.Table.from_pandas(
        out.sort_values(["vec_a", "vec_b"], ignore_index=True), preserve_index=False
    )


class IvfIndex:
    """IVF-style bucketed ANN (the scale path): coarse centroids = the first
    ``n_cells`` vectors (deterministic), every vector assigned to its nearest
    centroid; queries probe the ``nprobe`` nearest cells only.  Approximate —
    recall vs brute force is unit-tested, no SQL oracle."""

    def __init__(self, sf_dir: str, n_cells: int = 8):
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
        self.vids = t["vec_id"].to_numpy()
        E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        n = np.linalg.norm(E, axis=1, keepdims=True)
        n[n == 0] = 1.0
        self.En = E / n
        order = np.argsort(self.vids)
        self.centroids = self.En[order[:n_cells]]
        self.assign = np.argmax(self.En @ self.centroids.T, axis=1)

    def search(self, q: np.ndarray, k: int = 10, nprobe: int = 2) -> list[tuple[int, float]]:
        qn = q / (np.linalg.norm(q) or 1.0)
        cells = np.argsort(-(self.centroids @ qn))[:nprobe]
        mask = np.isin(self.assign, cells)
        idx = np.nonzero(mask)[0]
        cos = self.En[idx] @ qn
        cos6 = np.round(cos, 6)
        order = np.lexsort((self.vids[idx], -cos6))[:k]
        return [(int(self.vids[idx][i]), float(cos6[i])) for i in order]


# ---------------------------------------------------------------------------
# multimodal stub
# ---------------------------------------------------------------------------


class DecodeStub:
    """Multimodal decode stage with REAL Ray plumbing and a STUBBED decoder.

    Treats the payload as an opaque binary column; the actual image/audio
    decode would live in ``_decode`` (the codec libraries are not in this
    container).  The deterministic fake derives metadata from the raw bytes so
    the schema, batch sizing and actor-pool shape are exercised end-to-end.
    """

    def __init__(self, real_decoder: bool = False):
        if real_decoder:
            raise NotImplementedError("image/audio codecs not available in this environment")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [(_s or "") for _s in batch["text"].to_pylist()]
        n_bytes = np.array([len(s.encode("utf-8")) for s in texts], dtype=np.int64)
        # first 8 CHARACTERS (not bytes), to match SQL substr(text, 1, 8)
        head_hex = [s[:8].encode("utf-8").hex().upper() for s in texts]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "head_hex": pa.array(head_hex, pa.string()),
                "fake_width": pa.array(n_bytes % 640, pa.int64()),
                "fake_height": pa.array((n_bytes * 7) % 480, pa.int64()),
            }
        )


def multimodal_decode_stub(sf_dir: str) -> ray.data.Dataset:
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        DecodeStub, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )
