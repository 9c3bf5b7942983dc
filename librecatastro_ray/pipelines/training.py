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
    from librecatastro_ray.sources.readers import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _embeddings_ds(sf_dir: str) -> ray.data.Dataset:
    from librecatastro_ray.sources.readers import read_parquet_clean

    return read_parquet_clean(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )


def _alt(words: list[str]) -> str:
    return r"\b(?:" + "|".join(words) + r")\b"


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def _re_count(arr: pa.Array, pattern: str) -> np.ndarray:
    import pyarrow.compute as pc

    return pc.count_substring_regex(arr, pattern).to_numpy().astype(np.int64)


def quality_scores(sf_dir: str) -> ray.data.Dataset:
    """Per-doc text features in ONE corpus pass: char/token counts
    (canonical + BPE-ish pre-tokens), avg token length, punctuation ratio,
    stopword ratio, plus the marker-word language-ID columns (per-language
    marker counts, argmax ``lang_pred`` with alphabetical tiebreak, 'und'
    when nothing matches) — zero-copy Arrow batches, all counts via re2
    kernels (``pc.count_substring_regex``), ratios in numpy.  The lang
    columns used to be a separate ``lang_id`` registry entry; folding them
    here halves the corpus reads for the per-doc text-feature family."""
    import pyarrow.compute as pc

    langs = sorted(LANG_MARKERS)

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        low = pc.utf8_lower(text)
        n_chars = pc.utf8_length(text).to_numpy().astype(np.int64)
        n_tokens = _re_count(low, _TOKEN_COUNT_RE)
        alpha_chars = _re_count(low, _ALPHA_CHAR_RE)
        ws_chars = _re_count(text, r"\s")
        n_ws_tokens = _re_count(text, r"\S+")  # whitespace-delimited tokens
        n_stop = _re_count(low, _alt(STOPWORDS))
        tok_div = np.where(n_tokens > 0, n_tokens, 1)
        chr_div = np.where(n_chars > 0, n_chars, 1)
        counts = np.stack(
            [_re_count(low, _alt(LANG_MARKERS[lang])) for lang in langs], axis=1
        )
        best_idx = np.argmax(counts, axis=1)  # first (alphabetical) max
        best = np.array(langs, dtype=object)[best_idx]
        best[counts.max(axis=1) == 0] = "und"
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_ws_tokens": pa.array(n_ws_tokens, pa.int64()),
                "n_bpe_tokens": pa.array(_re_count(low, BPE_SPLIT_RE), pa.int64()),
                "avg_token_len": pa.array(
                    np.round(np.where(n_tokens > 0, alpha_chars / tok_div, 0.0), 6)
                ),
                "punct_ratio": pa.array(
                    np.round(
                        np.where(n_chars > 0, (n_chars - alpha_chars - ws_chars) / chr_div, 0.0),
                        6,
                    )
                ),
                "stop_ratio": pa.array(
                    np.round(np.where(n_tokens > 0, n_stop / tok_div, 0.0), 6)
                ),
                "lang_pred": pa.array(best, pa.string()),
                **{f"c_{lang}": pa.array(counts[:, i], pa.int64())
                   for i, lang in enumerate(langs)},
            }
        )

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=4096
    )


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """n-gram/marker-word language ID heuristic: count per-language marker
    tokens (re2 kernels), argmax with alphabetical tiebreak, 'und' when
    nothing matches."""
    import pyarrow.compute as pc

    langs = sorted(LANG_MARKERS)

    def fn(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.fill_null(batch["text"].combine_chunks(), ""))
        counts = np.stack(
            [_re_count(low, _alt(LANG_MARKERS[lang])) for lang in langs], axis=1
        )
        best_idx = np.argmax(counts, axis=1)  # first (alphabetical) max
        best = np.array(langs, dtype=object)[best_idx]
        best[counts.max(axis=1) == 0] = "und"
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(best, pa.string()),
                **{f"c_{lang}": pa.array(counts[:, i], pa.int64())
                   for i, lang in enumerate(langs)},
            }
        )

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=4096
    )


def token_counts_by_lang(sf_dir: str) -> pa.Table:
    """Per-lang corpus totals — partial aggregate per batch (Arrow group-by
    kernels), then a tiny groupby over the partials (never shuffling
    row-level data)."""
    import pyarrow.compute as pc

    partial_schema = pa.schema(
        [("lang", pa.string()), ("n_docs", pa.int64()),
         ("total_tokens", pa.int64()), ("total_chars", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return partial_schema.empty_table()
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        low = pc.utf8_lower(text)
        t = pa.table(
            {
                "lang": batch["lang"],
                "n_tokens": pa.array(_re_count(low, _TOKEN_COUNT_RE), pa.int64()),
                "n_chars": pc.utf8_length(text).cast(pa.int64()),
            }
        )
        g = t.group_by("lang", use_threads=False).aggregate(
            [([], "count_all"), ("n_tokens", "sum"), ("n_chars", "sum")]
        )
        return pa.table(
            {
                "lang": g["lang"],
                "n_docs": g["count_all"].cast(pa.int64()),
                "total_tokens": g["n_tokens_sum"],
                "total_chars": g["n_chars_sum"],
            }
        )

    partials = _docs_ds(sf_dir, ["lang", "text"]).map_batches(
        partial, batch_format="pyarrow", batch_size=4096
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


_FP_MOD = np.uint64((1 << 61) - 1)  # Mersenne prime 2^61-1
_FP_BASE = np.uint64(1_000_003)  # < 2^20, so h*BASE splits into u64-safe parts


def _fp_horner_step(h: np.ndarray, th: np.ndarray) -> np.ndarray:
    """One exact Horner step ``(h*BASE + th) mod (2^61-1)`` vectorized in
    uint64 without overflow: split h = h_hi·2^41 + h_lo (h_hi < 2^20), use
    2^61 ≡ 1 (mod p) to fold h_hi·BASE·2^41, then one fold + conditional
    subtract.  Bit-identical to Python's arbitrary-precision
    ``(h*BASE + term_hash) % MOD``."""
    h_hi = h >> np.uint64(41)  # < 2^20
    h_lo = h & np.uint64((1 << 41) - 1)  # < 2^41
    t = h_hi * _FP_BASE  # < 2^40
    val = (t >> np.uint64(20)) + ((t & np.uint64(0xFFFFF)) << np.uint64(41)) + h_lo * _FP_BASE
    val = val + th  # both < 2^63 → sum < 2^64, no wrap
    val = (val >> np.uint64(61)) + (val & _FP_MOD)  # 2^61 ≡ 1 fold, < p + 8
    return np.where(val >= _FP_MOD, val - _FP_MOD, val)


def _fingerprint_batch(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Rolling Rabin-Karp fingerprints of the token streams of a whole batch.
    Vectorized ACROSS documents: tokens are hashed once per unique term, then
    the Horner recurrence iterates over token POSITIONS (max_dl rounds of
    uint64 vector math) instead of a per-doc per-token Python loop."""
    from librecatastro_ray.functions.hashing import term_hash
    from librecatastro_ray.functions.tokenizer import tokenize_batch

    _parent, terms, dl = tokenize_batch(texts)
    n_docs = len(dl)
    h = np.zeros(n_docs, dtype=np.uint64)
    if len(terms) == 0:
        return h.astype(np.int64)
    uniq, inv = np.unique(terms, return_inverse=True)
    hu = np.fromiter((term_hash(t) for t in uniq), dtype=np.uint64, count=len(uniq))
    th = hu[inv]  # token hashes in (doc, position) order
    off = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(dl[:-1], out=off[1:])
    for j in range(int(dl.max())):
        active = dl > j
        idx = off[active] + j
        h[active] = _fp_horner_step(h[active], th[idx])
    return h.astype(np.int64)


def doc_fingerprints(sf_dir: str) -> ray.data.Dataset:
    """Rolling polynomial fingerprint of the token stream (Rabin-Karp style,
    mod 2^61-1) — order-sensitive document signature.  Not SQL-expressible;
    bit-identity with the scalar Python recurrence is unit-tested."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pa.array(_fingerprint_batch(batch["text"]), pa.int64()),
            }
        )

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=2048
    )


# the structured "entry" vocabulary the primary parse extracts (the test
# corpus has no XML; these rare-ish tokens play the role of parseable refs)
PRIMARY_ENTRY_TERMS = ["dup", "spark", "vector"]


def parse_entries_fallback(sf_dir: str) -> ray.data.Dataset:
    """B2/B3: 1→N record parse with an error-code guard and per-doc
    FALLBACK recovery — the reference's parser shape (parser_xml.py:194-310:
    one XML → N CadasterEntry rows with an error-code short-circuit at
    :208-209; parser_xml.py:87-124: a record whose primary parse yields
    nothing recovers through the alternate address key).

    Here: each doc expands to one row per DISTINCT primary entry term it
    contains (``via='primary'``, with its occurrence count); a doc with no
    primary entry recovers through its alternate key — the language field —
    as ``via='fallback'``; an empty payload short-circuits to a single
    ``via='error'`` row.  Fully vectorized: one Arrow-C++ tokenize+tf pass
    per batch, numpy membership/masking, no per-row Python."""
    import pyarrow.compute as pc

    from librecatastro_ray.functions.tokenizer import term_frequencies_batch

    prim_arr = np.array(PRIMARY_ENTRY_TERMS)

    def parse(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch["text"].combine_chunks(), "")
        langs = pc.fill_null(batch["lang"].combine_chunks(), "").to_numpy(
            zero_copy_only=False
        )
        ids = batch["doc_id"].to_numpy()
        tf_table, _dl = term_frequencies_batch(texts)
        rows = tf_table["row"].to_numpy()
        terms = tf_table["term"].to_numpy(zero_copy_only=False)
        tfs = tf_table["tf"].to_numpy()
        is_prim = np.isin(terms, prim_arr)
        p_rows, p_terms, p_tfs = rows[is_prim], terms[is_prim], tfs[is_prim]
        has_prim = np.zeros(len(ids), dtype=bool)
        has_prim[p_rows] = True
        empty = pc.equal(texts, "").to_numpy(zero_copy_only=False)
        fb = ~has_prim & ~empty  # non-empty doc, primary parse found nothing
        err = empty
        fb_keys = np.char.add("lang:", langs[fb].astype(str))
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([ids[p_rows], ids[fb], ids[err]]), pa.int64()
                ),
                "entry_key": pa.array(
                    np.concatenate([p_terms.astype(str), fb_keys,
                                    np.full(err.sum(), "", dtype=object)]),
                    pa.string(),
                ),
                "n_occurrences": pa.array(
                    np.concatenate([p_tfs,
                                    np.ones(int(fb.sum()), np.int64),
                                    np.zeros(int(err.sum()), np.int64)]),
                    pa.int64(),
                ),
                "via": pa.array(
                    ["primary"] * len(p_rows) + ["fallback"] * int(fb.sum())
                    + ["error"] * int(err.sum()),
                    pa.string(),
                ),
            }
        )

    return _docs_ds(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        parse, batch_format="pyarrow", batch_size=4096
    )


def train_val_split(
    sf_dir: str, val_frac: float = 0.05, test_frac: float = 0.05
) -> ray.data.Dataset:
    """Deterministic hash-based dataset split (the standard train/val/test
    assignment a training pipeline needs): each doc's 63-bit md5 hash of
    ``'split:<doc_id>'`` maps to a uniform u ∈ [0, 1); test takes the top
    ``test_frac``, val the next ``val_frac``, train the rest.  Stateless and
    embarrassingly parallel — membership is a pure function of doc_id, so
    the split is stable under re-runs, resharding and corpus growth
    (existing docs never migrate between splits).  Exact SQL replay via the
    same md5 integer rule the term-hash oracle uses (computed directly —
    split keys are one-shot, so going through the term-hash LRU would fill
    it with never-reused entries and evict real term caching)."""
    lo = 1.0 - val_frac - test_frac
    hi = 1.0 - test_frac
    scale = float(1 << 63)

    def md5_63(key: str) -> int:
        return int.from_bytes(
            hashlib.md5(key.encode()).digest()[:8], "little"
        ) & 0x7FFFFFFFFFFFFFFF

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        u = np.fromiter(
            (md5_63(f"split:{int(d)}") for d in ids),
            dtype=np.int64, count=len(ids),
        ) / scale
        split = np.where(u < lo, "train", np.where(u < hi, "val", "test"))
        return pa.table({
            "doc_id": t["doc_id"],
            "split": pa.array(split, pa.string()),
            "u": pa.array(np.round(u, 6), pa.float64()),
        })

    return _docs_ds(sf_dir, ["doc_id"]).map_batches(
        assign, batch_format="pyarrow", batch_size=8192
    )


def concat_chunks(sf_dir: str, chunk_tokens: int = 512) -> ray.data.Dataset:
    """Concat-then-chunk sequence packing (the standard LLM pretraining
    regime: documents of one stream are concatenated in doc_id order and
    cut every ``chunk_tokens`` tokens).  Per doc: its token offset in the
    stream and the first/last chunk it lands in (a doc can span chunks).

    Distribution — the textbook TWO-ROUND DISTRIBUTED PREFIX SUM, so no
    single task ever holds a whole stream (a 100 TB corpus can have one
    multi-TB source): one token-count pass (vectorized tokenizer, 24 B/row
    key rows out) → key-only distributed sort by (source, doc_id) → round
    1 computes each sorted block's per-source token totals (tiny tables) →
    the driver folds them into per-(block, source) base offsets — O(blocks
    + sources) rows, never corpus-scale — → round 2 assigns chunks inside
    each block from its broadcast base offsets (vectorized segmented
    cumsum).  Raw Ray tasks carry rounds 1–2 because the Dataset API has
    no order-aware per-block index; the partitioning assumption is only
    that the SORT is correct.  Exact SQL replay via a window cumsum."""

    def counts(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        low = pc.utf8_lower(pc.fill_null(t["text"].combine_chunks(), ""))
        return pa.table({
            "doc_id": t["doc_id"],
            "source": pc.fill_null(t["source"].combine_chunks(), ""),
            "n_tokens": pa.array(_re_count(low, _TOKEN_COUNT_RE), pa.int64()),
        })

    sorted_ds = (
        _docs_ds(sf_dir, ["doc_id", "source", "text"])
        .map_batches(counts, batch_format="pyarrow", batch_size=4096)
        .sort(["source", "doc_id"])  # key-only rows enter the sort
    )
    block_refs = list(sorted_ds.to_arrow_refs())  # globally ordered blocks

    _EMPTY_OUT = pa.table({
        "doc_id": pa.array([], pa.int64()), "source": pa.array([], pa.string()),
        "n_tokens": pa.array([], pa.int64()), "tok_offset": pa.array([], pa.int64()),
        "chunk_first": pa.array([], pa.int64()), "chunk_last": pa.array([], pa.int64()),
    })
    if not block_refs:
        return ray.data.from_arrow(_EMPTY_OUT)

    @ray.remote
    def block_sums(t: pa.Table) -> pa.Table:
        # guard BEFORE touching columns: an all-empty sorted dataset emits
        # SCHEMALESS empty blocks (Ray Data 2.49 pitfall)
        if t.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "total": pa.array([], pa.int64())})
        # per-source token totals of one sorted block (sources are runs)
        src = t["source"].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy()
        change = np.ones(len(src), dtype=bool)
        change[1:] = src[1:] != src[:-1]
        starts = np.nonzero(change)[0]
        return pa.table({
            "source": pa.array(src[starts], pa.string()),
            "total": pa.array(np.add.reduceat(n, starts), pa.int64()),
        })

    summaries = ray.get([block_sums.remote(r) for r in block_refs])
    # driver fold: exclusive per-source running totals → each block's base
    # offset per source (O(blocks + sources) work and memory)
    bases: list[dict[str, int]] = []
    running: dict[str, int] = {}
    for summ in summaries:
        blk = {}
        for s_, tot in zip(summ["source"].to_pylist(), summ["total"].to_pylist()):
            blk[s_] = running.get(s_, 0)
            running[s_] = running.get(s_, 0) + int(tot)
        bases.append(blk)

    @ray.remote
    def assign(t: pa.Table, base: dict) -> pa.Table:
        if t.num_rows == 0:  # schemaless-empty-block guard, as in block_sums
            return _EMPTY_OUT
        src = t["source"].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy()
        # segmented exclusive cumsum within the block + per-source base
        change = np.ones(len(src), dtype=bool)
        change[1:] = src[1:] != src[:-1]
        run_starts = np.nonzero(change)[0]
        cum = np.concatenate([[0], np.cumsum(n)[:-1]])
        seg_base = np.repeat(cum[run_starts], np.diff(np.append(run_starts, len(src))))
        base_arr = np.fromiter((base[s_] for s_ in src[run_starts]),
                               dtype=np.int64, count=len(run_starts))
        off = cum - seg_base + np.repeat(base_arr, np.diff(np.append(run_starts, len(src))))
        return pa.table({
            "doc_id": t["doc_id"],
            "source": t["source"],
            "n_tokens": pa.array(n, pa.int64()),
            "tok_offset": pa.array(off, pa.int64()),
            "chunk_first": pa.array(off // chunk_tokens, pa.int64()),
            "chunk_last": pa.array(np.maximum(off, off + n - 1) // chunk_tokens, pa.int64()),
        })

    # STREAMING result: the assigned blocks stay in the (spillable) object
    # store — nothing corpus-scale ever lands on the driver; the at-scale
    # tail is .write_parquet, small consumers .to_pandas()
    return ray.data.from_arrow_refs(
        [assign.remote(r, b) for r, b in zip(block_refs, bases)]
    )


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------


def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup: hash text, keep the smallest doc_id per distinct content
    (hash-partition + per-group first; G1 in SURVEY.md §2.G).  Returns a
    STREAMING Dataset (sorted by sha256 for determinism): the result is one
    row per distinct content — corpus-sized for a mostly-unique corpus — so
    it must reach its sink (write_parquet / iter_batches) without a driver
    ``.to_pandas()`` materialization."""

    def add_sha(batch: pa.Table) -> pa.Table:
        # Arrow out: keeps the downstream groupby's schemas hashable (a
        # pandas return attaches dict-valued metadata that defeats Ray's
        # shuffle schema dedup — see MinHasher.__call__)
        from librecatastro_ray.functions.hashing import sha256_batch

        return pa.table({
            "doc_id": batch["doc_id"],
            "sha256": sha256_batch(batch["text"]),
        })

    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        add_sha, batch_format="pyarrow", batch_size=4096
    )
    return (
        ds.groupby("sha256")
        .aggregate(
            ray.data.aggregate.Min("doc_id", alias_name="doc_id_keep"),
            ray.data.aggregate.Count(alias_name="n_dups"),
        )
        .sort("sha256")
    )


def _char_ngrams(s: str, n: int = 3) -> set[str]:
    return {s[i : i + n] for i in range(len(s) - n + 1)}


_NGRAM_BUCKET_CAP = 4096  # scale guard: a source bucket is all-pairs work


def ngram_jaccard_pairs(
    sf_dir: str,
    threshold: float = 0.62,
    bucket_cap: int = _NGRAM_BUCKET_CAP,
    num_partitions: int | None = None,
    return_stats: bool = False,
    sketch: bool | None = None,
) -> pa.Table | tuple[pa.Table, dict]:
    """Near-dup pairs by character-3-gram Jaccard, blocked by ``source``
    (pairwise work only inside a bucket, never a global cross join).

    DISTRIBUTED: in-bucket candidate pairs come from a native hash self-join
    of the (doc_id, source) key rows on ``source`` (text never enters the
    pair-expansion shuffle), texts attach to the pairs via two more hash
    joins, and the exact-Jaccard verification runs vectorized in map_batches
    (:func:`_verify_pairs` — gram sets built once per distinct doc per batch,
    intersections as sorted-array numpy kernels).  No single task ever holds
    a whole bucket's all-pairs work.

    Degenerate buckets are still capped at ``bucket_cap`` docs (smallest
    doc_ids win, deterministic) because the op is inherently O(n²) per
    bucket; unlike the round-2 version the dropped-pair count is RETURNED
    (``return_stats=True`` → ``(pairs, stats)`` with dropped_pairs,
    capped_sources, candidates, sketch_prefilter and — when the sketch path
    engages — prefilter_survivors + the text-bytes-through-join reduction)
    instead of logged.  ``sketch=None`` auto-engages the gram-sketch
    candidate pre-filter on large-doc corpora (_SKETCH_MIN_TLEN)."""
    from ray.data.aggregate import Count

    ds = _docs_ds(sf_dir, ["doc_id", "source", "text"])
    keys = ds.map_batches(
        # NULL-source docs are DROPPED from pairing — SQL join-key semantics
        # (the oracle's `a.source = b.source` never matches NULL), and it
        # keeps an unknown-provenance-heavy corpus from collapsing into one
        # degenerate mega-bucket
        lambda t: t.select(["doc_id", "source"]).filter(
            pa.compute.is_valid(t["source"].combine_chunks())),
        batch_format="pyarrow",
    ).materialize()  # key rows (~20 B/doc) — consumed by sizes + both join sides
    num_partitions = _shuffle_width(keys.count(), 2048, num_partitions)
    # bucket sizes: tiny vectorized aggregate; only the over-cap tail (a >cap
    # bucket means >cap docs sharing one source) is collected on the driver
    sizes = keys.groupby("source").aggregate(Count(alias_name="bsize"))
    big = sizes.map_batches(
        lambda t: t.filter(pa.compute.greater(t["bsize"], bucket_cap)),
        batch_format="pyarrow",
    ).to_pandas()
    stats = {"dropped_pairs": 0, "capped_sources": {}}
    left = keys
    if "source" in big.columns and not big.empty:
        # per-big-source doc_id cutoff (= the cap-th smallest): few groups,
        # key-only rows
        big_set = set(big["source"].tolist())
        big_ref = ray.put(big_set)

        def only_big(t: pa.Table) -> pa.Table:
            return t.filter(pa.compute.is_in(
                t["source"], value_set=pa.array(sorted(ray.get(big_ref)))))

        def cutoff(g: pd.DataFrame) -> pd.DataFrame:
            ids = np.sort(g["doc_id"].to_numpy())
            return pd.DataFrame({"source": [g["source"].iloc[0]],
                                 "cut": [int(ids[bucket_cap - 1])]})

        cuts = (
            keys.map_batches(only_big, batch_format="pyarrow")
            .groupby("source")
            .map_groups(cutoff, batch_format="pandas")
            .to_pandas()
        )
        cut_map = dict(zip(cuts["source"], cuts["cut"]))
        for _, r in big.iterrows():
            n = int(r["bsize"])
            stats["dropped_pairs"] += n * (n - 1) // 2 - bucket_cap * (bucket_cap - 1) // 2
            stats["capped_sources"][str(r["source"])] = n
        cuts_ref = ray.put(cut_map)

        def apply_cap(t: pa.Table) -> pa.Table:
            cm = ray.get(cuts_ref)
            src = t["source"].to_numpy(zero_copy_only=False)
            ids = t["doc_id"].to_numpy()
            lim = np.fromiter((cm.get(s, np.iinfo(np.int64).max) for s in src),
                              dtype=np.int64, count=len(src))
            return t.filter(pa.array(ids <= lim))

        left = keys.map_batches(apply_cap, batch_format="pyarrow")
    right = left.map_batches(
        lambda t: pa.table({"source": t["source"], "doc_id_r": t["doc_id"]}),
        batch_format="pyarrow",
    )
    pairs = (
        left.join(right, "inner", num_partitions, on=("source",))
        .map_batches(
            lambda t: pa.table({"doc_a": t["doc_id"], "doc_b": t["doc_id_r"]})
            .filter(pa.compute.less(t["doc_id"], t["doc_id_r"])),
            batch_format="pyarrow",
        )
        .materialize()  # join barrier (two JoinOperators in one DAG deadlock)
    )
    stats["candidates"] = int(pairs.count())
    if stats["candidates"] == 0:
        return (_empty_pairs(), stats) if return_stats else _empty_pairs()
    texts = ds.map_batches(
        lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
    )
    # sketch pre-filter (same engine as the LSH path, 3-gram identity;
    # engages on large-doc corpora only — see _SKETCH_MIN_TLEN): bottom-k
    # gram sketches ride the candidate joins, full text attaches only to
    # pairs that could still clear the threshold
    if sketch is None:
        sketch = _mean_tlen(texts) >= _SKETCH_MIN_TLEN
    stats["sketch_prefilter"] = bool(sketch)
    verify_src = pairs
    if sketch:
        verify_src, pre_stats = _sketch_prefilter_pairs(
            pairs, texts, 3, threshold, num_partitions, return_stats
        )
        stats.update(pre_stats)
        if stats["prefilter_survivors"] == 0:
            return (_empty_pairs(), stats) if return_stats else _empty_pairs()
    with_a = _attach_text(verify_src, texts, "doc_a", "text_a", num_partitions).materialize()
    with_ab = _attach_text(with_a, texts, "doc_b", "text_b", num_partitions)
    out = with_ab.map_batches(
        lambda b: _verify_pairs(b, threshold, n=3), batch_format="pandas"
    ).to_pandas()  # verified pairs: output-scale
    table = (
        _empty_pairs()
        if out.empty
        else pa.Table.from_pandas(
            out.sort_values(["doc_a", "doc_b"], ignore_index=True), preserve_index=False
        )
    )
    return (table, stats) if return_stats else table


_MINHASH_PERMS = 64
_LSH_BANDS = 16  # 16 bands x 4 rows
_MERSENNE = (1 << 61) - 1
# scale guard: a degenerate bucket (thousands of identical docs) would emit
# O(n²) pairs from ONE group task; cap the per-bucket membership (smallest
# doc_ids win, deterministic).  Sized far above anything the test corpora
# produce, so capped and uncapped outputs agree there.
_LSH_BUCKET_CAP = 512


def _minhash_params(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=_MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=_MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
    return a, b


def _segment_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] — per-segment position indices."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


class MinHasher:
    """Actor-pool stage: permutation parameters built once per actor;
    per-batch work is fully vectorized (one rolling-window shingle-hash pass
    over the batch's concatenated UTF-8 bytes, then 64 segmented-min
    reductions) — no per-row / per-shingle Python.

    Shingles are byte 4-grams of the lowercased text (a deterministic
    FNV-style window hash + splitmix64 finalizer); candidate recall only
    depends on the hash being uniform, and verification is exact character
    n-gram Jaccard, so the bucket hash choice never changes verified output.
    """

    def __init__(self, seed: int = 42, shingle_n: int = 4):
        self.a, self.b = _minhash_params(seed)
        self.n = shingle_n

    def _window_hashes(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """(hashes of every byte n-gram window, windows-per-doc)."""
        enc = [(t or "").lower().encode("utf-8") for t in texts]
        lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
        n_win = np.maximum(lens - (self.n - 1), 0)
        total = int(n_win.sum())
        if total == 0:
            return np.zeros(0, dtype=np.uint64), n_win
        buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
        doc_off = np.zeros(len(enc), dtype=np.int64)
        np.cumsum(lens[:-1], out=doc_off[1:])
        starts = np.repeat(doc_off, n_win) + _segment_arange(n_win)
        h = np.zeros(total, dtype=np.uint64)
        for k in range(self.n):
            h = h * np.uint64(0x100000001B3) + buf[starts + k]
        return _splitmix64(h), n_win

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, PERMS) uint64 minhash signature matrix (empty doc → 0s).
        Duplicate shingles need no dedup: min() is idempotent under repeats."""
        h, n_win = self._window_hashes(texts)
        sig = np.zeros((len(texts), _MINHASH_PERMS), dtype=np.uint64)
        if len(h) == 0:
            return sig
        starts = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(n_win[:-1], out=starts[1:])
        nonempty = n_win > 0
        ne_starts = starts[nonempty]
        for p in range(_MINHASH_PERMS):
            v = (self.a[p] * h + self.b[p]) % np.uint64(_MERSENNE)
            sig[nonempty, p] = np.minimum.reduceat(v, ne_starts)
        return sig

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Arrow in / Arrow out: a pandas return would re-attach pandas schema
        # metadata whose dict values make the schema UNHASHABLE, defeating
        # Ray's schema dedup in every downstream hash shuffle (the bucket
        # groupby and the candidate self-join both consume these blocks)
        sig = self.signatures(batch["text"].to_pylist())
        r = _MINHASH_PERMS // _LSH_BANDS
        s3 = sig.reshape(len(sig), _LSH_BANDS, r)
        key = np.zeros((len(sig), _LSH_BANDS), dtype=np.uint64)
        for j in range(r):
            key = key * np.uint64(0x9E3779B97F4A7C15) + s3[:, :, j]
            key ^= key >> np.uint64(29)
        return pa.table(
            {
                "doc_id": pa.array(
                    np.repeat(batch["doc_id"].to_numpy(), _LSH_BANDS).astype("int64"),
                    pa.int64(),
                ),
                "band": pa.array(
                    np.tile(np.arange(_LSH_BANDS, dtype=np.int64), len(sig)), pa.int64()
                ),
                "bucket": pa.array(
                    (key.reshape(-1) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )



def _shuffle_width(
    row_count: int, rows_per_partition: int, num_partitions: int | None = None
) -> int:
    """Scale-aware hash-shuffle width, shared by every dedup/curation join:
    the caller's explicit override RETURNED UNCHANGED, else a CPU clamp (the
    join's aggregator actor pool starves when partitions outnumber what the
    cluster can host) narrowed proportionally to the input rows so tiny
    corpora don't fan out into mostly-empty partitions (whose schema-less
    bundles trip the executor's schema-drift warning).  A 100 TB corpus
    keeps the CPU clamp."""
    if num_partitions is not None:
        return max(2, num_partitions)
    width = max(2, min(64, int(ray.cluster_resources().get("CPU", 4))))
    return max(2, min(width, row_count // rows_per_partition + 1))


def _pairs_in_bucket(g: pd.DataFrame, carry: tuple[str, ...] = (),
                     cap: int = _LSH_BUCKET_CAP) -> pa.Table:
    docs = g.drop_duplicates("doc_id").sort_values("doc_id")
    if len(docs) > cap:
        docs = docs.iloc[:cap]
    ids = docs["doc_id"].to_numpy()
    a_idx, b_idx = np.triu_indices(len(ids), k=1)
    cols = {"doc_a": pa.array(ids[a_idx], pa.int64()),
            "doc_b": pa.array(ids[b_idx], pa.int64())}
    # carry columns grouped all-_a-then-all-_b, matching the self-join branch
    # of _bucketed_pair_candidates (a union of the two with ≥2 carry columns
    # would otherwise hit a column-order mismatch)
    for c in carry:
        cols[f"{c}_a"] = pa.array(docs[c].to_numpy()[a_idx], pa.int64())
    for c in carry:
        cols[f"{c}_b"] = pa.array(docs[c].to_numpy()[b_idx], pa.int64())
    return pa.table(cols)


def _empty_pairs() -> pa.Table:
    return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                     "jaccard": pa.array([], pa.float64())})


def _attach_text(pairs: ray.data.Dataset, texts: ray.data.Dataset, key_col: str,
                 out_col: str, num_partitions: int,
                 value_col: str = "text") -> ray.data.Dataset:
    """Hash-join one column (``value_col``, default the doc text) onto
    candidate pairs by doc id (Ray Data's native distributed hash join — no
    driver-side materialization of either side, no per-group Python)."""
    side = texts.map_batches(
        lambda t: pa.table({"__jk": t["doc_id"], out_col: t[value_col]}),
        batch_format="pyarrow",
    )
    # the join emits left columns + right non-key columns (the right key is
    # represented by key_col itself)
    return pairs.join(side, "inner", num_partitions, on=(key_col,), right_on=("__jk",))


def _attach_cols(pairs: ray.data.Dataset, side: ray.data.Dataset, key_col: str,
                 suffix: str, cols: tuple[str, ...],
                 num_partitions: int) -> ray.data.Dataset:
    """Hash-join several SMALL per-doc columns onto candidate pairs by doc
    id (native distributed join, the multi-column sibling of
    :func:`_attach_text`)."""
    side2 = side.map_batches(
        lambda t: pa.table({"__jk": t["doc_id"],
                            **{f"{c}{suffix}": t[c] for c in cols}}),
        batch_format="pyarrow",
    )
    return pairs.join(side2, "inner", num_partitions, on=(key_col,), right_on=("__jk",))


# --- gram-sketch candidate pre-filter -------------------------------------
#
# The exact-Jaccard verify joins used to attach FULL document text once per
# candidate pair — at 100 KB/doc × candidate scale, the biggest byte-mover
# in the dedup family (round-3 verdict).  Instead, a fixed-width bottom-k
# gram-hash sketch (k × 8 B) + the exact distinct-gram count ride the
# candidate joins, a conservative pre-filter kills pairs that cannot clear
# the threshold, and full text attaches only to the survivors.

_SKETCH_K = 256
_SKETCH_PAD_BASE = np.uint64(0xFFFFFFFF00000000)
# engage the sketch path only when documents OUTWEIGH their sketches: below
# this mean text length the sketch (k x 8 B) is as big as the text itself
# and the two extra candidate joins are pure overhead (measured at sf0.1,
# ~390 B/doc: sketches DOUBLED wall time) — small-doc corpora attach text
# directly; the 100 KB-doc regime the 100 TB design targets engages it
_SKETCH_MIN_TLEN = 4 * _SKETCH_K * 8


def _mean_tlen(texts: ray.data.Dataset, sample: int = 8192) -> float:
    """Mean text length over a deterministic prefix sample — the cheap
    engage-the-sketch-path heuristic (one pruned-column partial pass)."""
    import pyarrow.compute as pc

    t = texts.limit(sample).map_batches(
        lambda b: pa.table({
            "s": pa.array([int(pc.sum(pc.utf8_length(pc.fill_null(
                b["text"].combine_chunks(), ""))).as_py() or 0)], pa.int64()),
            "n": pa.array([len(b)], pa.int64()),
        }),
        batch_format="pyarrow",
    ).to_pandas()
    return float(t["s"].sum()) / max(int(t["n"].sum()), 1)


def _splitmix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates nearby window hashes."""
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def _char_gram_hashes(texts: list[str], n: int) -> tuple[np.ndarray, np.ndarray]:
    """64-bit hashes of every CHARACTER n-gram window of each lowercased
    text (UTF-32 code points — the same gram identity the exact verify's
    :func:`_gram_set_np` compares), concatenated across the batch; returns
    ``(hashes, windows_per_doc)``.  One vectorized pass, no per-gram
    Python."""
    enc = [(t or "").lower().encode("utf-32-le") for t in texts]
    lens = np.fromiter((len(e) // 4 for e in enc), dtype=np.int64, count=len(enc))
    n_win = np.maximum(lens - (n - 1), 0)
    total = int(n_win.sum())
    if total == 0:
        return np.zeros(0, dtype=np.uint64), n_win
    buf = np.frombuffer(b"".join(enc), dtype=np.uint32)
    doc_off = np.zeros(len(enc), dtype=np.int64)
    np.cumsum(lens[:-1], out=doc_off[1:])
    starts = np.repeat(doc_off, n_win) + _segment_arange(n_win)
    h = np.zeros(total, dtype=np.uint64)
    for k in range(n):
        h = h * np.uint64(0x100000001B3) + buf[starts + k]
    return _splitmix64(h), n_win


class GramSketcher:
    """Actor-pool stage: (doc_id, text) → (doc_id, sketch, gsize, tlen)
    where ``sketch`` is the bottom-``k`` DISTINCT gram hashes (sorted
    ascending, uint64 little-endian bytes — ≤ k·8 B however long the doc),
    ``gsize`` the exact distinct-gram count and ``tlen`` the text length.
    Fully vectorized: one window-hash pass, one lexsort for per-doc distinct
    + bottom-k; per-doc Python is only the final ``tobytes`` slice."""

    def __init__(self, n: int = 4, k: int = _SKETCH_K):
        self.n, self.k = int(n), int(k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        h, n_win = _char_gram_hashes(texts, self.n)
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), n_win)
        order = np.lexsort((h, doc_idx))
        hs, ds_ = h[order], doc_idx[order]
        first = np.concatenate(
            [[True], (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])]
        ) if len(hs) else np.zeros(0, dtype=bool)
        dd, hh = ds_[first], hs[first]
        gsizes = np.bincount(dd, minlength=len(texts)).astype(np.int64)
        keep = _segment_arange(gsizes) < self.k
        flat = hh[keep]
        kept = np.minimum(gsizes, self.k)
        offs = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(kept, out=offs[1:])
        return pa.table({
            "doc_id": batch["doc_id"],
            "sketch": pa.array(
                [flat[offs[i]: offs[i + 1]].tobytes() for i in range(len(texts))],
                pa.binary(),
            ),
            "gsize": pa.array(gsizes, pa.int64()),
            "tlen": pa.array([len(t or "") for t in texts], pa.int64()),
        })


def _sketch_matrix(col, k: int, parity: int) -> np.ndarray:
    """(P, k) uint64 matrix from variable-length sketch bytes, padded with
    row-position-unique sentinels above every real hash (even series for
    side a, odd for side b — pads never match pads or reals), so rows stay
    sorted ascending."""
    bufs = col.to_pylist()
    lens = np.fromiter((len(b) // 8 for b in bufs), dtype=np.int64, count=len(bufs))
    pads = _SKETCH_PAD_BASE + (
        np.arange(k, dtype=np.uint64) * np.uint64(2) + np.uint64(parity)
    )
    M = np.tile(pads, (len(bufs), 1))
    if int(lens.sum()):
        flat = np.frombuffer(b"".join(bufs), dtype=np.uint64)
        M[np.repeat(np.arange(len(bufs)), lens), _segment_arange(lens)] = flat
    return M


def _sketch_prefilter(t: pa.Table, threshold: float, k: int = _SKETCH_K) -> pa.Table:
    """Conservative pre-filter over sketch-attached candidate pairs: a HARD
    gram-set-size-ratio bound (J ≤ min/max — exact, zero false negatives)
    plus the bottom-k merge estimate with a 7σ margin (≈3.5/√k; pairs whose
    whole gram sets fit in the sketches are estimated EXACTLY, margin 1e-6).
    Only pairs that could still clear ``threshold`` keep their (doc_a,
    doc_b, tlen) columns for the full-text exact verify; a borderline-true
    pair is dropped only with probability ≲1e-9, and the sketches are
    deterministic, so a green oracle run stays green."""
    if len(t) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "tlen_a": pa.array([], pa.int64()),
                         "tlen_b": pa.array([], pa.int64())})
    ga = t["gsize_a"].to_numpy()
    gb = t["gsize_b"].to_numpy()
    A = _sketch_matrix(t["sketch_a"], k, 0)
    B = _sketch_matrix(t["sketch_b"], k, 1)
    C = np.sort(np.concatenate([A, B], axis=1), axis=1)
    D = C[:, 1:] == C[:, :-1]  # adjacent dup = value in BOTH sketches
    CD = np.cumsum(D, axis=1)
    j = np.arange(D.shape[1], dtype=np.int64)[None, :]
    dist_idx = j - (CD - D)  # distinct rank of each matched value
    matches = D.sum(axis=1)
    union_sk = np.minimum(ga, k) + np.minimum(gb, k) - matches
    k_eff = np.maximum(np.minimum(k, union_sk), 1)
    in_bottom = (D & (dist_idx < k_eff[:, None])).sum(axis=1)
    est = in_bottom / k_eff
    exact = (ga <= k) & (gb <= k)
    margin = np.where(exact, 1e-6, 3.5 / np.sqrt(k_eff))
    size_bound = np.minimum(ga, gb) / np.maximum(np.maximum(ga, gb), 1)
    keep = (
        (np.minimum(ga, gb) > 0)
        & (size_bound >= threshold - 1e-6)
        & (est + margin >= threshold)
    )
    kept = t.filter(pa.array(keep))
    return kept.select(["doc_a", "doc_b", "tlen_a", "tlen_b"])


def _sketch_prefilter_pairs(
    pairs: ray.data.Dataset, texts: ray.data.Dataset, n: int, threshold: float,
    num_partitions: int, want_bytes: bool,
) -> tuple[ray.data.Dataset, dict]:
    """The shared sketch-pre-filter stage of both Jaccard dedup paths:
    sketch the (already candidate-scoped) texts once, ride the sketches
    through the two candidate joins, keep only pairs that could still clear
    ``threshold``.  Returns (survivor pairs, stats); ``want_bytes`` adds the
    bytes-through-join reduction stat (two extra tiny aggregate passes)."""
    sketches = texts.map_batches(
        GramSketcher, fn_constructor_kwargs={"n": n},
        batch_format="pyarrow", batch_size=1024, concurrency=(1, 4),
        max_restarts=0,  # ray#53727
    ).materialize()
    sk_a = _attach_cols(
        pairs, sketches, "doc_a", "_a", ("sketch", "gsize", "tlen"), num_partitions
    ).materialize()
    sk_ab = _attach_cols(
        sk_a, sketches, "doc_b", "_b", ("sketch", "gsize", "tlen"), num_partitions
    ).materialize()
    pre = sk_ab.map_batches(
        lambda t: _sketch_prefilter(t, threshold),
        batch_format="pyarrow", batch_size=4096,
    ).materialize()
    stats = {"prefilter_survivors": int(pre.count())}
    if want_bytes:
        # bytes the verify join ships now vs. attaching text to every
        # candidate (the round-2/3 behavior) — the reduction the sketch buys
        kept_bytes = _sum_pair_tlen(pre)
        all_bytes = _sum_pair_tlen(sk_ab)
        stats["text_bytes_attached"] = kept_bytes
        stats["text_bytes_saved"] = all_bytes - kept_bytes
    return pre, stats


def _sum_pair_tlen(pairs: ray.data.Dataset) -> int:
    """Σ(tlen_a + tlen_b) over a pair Dataset — the text bytes a verify
    join would ship for it (tiny partial-agg pass, driver gets one int)."""
    import pyarrow.compute as pc

    s = pairs.map_batches(
        lambda t: pa.table({"b": pa.array(
            [int((pc.sum(t["tlen_a"]).as_py() or 0)
                 + (pc.sum(t["tlen_b"]).as_py() or 0))], pa.int64())}),
        batch_format="pyarrow",
    ).to_pandas()
    return int(s["b"].sum()) if len(s) else 0


def _bucketed_pair_candidates(
    bands: ray.data.Dataset, num_partitions: int, cap: int = _LSH_BUCKET_CAP,
    carry: tuple[str, ...] = (), dedupe: bool = True,
    stats_out: dict | None = None,
) -> ray.data.Dataset:
    """Deduped candidate pairs (doc_a < doc_b) from a ``(band, bucket,
    doc_id)`` Dataset — the shared candidate-generation engine of the
    MinHash-LSH and SimHash dedup families.

    Bucket sizes are a tiny vectorized aggregate; only the OVER-CAP tail (a
    >cap bucket means >cap mutually-near-identical docs) is collected on the
    driver and broadcast, instead of joining sizes back onto every band row.
    Normal buckets pair up via Ray Data's native hash SELF-join (vectorized,
    fully distributed); degenerate buckets get a capped per-group expansion
    (few groups, smallest doc_ids win, deterministic).  A pair surfacing
    from multiple bands is deduped DISTRIBUTED (candidate-scale shuffle).
    Returns a MATERIALIZED (doc_a, doc_b) Dataset — consumed twice
    downstream, and chained joins deadlock the 2.49 streaming executor.

    ``carry``: SMALL int64 per-doc columns already present on the band rows
    (e.g. an 8-byte signature — NOT document text) that ride through the
    self-join and come back as ``{col}_a`` / ``{col}_b``, so downstream
    verification needs no attach joins.  Values must be functions of doc_id
    (identical across a doc's band rows — the pair dedup folds duplicates
    with Min, which is exact for constant values).

    ``dedupe=False`` skips the GLOBAL pair dedup and returns the (mostly)
    band-duplicated, unmaterialized candidate stream: right when per-pair
    verification is cheaper than the candidate-scale shuffle (measured here:
    the dedup groupby costs ~10 µs/row to remove ~9%% duplicates, while a
    duplicated verification costs ~8 µs — so verify-then-dedup-the-OUTPUT
    wins).  The degenerate-bucket branch is still deduped even then: a
    cluster of >cap identical docs repeats its capped pair set once per
    band, an UNBOUNDED duplication factor the cap exists to prevent."""
    from ray.data.aggregate import Count, Min

    sizes = bands.groupby(["band", "bucket"]).aggregate(Count(alias_name="bsize"))
    big = sizes.map_batches(
        lambda t: t.filter(pa.compute.greater(t["bsize"], cap)),
        batch_format="pyarrow",
    ).to_pandas()
    if stats_out is not None:
        # loud, not silent: per over-cap bucket the capped expansion loses at
        # most C(size,2) - C(cap,2) pairs (a pair may still surface through
        # another band, so this is an upper bound on coverage loss)
        bs = big["bsize"].to_numpy() if "bsize" in big.columns else np.zeros(0)
        stats_out["overcap_buckets"] = int(len(bs))
        stats_out["dropped_pairs_bound"] = int(
            (bs * (bs - 1) // 2 - cap * (cap - 1) // 2).sum()
        ) if len(bs) else 0
    big_keys = (
        set(zip(big["band"].tolist(), big["bucket"].tolist()))
        if "band" in big.columns and not big.empty
        else set()
    )

    if big_keys:
        # pack (band, bucket) into one int64 (wraparound-consistent on both
        # sides) → vectorized sorted-membership, no per-row Python even when
        # a degenerate bucket exists
        def pack(band: np.ndarray, bucket: np.ndarray) -> np.ndarray:
            return band.astype(np.int64) * np.int64(0x9E3779B97F4A7C15 & 0x7FFFFFFFFFFFFFFF) + bucket.astype(np.int64)

        big_arr = np.sort(pack(
            np.array([b for b, _ in big_keys], dtype=np.int64),
            np.array([k for _, k in big_keys], dtype=np.int64),
        ))
        big_ref = ray.put(big_arr)

        def split(t: pa.Table, keep_big: bool) -> pa.Table:
            keys = ray.get(big_ref)
            packed = pack(t["band"].to_numpy(), t["bucket"].to_numpy())
            pos = np.searchsorted(keys, packed)
            pos[pos == len(keys)] = len(keys) - 1
            mask = keys[pos] == packed
            return t.filter(pa.array(mask if keep_big else ~mask))

        # materialize the (cheap, key-only) normal side: when EVERY bucket is
        # degenerate it is empty, and joining an empty Dataset loses the
        # schema inside the hash-shuffle aggregator (ArrowInvalid on the key)
        normal = bands.map_batches(
            lambda t: split(t, False), batch_format="pyarrow"
        ).materialize()
        if normal.count() == 0:
            normal = None
        oversized = bands.map_batches(lambda t: split(t, True), batch_format="pyarrow")
        # degenerate buckets: capped per-group expansion (few groups)
        cand_big = oversized.groupby(["band", "bucket"]).map_groups(
            lambda g: _pairs_in_bucket(g, carry, cap), batch_format="pandas"
        )
        if not dedupe:
            # even in no-global-dedup mode the degenerate branch is deduped:
            # an over-cap cluster repeats its capped pair set once PER BAND
            # (unbounded duplication); this shuffle moves only big-bucket
            # pairs, never the main candidate stream
            big_aggs = [Min(f"{c}{s}", alias_name=f"{c}{s}")
                        for c in carry for s in ("_a", "_b")]
            cand_big = (
                cand_big.groupby(["doc_a", "doc_b"])
                .aggregate(Count(alias_name="__n"), *big_aggs)
                .drop_columns(["__n"])
            )
    else:
        # arrow-normalize (the join requires arrow blocks; a pandas-emitting
        # signature stage upstream is fine)
        normal = bands.map_batches(
            lambda t: t.select(["band", "bucket", "doc_id", *carry]),
            batch_format="pyarrow",
        )
        cand_big = None
    if normal is not None:
        # normal buckets: pairs = bucket SELF-JOIN (native hash join, vectorized)
        right = normal.map_batches(
            lambda t: pa.table({"band": t["band"], "bucket": t["bucket"], "doc_id_r": t["doc_id"],
                                **{f"{c}_r": t[c] for c in carry}}),
            batch_format="pyarrow",
        )
        pair_rows = normal.join(right, "inner", num_partitions, on=("band", "bucket"))
        cand = pair_rows.map_batches(
            lambda t: pa.table(
                {"doc_a": t["doc_id"], "doc_b": t["doc_id_r"],
                 **{f"{c}_a": t[c] for c in carry},
                 **{f"{c}_b": t[f"{c}_r"] for c in carry}}
            ).filter(pa.compute.less(t["doc_id"], t["doc_id_r"])),
            batch_format="pyarrow",
        )
        if cand_big is not None:
            cand = cand.union(cand_big)
    else:
        cand = cand_big
    if not dedupe:
        return cand
    # a pair surfacing from multiple bands must verify once: vectorized
    # distributed dedup by pair key (candidate-scale shuffle); carried
    # columns are constant per pair, so Min reproduces them exactly
    carry_aggs = [
        Min(f"{c}{s}", alias_name=f"{c}{s}") for c in carry for s in ("_a", "_b")
    ]
    return (
        cand.groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="__n"), *carry_aggs)
        .drop_columns(["__n"])
        .materialize()
    )


def _gram_set_np(s: str, n: int = 4) -> np.ndarray:
    """Unique CHARACTER n-grams of ``s`` as a sorted numpy void array (each
    element = n UTF-32 code points, compared by memcmp) — exact set
    semantics identical to ``_char_ngrams`` (no hashing, no collisions),
    but intersectable with vectorized ``np.intersect1d``."""
    cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    if len(cp) < n:
        return np.zeros(0, dtype=np.dtype((np.void, 4 * n)))
    win = np.lib.stride_tricks.sliding_window_view(cp, n)
    v = np.ascontiguousarray(win).view(np.dtype((np.void, 4 * n))).reshape(-1)
    return np.unique(v)


def _verify_pairs(batch: pd.DataFrame, threshold: float, n: int = 4) -> pd.DataFrame:
    """Exact n-gram Jaccard per candidate pair — gram sets built ONCE per
    distinct doc in the batch (a near-dup hub appears in many pairs), pair
    intersections via sorted-array numpy kernels (no per-gram Python)."""
    grams: dict[int, np.ndarray] = {}

    def gs(doc_id: int, text) -> np.ndarray:
        g = grams.get(doc_id)
        if g is None:
            g = _gram_set_np((text or "").lower(), n)
            grams[doc_id] = g
        return g

    rows = []
    for a, b, ta, tb in zip(batch["doc_a"], batch["doc_b"], batch["text_a"], batch["text_b"]):
        sa, sb = gs(int(a), ta), gs(int(b), tb)
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        u = len(sa) + len(sb) - inter
        jac = (inter / u) if u else 0.0
        if round(jac, 6) >= threshold:
            rows.append((int(a), int(b), round(jac, 6)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"}
    )


def minhash_lsh_candidates(
    sf_dir: str, verify_threshold: float = 0.6, num_partitions: int | None = None,
    return_stats: bool = False, sketch: bool | None = None,
) -> pa.Table | tuple[pa.Table, dict]:
    """MinHash+LSH near-dup: shingle → minhash → band buckets → candidate
    pairs via a DISTRIBUTED bucket self-join → DISTRIBUTED exact-Jaccard
    verification (numpy gram-set intersections) → output-scale pair dedup.  Deterministic (seeded permutations).  Everything is
    Dataset-shaped and vectorized: no driver ``take_all()``, no per-group
    Python on the candidate path (degenerate over-cap buckets — thousands of
    mutually-identical docs — fall back to a capped per-group expansion), and
    nothing candidate- or corpus-scale on the driver: the text semi-join runs
    as a native distributed hash join against the distinct candidate ids.

    Oracle-matched: at 16 bands × 4 rows, a pair at the 0.6 verify threshold
    is caught with p ≈ 0.89 and a real near-dup (jaccard ≥ 0.9, which is all
    the test corpora contain) with p ≈ 1-1e-7, so verified output equals the
    exact all-pairs SQL."""
    from ray.data.aggregate import Count

    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    # bands are consumed twice (size aggregate + join side) — materialize the
    # ONE minhash pass; ~24 B/row of band keys, never corpus text
    bands = ds.map_batches(
        MinHasher, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4),
        max_restarts=0,  # ray#53727
    ).materialize()
    num_partitions = _shuffle_width(bands.count(), 4096, num_partitions)
    # candidate generation: shared bucket-self-join engine (degenerate-bucket
    # guard + native hash join + distributed pair dedup)
    # no GLOBAL pair dedup: band-duplication on real corpora is small (~9%
    # measured on the template-similar bench corpus) and a duplicated
    # verification costs less than the candidate-scale dedup shuffle did
    # (~16 s of a 45 s run); the verified OUTPUT-scale result is deduped
    # instead, and the degenerate-bucket branch (unbounded duplication) is
    # still deduped inside the engine
    cand = _bucketed_pair_candidates(
        bands, num_partitions, dedupe=False
    ).materialize()  # consumed twice (id-set + attach join)
    stats = {"candidates": int(cand.count())}
    if stats["candidates"] == 0:
        return (_empty_pairs(), stats) if return_stats else _empty_pairs()
    # semi-join texts down to candidate ids with the native distributed hash
    # join — the candidate-id set NEVER lands on the driver (candidates scale
    # with corpus self-similarity, not with output: a template-heavy corpus
    # can emit O(n²/buckets) candidates).  Distinct ids via a vectorized hash
    # aggregate; the materialize barriers keep each JoinOperator alone in its
    # streaming DAG (two joins in one DAG deadlock the 2.49 executor).
    cand_ids = (
        cand.map_batches(
            lambda t: pa.table({"doc_id": pa.concat_arrays(
                [t["doc_a"].combine_chunks(), t["doc_b"].combine_chunks()])}),
            batch_format="pyarrow",
        )
        .groupby("doc_id")
        .aggregate(Count(alias_name="__m"))
        .drop_columns(["__m"])
    )
    # join output = left cols + right non-key cols → (doc_id, text) filtered
    # to candidates; candidate texts live in the (spillable) object store
    texts = ds.join(cand_ids, "inner", num_partitions, on=("doc_id",)).materialize()
    # sketch pre-filter (large-doc corpora only, see _SKETCH_MIN_TLEN):
    # fixed-width bottom-k gram sketches ride the candidate joins, FULL
    # text attaches only to survivors
    if sketch is None:
        sketch = _mean_tlen(texts) >= _SKETCH_MIN_TLEN
    stats["sketch_prefilter"] = bool(sketch)
    verify_src = cand
    if sketch:
        verify_src, pre_stats = _sketch_prefilter_pairs(
            cand, texts, 4, verify_threshold, num_partitions, return_stats
        )
        stats.update(pre_stats)
        if stats["prefilter_survivors"] == 0:
            return (_empty_pairs(), stats) if return_stats else _empty_pairs()
    with_a = _attach_text(verify_src, texts, "doc_a", "text_a", num_partitions).materialize()
    with_ab = _attach_text(with_a, texts, "doc_b", "text_b", num_partitions)
    out = with_ab.map_batches(
        lambda b: _verify_pairs(b, verify_threshold), batch_format="pandas"
    ).to_pandas()  # verified pairs: output-scale
    if out.empty:
        return (_empty_pairs(), stats) if return_stats else _empty_pairs()
    out = out.drop_duplicates(["doc_a", "doc_b"])  # band-duplicated copies
    table = pa.Table.from_pandas(
        out.sort_values(["doc_a", "doc_b"], ignore_index=True), preserve_index=False
    )
    return (table, stats) if return_stats else table


class SimHasher:
    """64-bit SimHash over the token multiset (term_hash bits weighted by
    tf) — batch-vectorized: one tokenize + per-(doc, term) tf pass (Arrow
    C++), term_hash per UNIQUE term only, then a segmented signed bit-count
    sum.  Bit-identical to the per-doc Counter formulation (integer sums are
    order-independent)."""

    _BITS = np.arange(64, dtype=np.uint64)
    _WEIGHTS = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def simhash(self, texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
        from librecatastro_ray.functions.hashing import term_hash
        from librecatastro_ray.functions.tokenizer import term_frequencies_batch

        n_docs = len(texts)
        tf_table, _dl = term_frequencies_batch(texts)
        acc = np.zeros((n_docs, 64), dtype=np.int64)
        if len(tf_table):
            rows = tf_table["row"].to_numpy()
            tfs = tf_table["tf"].to_numpy()
            terms = tf_table["term"].to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(terms, return_inverse=True)
            hu = np.fromiter((term_hash(t) for t in uniq), dtype=np.uint64, count=len(uniq))
            signed = (2 * ((hu[:, None] >> self._BITS[None, :]) & 1).astype(np.int64) - 1)
            contrib = signed[inv] * tfs[:, None]  # (postings, 64)
            order = np.argsort(rows, kind="stable")
            rows_s = rows[order]
            seg = np.nonzero(np.concatenate([[True], rows_s[1:] != rows_s[:-1]]))[0]
            if len(seg):
                acc[rows_s[seg]] = np.add.reduceat(contrib[order], seg, axis=0)
        sim = ((acc > 0).astype(np.uint64) * self._WEIGHTS[None, :]).sum(axis=1)
        return (sim & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Arrow in/out — see MinHasher.__call__ (hashable schemas downstream)
        texts = pa.compute.fill_null(batch["text"].combine_chunks(), "")
        return pa.table({"doc_id": batch["doc_id"],
                         "simhash": pa.array(self.simhash(texts), pa.int64())})


def simhash_signatures(sf_dir: str) -> ray.data.Dataset:
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        SimHasher, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4),
        max_restarts=0,  # ray#53727
    )


_SIMHASH_RADIUS = 3


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR) — numpy<2.0 has no bitwise_count."""
    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def _simhash_bands(t: pa.Table, radius: int) -> pa.Table:
    """1→(radius+1) band fan-out of 64-bit signatures: band b = a contiguous
    bit slice, as equal as 64/(radius+1) allows.  Pigeonhole: two signatures
    at Hamming distance ≤ radius differ in ≤ radius bands, so they agree
    EXACTLY on at least one — zero false negatives."""
    sim = t["simhash"].to_numpy().astype(np.uint64)
    doc = t["doc_id"].to_numpy()
    n_bands = radius + 1
    bounds = np.linspace(0, 64, n_bands + 1).astype(np.uint64)

    def band_mask(width: np.uint64) -> np.uint64:
        # width == 64 (radius=0: one band = the whole signature) would be an
        # undefined uint64 shift-by-64 — special-case to the full mask
        if int(width) >= 64:
            return np.uint64(0xFFFFFFFFFFFFFFFF)
        return (np.uint64(1) << width) - np.uint64(1)

    buckets = np.concatenate([
        ((sim >> bounds[b]) & band_mask(bounds[b + 1] - bounds[b])).astype(np.int64)
        for b in range(n_bands)
    ]) if len(sim) else np.zeros(0, dtype=np.int64)
    return pa.table({
        "band": np.repeat(np.arange(n_bands, dtype=np.int64), len(sim)),
        "bucket": buckets,
        "doc_id": np.tile(doc, n_bands),
        # the signature rides the band rows (8 B/row) so candidate pairs
        # come back verification-ready — no attach joins
        "simhash": np.tile(t["simhash"].to_numpy(), n_bands),
    })


def _empty_hamming_pairs() -> pa.Table:
    return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                     "hamming": pa.array([], pa.int64())})


def dedup_simhash(
    sf_dir: str, radius: int = _SIMHASH_RADIUS, num_partitions: int | None = None,
    bucket_cap: int = _LSH_BUCKET_CAP, return_stats: bool = False,
) -> pa.Table | tuple[pa.Table, dict]:
    """SimHash near-dup: all pairs within Hamming distance ``radius`` of the
    64-bit signature — EXACT (banding has no false negatives; an exact
    vectorized popcount kills the false positives) UP TO the degenerate-
    bucket cap: a (band, bucket) shared by more than ``bucket_cap`` docs is
    deterministically truncated to the ``bucket_cap`` smallest doc_ids, and
    ``return_stats=True`` returns ``(pairs, {overcap_buckets,
    dropped_pairs_bound})`` so the truncation is COUNTED, never silent (the
    test corpora sit far below the cap, so capped and uncapped agree there
    and the SQL oracle's all-pairs replay stays exact).

    Scale path is the pigeonhole banding of Manku et al. (WWW'07 simhash
    dedup): split the signature into ``radius+1`` contiguous bit bands — a
    pair at distance ≤ radius agrees exactly on ≥1 band — so candidate
    generation is the same distributed (band, bucket) hash self-join engine
    the MinHash-LSH path uses (degenerate-bucket guard included), and ONLY
    ~24 B/row signature band rows ever shuffle; text never moves.  The 8-byte
    signature itself RIDES the band rows through the self-join (the engine's
    ``carry``), so every candidate pair comes back verification-ready — the
    SWAR-popcount filter needs no attach joins and nothing pair- or
    corpus-scale touches the driver.

    Reference analogue: the G1/G2 dedup family (SURVEY §2) —
    elasticsearch_utils.py:100-136's exact-id dedup generalized to
    near-identity."""
    if not 0 <= radius <= 63:
        # radius+1 bands over 64 bits: radius 0 (exact signature equality,
        # one full-width band) through 63 (every band is a single bit)
        raise ValueError(f"radius must be in [0, 63], got {radius}")
    sigs = simhash_signatures(sf_dir).materialize()  # 16 B/row
    num_partitions = _shuffle_width(sigs.count(), 4096, num_partitions)
    bands = sigs.map_batches(
        lambda t: _simhash_bands(t, radius), batch_format="pyarrow"
    ).materialize()  # consumed twice by the candidate engine (sizes + join)
    # raw (band-duplicated) candidate stream: the popcount verification is
    # ~1 ns/pair, far cheaper than the pair-dedup shuffle, so verify every
    # duplicate inline on the join output and dedup the OUTPUT-scale
    # verified set instead (a pair appears in ≤ radius+1 bands)
    stats: dict = {}
    cand = _bucketed_pair_candidates(
        bands, num_partitions, bucket_cap, carry=("simhash",), dedupe=False,
        stats_out=stats,
    )

    def verify(t: pa.Table) -> pa.Table:
        h = _popcount64(np.bitwise_xor(
            t["simhash_a"].to_numpy().astype(np.uint64),
            t["simhash_b"].to_numpy().astype(np.uint64),
        ))
        keep = h <= radius
        return pa.table({
            "doc_a": pa.array(t["doc_a"].to_numpy()[keep], pa.int64()),
            "doc_b": pa.array(t["doc_b"].to_numpy()[keep], pa.int64()),
            "hamming": pa.array(h[keep], pa.int64()),
        })

    out = cand.map_batches(verify, batch_format="pyarrow").to_pandas()
    # verified pairs: output-scale
    if out.empty:
        result = _empty_hamming_pairs()
        return (result, stats) if return_stats else result
    out = out.drop_duplicates(["doc_a", "doc_b"])  # ≤ radius+1 copies/pair
    result = pa.Table.from_pandas(
        out.sort_values(["doc_a", "doc_b"], ignore_index=True), preserve_index=False
    )
    return (result, stats) if return_stats else result


def repetition_scores(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style repetition quality features per doc (the duplicate
    n-gram filters of Rae et al. 2021, re-expressed token-level for
    single-line code docs): fraction of tokens repeating an earlier token
    (= 1 − distinct/total), the top token's share, and the fraction of
    2-token grams repeating an earlier gram.  One vectorized tokenize pass
    per batch; distinct counts via Arrow group-by + a batch lexsort — no
    per-doc Python."""
    from librecatastro_ray.functions.tokenizer import tokenize_batch

    def fn(batch: pa.Table) -> pa.Table:
        texts = pa.compute.fill_null(batch["text"].combine_chunks(), "")
        parent_idx, terms, dl = tokenize_batch(texts)
        n_rows = len(batch)
        n_distinct = np.zeros(n_rows, dtype=np.int64)
        top = np.zeros(n_rows, dtype=np.int64)
        if len(terms):
            t = pa.table({"row": pa.array(parent_idx, pa.int64()),
                          "term": pa.array(terms, pa.string())})
            g = t.group_by(["row", "term"], use_threads=False).aggregate(
                [([], "count_all")]
            )
            rows_g = g["row"].to_numpy()
            cnt_g = g["count_all"].to_numpy().astype(np.int64)
            n_distinct = np.bincount(rows_g, minlength=n_rows).astype(np.int64)
            np.maximum.at(top, rows_g, cnt_g)
        g2, n_win2 = _gram_hashes_from_tokens(terms, dl, 2)
        nd2 = np.zeros(n_rows, dtype=np.int64)
        if len(g2):
            doc_idx = np.repeat(np.arange(n_rows, dtype=np.int64), n_win2)
            order = np.lexsort((g2, doc_idx))
            gs, ds_ = g2[order], doc_idx[order]
            first = np.concatenate(
                [[True], (gs[1:] != gs[:-1]) | (ds_[1:] != ds_[:-1])]
            )
            nd2 = np.bincount(ds_[first], minlength=n_rows).astype(np.int64)
        tok_div = np.maximum(dl, 1)
        g2_div = np.maximum(n_win2, 1)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(dl, pa.int64()),
            "dup_token_ratio": pa.array(
                np.round((dl - n_distinct) / tok_div, 6), pa.float64()),
            "top_token_ratio": pa.array(np.round(top / tok_div, 6), pa.float64()),
            "dup_2gram_ratio": pa.array(
                np.round((n_win2 - nd2) / g2_div, 6), pa.float64()),
        })

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=4096
    )


def top_terms_per_lang(sf_dir: str, k: int = 10) -> pa.Table:
    """Grouped heavy hitters: the top-``k`` terms per language by total
    corpus term frequency (ties broken by term ascending — pinned).

    Distributed shape: per-batch PARTIAL (lang, term) counts (Arrow
    group-by — token-scale rows never enter the shuffle) → one global
    ``groupby([lang, term]).sum`` at vocabulary scale → per-BLOCK partial
    top-k (a global top-k row beats all but < k rows everywhere, so it is
    in its own block's local top-k — no skewed one-task-per-lang group) →
    a driver fold over ≤ blocks × langs × k survivor rows."""
    import pyarrow.compute as pc

    from librecatastro_ray.functions.tokenizer import tokenize_batch

    partial_schema = pa.schema(
        [("lang", pa.string()), ("term", pa.string()), ("c", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch["text"].combine_chunks(), "")
        parent_idx, terms, _dl = tokenize_batch(texts)
        if len(terms) == 0:
            return partial_schema.empty_table()
        langs = pc.fill_null(batch["lang"].combine_chunks(), "und")
        t = pa.table({
            "lang": langs.take(pa.array(parent_idx, pa.int64())),
            "term": pa.array(terms, pa.string()),
        })
        g = t.group_by(["lang", "term"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return pa.table({"lang": g["lang"], "term": g["term"],
                         "c": g["count_all"].cast(pa.int64())})

    def _select_topk(t: pa.Table) -> pa.Table:
        lang = np.asarray(t["lang"].to_pylist(), dtype=object)
        term = np.asarray(t["term"].to_pylist(), dtype=object)
        c = t["c"].to_numpy().astype(np.int64)
        # lexsort is last-key-primary: (term asc, -c, lang) → within each
        # lang: count desc, term asc
        order = np.lexsort((term, -c, lang))
        lang_s = lang[order]
        first = np.concatenate([[True], lang_s[1:] != lang_s[:-1]])
        grp = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        rank = np.arange(len(order)) - starts[grp] + 1
        keep = rank <= k
        return pa.table({
            "lang": pa.array(lang_s[keep].tolist(), pa.string()),
            "term": pa.array(term[order][keep].tolist(), pa.string()),
            "c": pa.array(c[order][keep], pa.int64()),
            "rank": pa.array(rank[keep], pa.int64()),
        })

    def block_topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.schema([("lang", pa.string()), ("term", pa.string()),
                              ("c", pa.int64()), ("rank", pa.int64())]).empty_table()
        return _select_topk(batch)

    counts = (
        _docs_ds(sf_dir, ["lang", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby(["lang", "term"])
        .aggregate(ray.data.aggregate.Sum("c", alias_name="c"))
    )
    survivors = counts.map_batches(
        block_topk, batch_format="pyarrow", batch_size=65536
    ).to_arrow_refs()
    small = pa.concat_tables([ray.get(r) for r in survivors])
    return _select_topk(small.select(["lang", "term", "c"]))


# ---------------------------------------------------------------------------
# bigram-LM perplexity scoring (CCNet/KenLM-style model-based quality filter)
# ---------------------------------------------------------------------------

_LM_BOS = "<s>"  # not producible by the [a-z0-9_]+ tokenizer → collision-free


def _lm_pair_hash(prev: np.ndarray, cur: np.ndarray) -> np.ndarray:
    """63-bit bigram identity hash (FNV-style multiply-xor + splitmix64
    finalize, masked into int64 so Arrow/pandas round-trips stay native);
    equal hash ⟺ equal (prev, cur) token-string pair w.h.p. — the SQL
    oracle compares the strings exactly."""
    h = _splitmix64(prev.astype(np.uint64) * np.uint64(0x100000001B3)
                    ^ cur.astype(np.uint64))
    return (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def _lm_token_stream(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a batch and return ``(prev_hash, cur_hash, dl)`` over the
    concatenated token stream, with a BOS hash prepended per doc (so every
    token occurrence is the ``cur`` of exactly one bigram)."""
    from librecatastro_ray.functions.hashing import term_hash, term_hashes
    from librecatastro_ray.functions.tokenizer import tokenize_batch

    _parent_idx, terms, dl = tokenize_batch(texts)
    if len(terms) == 0:
        e = np.empty(0, np.int64)
        return e, e, dl
    cur = term_hashes(terms)  # 63-bit positive int64
    prev = np.empty(len(cur), np.int64)
    prev[1:] = cur[:-1]
    off = np.cumsum(dl)
    starts = (off - dl)[dl > 0]  # token offset of each non-empty doc
    prev[starts] = term_hash(_LM_BOS)
    return prev, cur, dl


def lm_bigram_model(
    sf_dir: str, min_count: int = 2, stats_out: dict | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Train an add-one-smoothed bigram LM over the corpus (pass 1 of the
    CCNet/KenLM-style model-based quality filter).

    Distributed shape: per-batch PARTIAL bigram counts (vectorized
    tokenize → pair-hash → ``np.unique`` fold — token-scale rows never
    enter the shuffle) → one ``groupby(pair).sum`` over the already-folded
    partials → the deduped model lands on the driver, which is inherent to
    broadcasting it.  At 100 TB the model side is bounded the standard way
    (KenLM): ``min_count`` prunes the hapax tail — counts are exact
    before pruning, so the knob only drops rows, never re-counts.  The
    DEFAULT is 2 (drop singletons): under Zipf, hapax bigrams are the
    majority of DISTINCT pairs, so the default alone cuts the broadcast
    model by ~2× and — unlike ``min_count=1`` — keeps its growth sublinear
    in corpus size.  ``stats_out`` receives ``{"n_bigrams_total",
    "n_bigrams_kept", "model_bytes", "min_count", "vocab"}`` for the build
    report; :func:`lm_perplexity` additionally ENFORCES a byte cap before
    ``ray.put``.

    Returns ``(pairs_sorted, c2, prevs_sorted, c1, V)`` where ``c1`` is the
    per-context total derived from the bigram table (every token occurrence
    is a ``cur`` thanks to BOS) and ``V`` = distinct ``cur`` hashes (the
    Laplace vocabulary size).
    """
    schema = pa.schema(
        [("pair", pa.int64()), ("prev", pa.int64()),
         ("cur", pa.int64()), ("c", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        texts = pa.compute.fill_null(batch["text"].combine_chunks(), "")
        prev, cur, _dl = _lm_token_stream(texts)
        if len(cur) == 0:
            return schema.empty_table()
        pair = _lm_pair_hash(prev, cur)
        uniq, idx, cnt = np.unique(pair, return_index=True, return_counts=True)
        return pa.table(
            {
                "pair": pa.array(uniq, pa.int64()),
                "prev": pa.array(prev[idx], pa.int64()),
                "cur": pa.array(cur[idx], pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    model = (
        _docs_ds(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby("pair")
        .aggregate(
            ray.data.aggregate.Sum("c", alias_name="c"),
            # prev/cur are constant per pair hash — Max is just "pick it"
            ray.data.aggregate.Max("prev", alias_name="prev"),
            ray.data.aggregate.Max("cur", alias_name="cur"),
        )
        .to_pandas()  # model-scale (deduped bigrams), NOT corpus-scale
    )
    pairs = model["pair"].to_numpy().astype(np.int64)
    c2 = model["c"].to_numpy().astype(np.int64)
    prev = model["prev"].to_numpy().astype(np.int64)
    V = int(pd.unique(model["cur"]).shape[0])
    # context totals c1(prev) = Σ_cur c2(prev, cur) and V come from the
    # UNPRUNED table (pruning only trims bigram lookup rows; the Laplace
    # denominators stay exact corpus statistics)
    po = np.argsort(prev, kind="stable")
    ps = prev[po]
    if len(ps):
        boundaries = np.flatnonzero(np.concatenate([[True], ps[1:] != ps[:-1]]))
        prevs_sorted = ps[boundaries]
        c1 = np.add.reduceat(c2[po], boundaries).astype(np.int64)
    else:
        prevs_sorted, c1 = ps, np.empty(0, np.int64)
    n_total = len(pairs)
    if min_count > 1:
        keep = c2 >= min_count
        pairs, c2 = pairs[keep], c2[keep]
    order = np.argsort(pairs, kind="stable")
    pairs, c2 = pairs[order], c2[order]
    if stats_out is not None:
        stats_out.update(
            n_bigrams_total=n_total,
            n_bigrams_kept=len(pairs),
            model_bytes=int(
                pairs.nbytes + c2.nbytes + prevs_sorted.nbytes + c1.nbytes
            ),
            min_count=min_count,
            vocab=V,
        )
    return pairs, c2, prevs_sorted, c1, V


class _LMScorer:
    """Actor-pool scoring pass: the sorted model arrays are broadcast once
    via ``ray.put`` and fetched in ``__init__``; each batch is one
    vectorized tokenize → pair-hash → two searchsorted lookups → segmented
    (reduceat) per-doc fold.  No Python over rows or tokens."""

    def __init__(self, model_ref):
        self.pairs, self.c2, self.prevs, self.c1, self.V = ray.get(model_ref)

    @staticmethod
    def _lookup(sorted_keys, values, keys):
        out = np.zeros(len(keys), dtype=np.int64)
        if len(sorted_keys) and len(keys):
            pos = np.searchsorted(sorted_keys, keys)
            pos[pos == len(sorted_keys)] = len(sorted_keys) - 1
            hit = sorted_keys[pos] == keys
            out[hit] = values[pos[hit]]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pa.compute.fill_null(batch["text"].combine_chunks(), "")
        prev, cur, dl = _lm_token_stream(texts)
        n_rows = len(batch)
        hits = np.zeros(n_rows, dtype=np.int64)
        avg_nll = np.zeros(n_rows, dtype=np.float64)
        if len(cur):
            cb = self._lookup(self.pairs, self.c2, _lm_pair_hash(prev, cur))
            cp = self._lookup(self.prevs, self.c1, prev)
            # Laplace: -ln((cb+1)/(cp+V)), written as ln(cp+V)-ln(cb+1) —
            # the oracle uses the SAME form so FP agrees to the last ulp
            nll = np.log(cp + float(self.V)) - np.log(cb + 1.0)
            nz = dl > 0
            doc_off = np.concatenate([[0], np.cumsum(dl)[:-1]])
            sums = np.add.reduceat(nll, doc_off[nz]) if nz.any() else np.empty(0)
            hsum = np.add.reduceat(cb, doc_off[nz]) if nz.any() else np.empty(0)
            avg_nll[nz] = np.round(sums / dl[nz], 6)
            hits[nz] = hsum.astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(dl.astype(np.int64), pa.int64()),
                "bigram_hits": pa.array(hits, pa.int64()),
                "avg_nll": pa.array(avg_nll, pa.float64()),
            }
        )


def lm_perplexity(
    sf_dir: str, min_count: int = 2,
    max_model_bytes: int = 2 << 30, stats_out: dict | None = None,
) -> ray.data.Dataset:
    """Model-based quality scoring (the CCNet recipe with an in-corpus
    model): train an add-one-smoothed bigram LM over the corpus, then score
    every doc's average negative log-likelihood under it.  Low ``avg_nll``
    = fluent/common text, high = rare or noisy — the standard
    perplexity-bucket curation signal.

    Two passes, both streaming: pass 1 folds token-scale bigrams to
    partial counts INSIDE map_batches before the (model-scale) shuffle;
    pass 2 broadcasts the sorted model arrays once (``ray.put``) and scans
    the corpus in an actor pool.  Output: ``(doc_id, n_tokens,
    bigram_hits, avg_nll)`` where ``bigram_hits`` (Σ pruned-model
    train-count along the doc's bigram path; pruned pairs score as unseen,
    exactly the KenLM convention) is an exact-integer anchor for the
    oracle.

    The broadcast model is BOUNDED two ways: ``min_count=2`` (default)
    prunes the hapax tail, and ``max_model_bytes`` (default 2 GiB — a
    comfortable fraction of a worker heap) is ASSERTED before ``ray.put``,
    so a corpus whose pruned model still exceeds the cap fails loudly with
    the knob to raise instead of silently pinning every actor's memory.

    Reference analogue: the scoring-side enrichment of
    ``elasticsearch_utils.py`` — a corpus-derived statistic (there: DF/BM25
    stats; here: bigram counts) broadcast to a stateless scoring scan.
    """
    mstats: dict = {}
    model = lm_bigram_model(sf_dir, min_count=min_count, stats_out=mstats)
    if stats_out is not None:
        stats_out.update(mstats)
    if mstats["model_bytes"] > max_model_bytes:
        raise ValueError(
            f"bigram model is {mstats['model_bytes']:,} B "
            f"({mstats['n_bigrams_kept']:,} bigrams at min_count="
            f"{min_count}) > max_model_bytes={max_model_bytes:,}; raise "
            "min_count (KenLM-style pruning) or max_model_bytes"
        )
    model_ref = ray.put(model)
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        _LMScorer,
        fn_constructor_kwargs={"model_ref": model_ref},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
        max_restarts=0,  # ray#53727: ctor ref in the object store
    )


# ---------------------------------------------------------------------------
# decontamination (train-vs-eval n-gram overlap)
# ---------------------------------------------------------------------------

_DECON_N = 8  # the customary pretraining decontamination window (8 tokens)
_DECON_MOD = 97  # deterministic stand-in eval set: doc_id % 97 == 0


def _gram_hashes_from_tokens(
    terms: np.ndarray, dl: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling n-token gram hashes from an already-tokenized batch:
    md5-based per-unique-token hashes, then a polynomial fold over each
    n-token window.  Returns ``(gram_hashes, windows_per_doc)`` — equal
    hash ⟺ equal token sequence (w.h.p.; the SQL oracles compare the
    space-joined token strings exactly)."""
    from librecatastro_ray.functions.hashing import term_hashes

    n_win = np.maximum(dl - (n - 1), 0)
    total = int(n_win.sum())
    if total == 0:
        return np.zeros(0, dtype=np.uint64), n_win
    th = term_hashes(terms).astype(np.uint64)
    doc_off = np.zeros(len(dl), dtype=np.int64)
    np.cumsum(dl[:-1], out=doc_off[1:])
    starts = np.repeat(doc_off, n_win) + _segment_arange(n_win)
    g = np.zeros(total, dtype=np.uint64)
    for k in range(n):
        g = g * np.uint64(1000003) + th[starts + k]
    return _splitmix64(g), n_win


def _token_gram_hashes(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """One vectorized tokenize pass + :func:`_gram_hashes_from_tokens`."""
    from librecatastro_ray.functions.tokenizer import tokenize_batch

    _parent_idx, terms, dl = tokenize_batch(texts)
    return _gram_hashes_from_tokens(terms, dl, n)


class Decontaminator:
    """Actor-pool corpus scan: the (small) eval-set gram-hash array is
    broadcast once via ray.put and fetched in __init__; each batch does one
    vectorized tokenize + rolling-hash pass and a sorted-array searchsorted
    membership test — no Python over rows or grams."""

    def __init__(self, bench_ref, n: int, mod: int):
        self.bench = ray.get(bench_ref)  # sorted uint64 gram hashes
        self.n, self.mod = int(n), int(mod)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pa.compute.fill_null(batch["text"].combine_chunks(), "")
        g, n_win = _token_gram_hashes(texts, self.n)
        hit = np.zeros(len(g), dtype=bool)
        if len(g) and len(self.bench):
            pos = np.searchsorted(self.bench, g)
            pos[pos == len(self.bench)] = len(self.bench) - 1
            hit = self.bench[pos] == g
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), n_win)
        n_cont = np.bincount(doc_idx[hit], minlength=len(texts)).astype(np.int64)
        did = batch["doc_id"].to_numpy()
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_grams": pa.array(n_win, pa.int64()),
            "n_contaminated": pa.array(n_cont, pa.int64()),
            "contaminated": pa.array((n_cont > 0).astype(np.int64), pa.int64()),
            "is_benchmark": pa.array((did % self.mod == 0).astype(np.int64), pa.int64()),
        })


def decontaminate(
    sf_dir: str, n: int = _DECON_N, benchmark_mod: int = _DECON_MOD
) -> ray.data.Dataset:
    """Training-data DECONTAMINATION: flag every corpus document sharing at
    least one ``n``-token gram with the eval/benchmark set (the standard
    pretraining train-test-overlap pass; the deterministic stand-in eval
    set is ``doc_id % benchmark_mod == 0`` — the testdata carries no
    separate eval table).

    Shape (the 100 TB design): the eval set is TINY relative to the corpus
    (the documented assumption — eval suites are ~10⁵ grams, a sub-MB
    broadcast), so its distinct gram hashes are collected once, sorted, and
    broadcast with ``ray.put``; the corpus side is ONE streaming map_batches
    scan (vectorized tokenize → rolling hash → searchsorted) with no
    shuffle at all.  Reference analogue: the anti-join skip filter
    (elasticsearch_utils.py:100-136) — membership of derived keys against a
    small authoritative set, inverted to flag rather than skip."""

    def bench_grams(t: pa.Table) -> pa.Table:
        t = t.filter(pa.array(t["doc_id"].to_numpy() % benchmark_mod == 0))
        texts = pa.compute.fill_null(t["text"].combine_chunks(), "")
        g, _ = _token_gram_hashes(texts, n)
        return pa.table({"g": pa.array(np.unique(g), pa.uint64())})

    bench_tbl = (
        _docs_ds(sf_dir, ["doc_id", "text"])
        .map_batches(bench_grams, batch_format="pyarrow", batch_size=1024)
        .to_pandas()  # eval-set-scale (small by assumption), NOT corpus-scale
    )
    bench = np.unique(bench_tbl["g"].to_numpy().astype(np.uint64))
    bench_ref = ray.put(bench)
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        Decontaminator,
        fn_constructor_kwargs={"bench_ref": bench_ref, "n": n, "mod": benchmark_mod},
        batch_format="pyarrow", batch_size=2048, concurrency=(1, 4),
        max_restarts=0,  # ray#53727: ctor ref in the object store
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
            # partial-select on the ROUNDED cosine with the vec_id-asc
            # tiebreak — the final (and oracle) ordering — so a vector that
            # rounds into a tie with the k-th score at a batch boundary is
            # never cut by unrounded noise
            row6 = np.round(row[idx], 6)
            take = idx[np.lexsort((vids[idx], -row6))[: self.k]]
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
    ds = _embeddings_ds(sf_dir)
    partials = ds.map_batches(
        AnnScorer,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=(1, 4),
        max_restarts=0,  # ObjectRef constructor arg (ray#53727): rerun, don't restart
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


def _load_norm_row_group(path: str, group: int) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, L2-normalized matrix) of ONE parquet row group — the unit of
    the block-pair self-join.  Each task touches two row groups, never the
    whole table."""
    import pyarrow.parquet as pq

    t = pq.ParquetFile(path).read_row_group(group, columns=["vec_id", "embedding"])
    vids = t["vec_id"].to_numpy()
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return vids, _normalize_rows(E)


def _block_pair_cosine(batch: pa.Table, *, path: str, threshold: float) -> pa.Table:
    """One (row-group i, row-group j) tile of the exact all-pairs cosine
    self-join: emit pairs (min_id, max_id, cos) with round(cos,6) >=
    threshold.  i == j tiles use the strict upper triangle."""
    va_l, vb_l, c_l = [], [], []
    for gi, gj in zip(batch["gi"].to_pylist(), batch["gj"].to_pylist()):
        vids_a, Ea = _load_norm_row_group(path, gi)
        if gi == gj:
            vids_b, Eb = vids_a, Ea
        else:
            vids_b, Eb = _load_norm_row_group(path, gj)
        C = Ea @ Eb.T
        a_idx, b_idx = np.nonzero(np.round(C, 6) >= threshold)
        va = vids_a[a_idx]
        vb = vids_b[b_idx]
        keep = va < vb if gi == gj else va != vb
        lo = np.minimum(va[keep], vb[keep])
        hi = np.maximum(va[keep], vb[keep])
        va_l.append(lo)
        vb_l.append(hi)
        c_l.append(np.round(C[a_idx, b_idx][keep], 6))
    if not va_l:
        return pa.table({"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})
    return pa.table(
        {
            "vec_a": pa.array(np.concatenate(va_l), pa.int64()),
            "vec_b": pa.array(np.concatenate(vb_l), pa.int64()),
            "cos": pa.array(np.concatenate(c_l), pa.float64()),
        }
    )


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.4) -> pa.Table:
    """Embedding-cosine near-dup pairs (vec_a < vec_b, cos >= threshold) —
    EXACT all-pairs as a distributed block-pair self-join: work items are
    (row-group i, row-group j) tiles, each task reads its two row groups only
    (nothing corpus-sized on the driver, no full-matrix broadcast).  Compute
    is inherently O(N²/tiles) per task; the sub-quadratic scale path for
    high thresholds is the IVF-bucketed variant (embedding_dup_pairs_ivf)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    n_groups = pq.ParquetFile(path).num_row_groups
    tiles = [{"gi": i, "gj": j} for i in range(n_groups) for j in range(i, n_groups)]
    out = (
        ray.data.from_items(tiles, override_num_blocks=len(tiles))
        .map_batches(
            _block_pair_cosine,
            fn_kwargs={"path": path, "threshold": threshold},
            batch_format="pyarrow",
            batch_size=1,
        )
        .to_pandas()  # matched pairs: output-scale
    )
    return pa.Table.from_pandas(
        out.sort_values(["vec_a", "vec_b"], ignore_index=True), preserve_index=False
    )


_IVF_CACHE_ROOT = os.environ.get("LCRAY_IVF_CACHE", "/tmp/lcray_ivf")


def _normalize_rows(E: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(E, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return E / n


def _seed_keys(vids: np.ndarray) -> np.ndarray:
    """Deterministic pseudo-random seed ordering key: md5 hex of the decimal
    vec_id.  Hashing destroys any adversarial vec_id layout, and the SAME
    ordering is expressible in SQL (``ORDER BY md5(CAST(vec_id AS
    VARCHAR)), vec_id``) so the cell-assignment oracle can recompute it."""
    return np.array([hashlib.md5(str(int(v)).encode()).hexdigest() for v in vids])


def _ivf_centroids(path: str, n_cells: int) -> np.ndarray:
    """Distributed spherical-k-means(1-round) coarse centroids.

    Seeds = the ``n_cells`` vectors smallest by ``(md5(vec_id), vec_id)`` —
    a deterministic pseudo-random sample robust to adversarial vec_id
    orderings (the round-2 first-``n_cells``-by-id centroids were
    layout-dependent).  Selection is a per-batch partial top-k (each batch
    ships at most ``n_cells`` candidate rows to the driver).  Then ONE Lloyd
    round, also distributed: seeds broadcast via ray.put, per-batch argmax
    assignment on round(cos, 6) with smallest-cell tiebreak, per-cell
    (count, vector-sum) partials combined on the driver (≤ cells rows per
    batch), mean renormalized, empty cells keep their seed.  Bit-compatible
    with the ``ivf_cell_assign`` DuckDB oracle in ``__ray_entry__``."""
    from librecatastro_ray.sources.readers import read_parquet_clean

    def seed_partial(batch: pa.Table) -> pa.Table:
        vids = batch["vec_id"].to_numpy()
        keys = _seed_keys(vids)
        order = np.lexsort((vids, keys))[:n_cells]
        return pa.table(
            {
                "key": pa.array(keys[order], pa.string()),
                "vec_id": pa.array(vids[order], pa.int64()),
                "embedding": batch["embedding"].combine_chunks().take(
                    pa.array(order, pa.int64())
                ),
            }
        )

    cand = (
        read_parquet_clean(path, columns=["vec_id", "embedding"])
        .map_batches(seed_partial, batch_format="pyarrow", batch_size=4096)
        .to_pandas()  # ≤ n_cells × n_batches rows — seed-candidate scale
    )
    order = np.lexsort((cand["vec_id"].to_numpy(), cand["key"].to_numpy()))[:n_cells]
    seeds = _normalize_rows(
        np.array(cand["embedding"].iloc[order].tolist(), dtype=np.float64)
    )
    k, dims = seeds.shape
    seeds_ref = ray.put(seeds)

    def lloyd_partial(batch: pa.Table) -> pa.Table:
        s = ray.get(seeds_ref)
        En = _normalize_rows(np.array(batch["embedding"].to_pylist(), dtype=np.float64))
        a0 = np.argmax(np.round(En @ s.T, 6), axis=1)  # first max = smallest cell
        counts = np.bincount(a0, minlength=len(s))
        sums = np.zeros_like(s)
        np.add.at(sums, a0, En)
        live = np.nonzero(counts)[0]
        return pa.table(
            {
                "cell": pa.array(live, pa.int64()),
                "n": pa.array(counts[live], pa.int64()),
                "vsum": pa.array(sums[live].tolist(), pa.list_(pa.float64())),
            }
        )

    parts = (
        read_parquet_clean(path, columns=["embedding"])
        .map_batches(lloyd_partial, batch_format="pyarrow", batch_size=4096)
        .to_pandas()  # ≤ n_cells rows per batch — cell scale
    )
    cents = seeds.copy()
    for cell, g in parts.groupby("cell"):
        total = np.sum(np.array(g["vsum"].tolist(), dtype=np.float64), axis=0)
        mean = total / g["n"].sum()
        cents[int(cell)] = _normalize_rows(mean[None, :])[0]
    return cents


class _CellAssigner:
    """map_batches actor stage: centroids fetched once per actor."""

    def __init__(self, cent_ref):
        self.cents = ray.get(cent_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        En = _normalize_rows(np.array(batch["embedding"].to_pylist(), dtype=np.float64))
        # round-6 argmax with first-max (= smallest cell) tiebreak — the
        # exact rule the ivf_cell_assign SQL oracle replays
        cell = np.argmax(np.round(En @ self.cents.T, 6), axis=1).astype(np.int64)
        return batch.append_column("cell", pa.array(cell, pa.int64()))


def ivf_build(sf_dir: str, n_cells: int = 8, index_dir: str | None = None) -> str:
    """DISTRIBUTED IVF build (the ANN scale path): centroids = seeded
    pseudo-random sample + one Lloyd round (:func:`_ivf_centroids`,
    broadcast once with ray.put);
    cell assignment runs in map_batches over the streaming read; vectors
    land in per-cell parquet partitions (``cells/cell=N/``) so a query
    probes ``nprobe`` cell directories instead of the whole table.  Nothing
    corpus-sized ever lives in one process."""
    import json

    path = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(path)
    src_fp = f"{st.st_size}:{st.st_mtime_ns}"
    if index_dir is None:
        key = hashlib.md5(
            f"{os.path.abspath(sf_dir)}:{n_cells}:v3".encode()
        ).hexdigest()[:12]
        index_dir = os.path.join(_IVF_CACHE_ROOT, key)
    marker = os.path.join(index_dir, "_DONE.json")
    if os.path.exists(marker):
        with open(marker) as f:
            meta = json.load(f)
        if meta.get("src_fp") == src_fp:
            return index_dir
        # embeddings changed under the cached index — rebuild, never serve stale
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)
    centroids = _ivf_centroids(path, n_cells)
    cent_ref = ray.put(centroids)
    from librecatastro_ray.sources.readers import read_parquet_clean

    ds = read_parquet_clean(path, columns=["vec_id", "embedding"]).map_batches(
        _CellAssigner,
        fn_constructor_kwargs={"cent_ref": cent_ref},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=(1, 4),
        max_restarts=0,  # ObjectRef constructor arg (ray#53727): rerun, don't restart
    )
    ds.write_parquet(os.path.join(index_dir, "cells"), partition_cols=["cell"])
    np.save(os.path.join(index_dir, "centroids.npy"), centroids)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"n_cells": int(len(centroids)), "source": os.path.abspath(path),
             "src_fp": src_fp},
            f,
        )
    os.replace(tmp, marker)
    return index_dir


def _ivf_cells_ds(index_dir: str, cells: list[int]) -> ray.data.Dataset | None:
    """Dataset over ONLY the probed cell partitions, with the cell id
    re-attached as a column (partition-directory reads — the nprobe IO
    bound is the whole point of IVF)."""
    parts = []
    for c in cells:
        d = os.path.join(index_dir, "cells", f"cell={c}")
        if not os.path.isdir(d):
            continue
        from librecatastro_ray.sources.readers import read_parquet_clean

        sub = read_parquet_clean(d, columns=["vec_id", "embedding"]).map_batches(
            lambda t, cc=c: t.append_column(
                "cell", pa.array(np.full(len(t), cc, dtype=np.int64), pa.int64())
            ),
            batch_format="pyarrow",
        )
        parts.append(sub)
    if not parts:
        if not os.path.isdir(os.path.join(index_dir, "cells")):
            raise FileNotFoundError(f"no IVF index under {index_dir}")
        return None  # every probed cell is empty (a centroid attracted 0 vectors)
    return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])


class _IvfScorer:
    """Partial top-k per batch, restricted per query to ITS probed cells."""

    def __init__(self, queries_ref, k: int):
        self.qids, self.Qn, self.cells = ray.get(queries_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch["vec_id"].to_numpy()
        cell = batch["cell"].to_numpy()
        En = _normalize_rows(np.array(batch["embedding"].to_pylist(), dtype=np.float64))
        C = self.Qn @ En.T
        out_q, out_v, out_c = [], [], []
        for qi, qid in enumerate(self.qids):
            mask = np.isin(cell, self.cells[qi])
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                continue
            row6 = np.round(C[qi][idx], 6)
            take = idx[np.lexsort((vids[idx], -row6))[: self.k]]
            out_q.extend([int(qid)] * len(take))
            out_v.extend(vids[take].tolist())
            out_c.extend(np.round(C[qi][take], 6).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )


def ivf_search_batch(
    index_dir: str, qids: np.ndarray, Q: np.ndarray, k: int = 10, nprobe: int = 2
) -> dict[int, list[tuple[int, float]]]:
    """Batch IVF search: per query, probe the ``nprobe`` nearest cells;
    read ONLY those cell partitions (as a streaming Dataset), partial top-k
    per batch, tiny driver merge.  Ranking is (round(cos,6) desc, vec_id
    asc) — identical to the exact searcher restricted to the probed cells."""
    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    Qn = _normalize_rows(np.asarray(Q, dtype=np.float64))
    # probe ranking on ROUNDED cosine with cell-asc tiebreak — the same
    # deterministic rule the ivf_topk SQL oracle replays
    cell_ids = np.arange(len(centroids))
    cells = [
        cell_ids[np.lexsort((cell_ids, -np.round(centroids @ q, 6)))][:nprobe]
        for q in Qn
    ]
    needed = sorted({int(c) for cc in cells for c in cc})
    queries_ref = ray.put((np.asarray(qids), Qn, cells))
    cells_ds = _ivf_cells_ds(index_dir, needed)
    if cells_ds is None:
        return {int(q): [] for q in qids}
    partials = (
        cells_ds
        .map_batches(
            _IvfScorer,
            fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
            batch_format="pyarrow",
            batch_size=2048,
            concurrency=(1, 4),
            max_restarts=0,  # ObjectRef constructor arg (ray#53727)
        )
        .to_pandas()  # ≤ queries × k × batches — result-scale
    )
    out: dict[int, list[tuple[int, float]]] = {int(q): [] for q in qids}
    for qid, g in partials.groupby("query_id", sort=True):
        cos6 = np.round(g["cos"].to_numpy(), 6)
        vids = g["vec_id"].to_numpy()
        order = np.lexsort((vids, -cos6))[:k]
        out[int(qid)] = [(int(vids[i]), float(cos6[i])) for i in order]
    return out


def ivf_topk(
    sf_dir: str, n_queries: int = 5, k: int = 10, nprobe: int = 2, n_cells: int = 8
) -> dict[int, list[tuple[int, float]]]:
    """Build (cached) + batch-search the distributed IVF index."""
    index_dir = ivf_build(sf_dir, n_cells=n_cells)
    qids, Q = _load_queries(sf_dir, n_queries)
    return ivf_search_batch(index_dir, qids, Q, k=k, nprobe=nprobe)


def ivf_cell_assign(sf_dir: str, n_cells: int = 8) -> pa.Table:
    """(vec_id, cell) assignment table of the distributed IVF index — read
    back from the per-cell parquet PARTITIONS the build wrote (so the oracle
    checks the on-disk index content, not a recomputation).  Exact-argmax
    SQL-expressible: seeds by md5 order, one Lloyd round, round-6 cosine
    argmax — the DuckDB oracle in ``__ray_entry__`` replays all three.
    Correctness-gate entry: the full table is returned (corpus-scale;
    at 100 TB the consumer is the partitioned parquet itself)."""
    index_dir = ivf_build(sf_dir, n_cells=n_cells)
    cells_ds = _ivf_cells_ds(index_dir, list(range(n_cells)))
    if cells_ds is None:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cell": pa.array([], pa.int64())})
    out = cells_ds.select_columns(["vec_id", "cell"]).to_pandas()
    return pa.Table.from_pandas(
        out.sort_values("vec_id", ignore_index=True), preserve_index=False
    )


def ivf_cell_assign_to_parquet(
    sf_dir: str, out_dir: str, n_cells: int = 8
) -> dict:
    """PRODUCTION consumer of the IVF assignment (the round-5
    production-path ask): stream (vec_id, cell) from the built index's
    per-cell partitions straight to parquet partitioned by cell — no
    driver pandas anywhere (the gate-shaped :func:`ivf_cell_assign` exists
    only for the oracle compare; the at-scale source of truth is the
    index's own ``cells/cell=N/`` layout, of which this is a columns-only
    projection).  Returns a small report dict (per-cell row counts from
    parquet metadata, output dir)."""
    import pyarrow.dataset as pads

    index_dir = ivf_build(sf_dir, n_cells=n_cells)
    cells_ds = _ivf_cells_ds(index_dir, list(range(n_cells)))
    os.makedirs(out_dir, exist_ok=True)
    if cells_ds is not None:
        cells_ds.select_columns(["vec_id", "cell"]).write_parquet(
            out_dir, partition_cols=["cell"]
        )
    rows_by_cell = {
        int(d.split("=", 1)[1]): pads.dataset(
            os.path.join(out_dir, d), format="parquet"
        ).count_rows()
        for d in sorted(os.listdir(out_dir)) if d.startswith("cell=")
    }
    return {
        "out_dir": out_dir,
        "rows_by_cell": rows_by_cell,
        "n_rows": sum(rows_by_cell.values()),
    }


def embedding_dup_pairs_ivf(
    sf_dir: str, threshold: float = 0.9, n_cells: int = 8
) -> pa.Table:
    """Sub-quadratic near-dup pairs for HIGH thresholds: reuse the IVF cell
    assignment, compute pairs only WITHIN a cell (near-identical vectors
    agree on their argmax centroid with overwhelming probability).
    Approximate — recall vs the exact block-pair join is unit-tested."""
    index_dir = ivf_build(sf_dir, n_cells=n_cells)

    def per_cell(batch: pa.Table) -> pa.Table:
        va_l, vb_l, c_l = [], [], []
        for c in batch["cell"].to_pylist():
            d = os.path.join(index_dir, "cells", f"cell={c}")
            if not os.path.isdir(d):
                continue
            import pyarrow.dataset as pads

            t = pads.dataset(d, format="parquet").to_table(columns=["vec_id", "embedding"])
            vids = t["vec_id"].to_numpy()
            En = _normalize_rows(np.array(t["embedding"].to_pylist(), dtype=np.float64))
            C = En @ En.T
            a_idx, b_idx = np.nonzero(np.round(C, 6) >= threshold)
            keep = vids[a_idx] < vids[b_idx]
            va_l.append(vids[a_idx][keep])
            vb_l.append(vids[b_idx][keep])
            c_l.append(np.round(C[a_idx, b_idx][keep], 6))
        if not va_l:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        return pa.table({"vec_a": pa.array(np.concatenate(va_l), pa.int64()),
                         "vec_b": pa.array(np.concatenate(vb_l), pa.int64()),
                         "cos": pa.array(np.concatenate(c_l), pa.float64())})

    cells_root = os.path.join(index_dir, "cells")
    cells = sorted(
        int(n.split("=")[1]) for n in os.listdir(cells_root) if n.startswith("cell=")
    )
    out = (
        ray.data.from_items([{"cell": c} for c in cells], override_num_blocks=max(len(cells), 1))
        .map_batches(per_cell, batch_format="pyarrow", batch_size=1)
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values(["vec_a", "vec_b"], ignore_index=True), preserve_index=False
    )


# ---------------------------------------------------------------------------
# multimodal stub
# ---------------------------------------------------------------------------


class DecodeStub:
    """Multimodal decode stage with REAL Ray plumbing and a STUBBED decoder.

    Treats the payload as an opaque binary column; the actual decode would
    live in ``_decode``.  The gate now covers ONLY inter-frame video codecs
    (H.264-class temporal prediction) — PPM/WAV
    (multimodal.decode_ppm/decode_wav), PNG (multimodal.decode_png: zlib +
    numpy unfiltering), baseline JPEG (multimodal.decode_jpeg: full Huffman
    entropy decode + IDCT), GIF (decode_gif: variable-width LZW) and
    MJPEG-in-AVI video (decode_avi_mjpeg: RIFF container walk + per-frame
    JPEG decode) all have REAL decoders.  The deterministic fake derives
    metadata from the raw bytes so the schema, batch sizing and actor-pool
    shape are exercised end-to-end.
    """

    def __init__(self, real_decoder: bool = False):
        if real_decoder:
            raise NotImplementedError(
                "inter-frame video codecs (H.264) not available in this "
                "environment (PPM/WAV/PNG/JPEG/GIF and MJPEG-AVI video "
                "decode natively: librecatastro_ray.pipelines.multimodal."
                "decode_ppm/decode_wav/decode_png/decode_jpeg/decode_gif/"
                "decode_avi_mjpeg)"
            )

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


# BPE-ish pre-tokenizer (GPT-2-style word/number/punct split, RE2-safe — no
# lookahead, so pyarrow's and DuckDB's RE2 count the same matches)
BPE_SPLIT_RE = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+"


def token_counts_bpe(sf_dir: str) -> ray.data.Dataset:
    """Per-doc token-count estimate under a BPE-ish pre-tokenizer: counts
    word / number / punctuation-run pre-tokens on the lowercased text (the
    cheap proxy for LLM token budgeting; re2 kernel, zero-copy batches)."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.fill_null(batch["text"].combine_chunks(), ""))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": pa.array(_re_count(low, BPE_SPLIT_RE), pa.int64()),
            }
        )

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=4096
    )


class FrameSampler:
    """Multimodal frame-sample + per-frame feature stage (actor pool, REAL
    plumbing / deterministic fake features like DecodeStub): the payload is
    cut into fixed-stride frames (every 256 CHARACTERS, capped at 8 — the
    video frame-sample analogue) and each frame gets an md5 feature.  A real
    decoder would replace ``_frame_feature`` (codec libs absent here)."""

    FRAME_CHARS = 256
    MAX_FRAMES = 8

    def __init__(self, real_decoder: bool = False):
        # same honest-stub policy as DecodeStub: the real codec path is
        # gated, the Ray plumbing is real
        if real_decoder:
            raise NotImplementedError(
                "inter-frame video codecs (H.264) not available in this "
                "environment; the REAL-decoder frame samplers are "
                "multimodal.AudioFrameSampler (WAV) and "
                "multimodal.VideoFeatures (MJPEG-in-AVI)"
            )

    @staticmethod
    def _frame_feature(frame: str) -> str:
        return hashlib.md5(frame.encode("utf-8")).hexdigest()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [(s or "") for s in batch["text"].to_pylist()]
        n_frames, first, last = [], [], []
        for t in texts:
            n = min((len(t) + self.FRAME_CHARS - 1) // self.FRAME_CHARS, self.MAX_FRAMES)
            n_frames.append(n)
            if n == 0:
                first.append(None)
                last.append(None)
            else:
                first.append(self._frame_feature(t[: self.FRAME_CHARS]))
                lo = (n - 1) * self.FRAME_CHARS
                last.append(self._frame_feature(t[lo : lo + self.FRAME_CHARS]))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_frames": pa.array(n_frames, pa.int64()),
                "first_frame_md5": pa.array(first, pa.string()),
                "last_frame_md5": pa.array(last, pa.string()),
            }
        )


def multimodal_frames(sf_dir: str) -> ray.data.Dataset:
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=512, concurrency=(1, 4)
    )


def near_dup_clusters(
    sf_dir: str, verify_threshold: float = 0.6, pairs: pa.Table | None = None
) -> pa.Table:
    """The dedup DECISION for the near-dup family: connected components over
    the verified MinHash-LSH pairs; every clustered doc maps to its
    component's smallest doc_id (``cluster_keep`` — keep that one, drop the
    rest).  The pair set is output-scale by construction (it already passed
    the similarity threshold), so the union-find runs on the driver; the
    heavy lifting (candidate generation + verification) is the distributed
    pipeline above.  Pass a pre-computed ``pairs`` table (doc_a, doc_b, ...)
    to reuse an earlier :func:`minhash_lsh_candidates` result instead of
    re-running the LSH pipeline."""
    if pairs is None:
        pairs = minhash_lsh_candidates(sf_dir, verify_threshold)
    a = pairs["doc_a"].to_numpy()
    b = pairs["doc_b"].to_numpy()
    ids = np.unique(np.concatenate([a, b])) if len(a) else np.zeros(0, np.int64)
    parent = {int(i): int(i) for i in ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            # union by smaller root → the root IS the smallest id
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    out = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "cluster_keep": pa.array([find(int(i)) for i in ids], pa.int64()),
        }
    )
    return out


def curate_corpus_ds(
    sf_dir: str,
    min_tokens: int = 10,
    max_stop_ratio: float = 0.9,
    max_punct_ratio: float = 0.3,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """The composite training-data CURATION pipeline: one streaming pass
    computes per-doc sha256 + quality features + language id, exact-dedup
    winners come from a vectorized groupby-min on the sha, and the winner
    flag joins back by sha (native hash join) — a doc survives iff it is
    its content's smallest doc_id AND clears the quality thresholds AND has
    a recognized language.  Output Dataset: (doc_id, lang_pred, n_tokens).
    Everything distributed; nothing corpus-sized on the driver — consume
    with :func:`curate_corpus_to_parquet` (the 100 TB production path) or
    :func:`curate_corpus` (the driver-table oracle-gate shape)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Min

    langs = sorted(LANG_MARKERS)

    def features(batch: pa.Table) -> pa.Table:
        text_raw = batch["text"].combine_chunks() if isinstance(
            batch["text"], pa.ChunkedArray) else batch["text"]
        text = pc.fill_null(text_raw, "")
        low = pc.utf8_lower(text)
        n_chars = pc.utf8_length(text).to_numpy().astype(np.int64)
        n_tokens = _re_count(low, _TOKEN_COUNT_RE)
        alpha_chars = _re_count(low, _ALPHA_CHAR_RE)
        ws_chars = _re_count(text, r"\s")
        n_stop = _re_count(low, _alt(STOPWORDS))
        tok_div = np.where(n_tokens > 0, n_tokens, 1)
        chr_div = np.where(n_chars > 0, n_chars, 1)
        stop_ratio = np.round(np.where(n_tokens > 0, n_stop / tok_div, 0.0), 6)
        punct_ratio = np.round(
            np.where(n_chars > 0, (n_chars - alpha_chars - ws_chars) / chr_div, 0.0), 6
        )
        counts = np.stack([_re_count(low, _alt(LANG_MARKERS[g])) for g in langs], axis=1)
        best = np.array(langs, dtype=object)[np.argmax(counts, axis=1)]
        best[counts.max(axis=1) == 0] = "und"
        from librecatastro_ray.functions.hashing import sha256_batch

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sha256": sha256_batch(text_raw),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "stop_ratio": pa.array(stop_ratio, pa.float64()),
                "punct_ratio": pa.array(punct_ratio, pa.float64()),
                "lang_pred": pa.array(best, pa.string()),
            }
        )

    feats = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        features, batch_format="pyarrow", batch_size=4096
    ).materialize()  # consumed twice (dedup-min side + join side); never text
    num_partitions = _shuffle_width(feats.count(), 4096, num_partitions)
    winners = feats.groupby("sha256").aggregate(Min("doc_id", alias_name="keep_id"))
    joined = feats.join(winners, "inner", num_partitions, on=("sha256",))

    def keep(t: pa.Table) -> pa.Table:
        m = (
            pc.and_(
                pc.and_(
                    pc.equal(t["doc_id"], t["keep_id"]),
                    pc.greater_equal(t["n_tokens"], min_tokens),
                ),
                pc.and_(
                    pc.and_(
                        pc.less_equal(t["stop_ratio"], max_stop_ratio),
                        pc.less_equal(t["punct_ratio"], max_punct_ratio),
                    ),
                    pc.not_equal(t["lang_pred"], "und"),
                ),
            )
        )
        return t.filter(m).select(["doc_id", "lang_pred", "n_tokens"])

    return joined.map_batches(keep, batch_format="pyarrow")


def curate_corpus(
    sf_dir: str,
    min_tokens: int = 10,
    max_stop_ratio: float = 0.9,
    max_punct_ratio: float = 0.3,
    num_partitions: int | None = None,
) -> pa.Table:
    """Oracle-gate shape of :func:`curate_corpus_ds`: the curated set as
    one driver-side sorted table (the correctness driver compares tables).
    Do NOT copy this shape into a production pipeline — at 100 TB the
    consumer is :func:`curate_corpus_to_parquet`."""
    out = curate_corpus_ds(
        sf_dir, min_tokens, max_stop_ratio, max_punct_ratio, num_partitions
    ).to_pandas()
    return pa.Table.from_pandas(
        out.sort_values("doc_id", ignore_index=True), preserve_index=False
    )


def curate_corpus_to_parquet(
    sf_dir: str,
    out_dir: str,
    min_tokens: int = 10,
    max_stop_ratio: float = 0.9,
    max_punct_ratio: float = 0.3,
    num_partitions: int | None = None,
) -> dict:
    """PRODUCTION consumer of :func:`curate_corpus_ds`: stream the curated
    set straight to parquet partitioned by predicted language — blocks go
    from the keep() filter to files, so NOTHING corpus-scale ever touches
    the driver (the round-5 production-path ask: the gate-shaped
    :func:`curate_corpus` exists only for the oracle compare).  Partitioned
    layout doubles as resumable output: a re-run overwrites per-partition
    files, never one giant object.  Returns a small report dict (row count
    per language from parquet metadata, output dir)."""
    import pyarrow.dataset as pads

    os.makedirs(out_dir, exist_ok=True)
    curate_corpus_ds(
        sf_dir, min_tokens, max_stop_ratio, max_punct_ratio, num_partitions
    ).write_parquet(out_dir, partition_cols=["lang_pred"])
    rows_by_lang = {
        d.split("=", 1)[1]: pads.dataset(
            os.path.join(out_dir, d), format="parquet"
        ).count_rows()
        for d in sorted(os.listdir(out_dir)) if d.startswith("lang_pred=")
    }
    return {
        "out_dir": out_dir,
        "rows_by_lang": rows_by_lang,
        "n_rows": sum(rows_by_lang.values()),
    }


# ---------------------------------------------------------------------------
# round-4 corpus ops: stratified sampling, exact length quantiles,
# substring-level dedup (ExactSubstr-lite), regex redaction (PII shape)
# ---------------------------------------------------------------------------

STRATIFIED_RATES = {"en": 0.5, "es": 0.35, "fr": 0.35, "de": 0.35, "zh": 0.2}
STRATIFIED_DEFAULT_RATE = 0.25


def stratified_sample(
    sf_dir: str, rates: dict[str, float] | None = None,
    default_rate: float = STRATIFIED_DEFAULT_RATE,
) -> ray.data.Dataset:
    """Deterministic per-language stratified sampling (the standard
    language-rebalancing downsample a multilingual pretraining mix needs):
    doc kept iff ``u < rate(lang)`` where ``u`` is the 63-bit md5 hash of
    ``'sample:<doc_id>'`` scaled to [0, 1).  Stateless, embarrassingly
    parallel, stable under re-runs and corpus growth (same guarantees as
    :func:`train_val_split` — membership is a pure function of doc_id), and
    the per-stratum rate needs no groupby: the hash IS the uniform draw, so
    no shuffle at any scale.  Exact SQL replay via the md5 integer rule."""
    rates = STRATIFIED_RATES if rates is None else rates
    scale = float(1 << 63)

    def md5_63(key: str) -> int:
        return int.from_bytes(
            hashlib.md5(key.encode()).digest()[:8], "little"
        ) & 0x7FFFFFFFFFFFFFFF

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        langs = pa.compute.fill_null(t["lang"].combine_chunks(), "und").to_pylist()
        u = np.fromiter(
            (md5_63(f"sample:{int(d)}") for d in ids),
            dtype=np.int64, count=len(ids),
        ) / scale
        r = np.fromiter(
            (rates.get(l, default_rate) for l in langs),
            dtype=np.float64, count=len(langs),
        )
        keep = u < r
        mask = pa.array(keep)
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "lang": pa.compute.fill_null(
                t["lang"].combine_chunks(), "und").filter(mask),
            "u": pa.array(np.round(u[keep], 6), pa.float64()),
        })

    return _docs_ds(sf_dir, ["doc_id", "lang"]).map_batches(
        pick, batch_format="pyarrow", batch_size=8192
    )


LENGTH_QUANTILES_PERMILLE = (250, 500, 750, 950, 1000)


def length_quantiles(
    sf_dir: str, permille: tuple[int, ...] = LENGTH_QUANTILES_PERMILLE
) -> pa.Table:
    """EXACT per-language token-length quantiles WITHOUT a distributed sort:
    doc lengths are integers from a bounded domain, so per-batch partial
    (lang, n_tokens) counts collapse the corpus into a histogram whose size
    is langs × distinct-lengths (independent of corpus row count); one
    small groupby merges the partials and the driver walks each language's
    cumsum.  Quantile rule is INTEGER-ONLY (no float boundary flakiness):
    q-permille value = min v with cumcount(v) ≥ ceil(q·n/1000), computed as
    ``(q·n + 999) // 1000`` on both sides of the oracle."""
    import pyarrow.compute as pc

    from librecatastro_ray.functions.tokenizer import tokenize_batch

    def partial(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t["text"].combine_chunks(), "")
        _idx, _terms, dl = tokenize_batch(texts)
        g = pa.table({
            "lang": pc.fill_null(t["lang"].combine_chunks(), "und"),
            "v": pa.array(dl.astype(np.int64), pa.int64()),
        }).group_by(["lang", "v"], use_threads=False).aggregate([([], "count_all")])
        return pa.table({"lang": g["lang"], "v": g["v"],
                         "n": g["count_all"].cast(pa.int64())})

    hist = (
        _docs_ds(sf_dir, ["lang", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby(["lang", "v"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .to_pandas()  # histogram-scale: langs × distinct lengths, tiny
        .sort_values(["lang", "v"], ignore_index=True)
    )
    out = {"lang": [], "q_permille": [], "v": [], "n_docs": []}
    for lang, grp in hist.groupby("lang", sort=True):
        v = grp["v"].to_numpy()
        cum = grp["n"].to_numpy().cumsum()
        tot = int(cum[-1])
        for qp in permille:
            thresh = (qp * tot + 999) // 1000
            out["lang"].append(lang)
            out["q_permille"].append(qp)
            out["v"].append(int(v[np.searchsorted(cum, thresh)]))
            out["n_docs"].append(tot)
    return pa.table({
        "lang": pa.array(out["lang"], pa.string()),
        "q_permille": pa.array(out["q_permille"], pa.int64()),
        "v": pa.array(out["v"], pa.int64()),
        "n_docs": pa.array(out["n_docs"], pa.int64()),
    })


_SUBSTR_SCRATCH_ROOT = os.environ.get("LCRAY_SUBSTR_SCRATCH", "/tmp/lcray_substr")


def dedup_substring(
    sf_dir: str, k: int = 8, num_partitions: int | None = None,
    stats_out: dict | None = None,
) -> ray.data.Dataset:
    """Substring-level duplication profile (ExactSubstr-lite, after Lee et
    al. 2021 "Deduplicating Training Data Makes Language Models Better"):
    for every document, how many of its ``k``-token windows occur more than
    once in the WHOLE corpus (suffix-array-free formulation: window
    identity via the same rolling gram hashes as :func:`decontaminate`;
    hash equality ⟺ token-sequence equality w.h.p. — the SQL oracle
    compares the space-joined token strings exactly, so a collision or a
    hashing bug breaks the gate).

    Distributed shape (the 100 TB design): token-scale windows never leave
    their batch raw — stage 1 emits per-batch-distinct ``(g, doc_id, c)``
    partials and writes them to scratch parquet hash-partitioned by
    ``g % P`` (the "shuffle" rides the filesystem / object store, exactly
    as it would on a 256-node cluster); stage 2 is P INDEPENDENT
    per-partition tasks, each of which loads one partition, sums counts per
    gram locally (partitioning by ``g`` means every occurrence of a gram is
    in the same partition), and folds the >1-count grams straight into
    per-doc duplicate-window partials.  No global groupby of the gram
    table, no JoinOperator (the Ray 2.49 two-join deadlock never arises),
    and — unlike the pre-round-5 shape — NO corpus-wide materialize(): peak
    memory per task is ONE partition, ~1/P of the gram set, so P scales the
    gram set out of any single heap.  The per-doc base (every doc's window
    count, including dl < k docs with 0) rides a UNION into one final
    doc-keyed groupby instead of an outer join.  Every stage is
    Arrow-in/Arrow-out.

    ``stats_out`` (optional dict) receives ``{"n_partitions",
    "partition_rows", "max_partition_rows", "total_gram_rows"}`` measured
    from the scratch parquet metadata — the boundedness evidence the scale
    test asserts on."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    n_cpus = max(2, int(ray.cluster_resources().get("CPU", 4)))
    P = max(2, num_partitions) if num_partitions else min(64, max(16, n_cpus))

    def partial_grams(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t["text"].combine_chunks(), "")
        g, n_win = _token_gram_hashes(texts, k)
        did = np.repeat(t["doc_id"].to_numpy(), n_win)
        key = g.astype(np.int64)  # wrap-cast: partition/groupby key only
        order = np.lexsort((key, did))
        did_s, key_s = did[order], key[order]
        first = np.ones(len(order), dtype=bool)
        if len(order) > 1:
            first[1:] = (did_s[1:] != did_s[:-1]) | (key_s[1:] != key_s[:-1])
        starts = np.flatnonzero(first)
        c = np.diff(np.append(starts, len(order)))
        ks = key_s[starts]
        return pa.table({
            "g": pa.array(ks, pa.int64()),
            "doc_id": pa.array(did_s[starts], pa.int64()),
            "c": pa.array(c.astype(np.int64), pa.int64()),
            # non-negative partition id from the wrap-cast int64 hash
            "part": pa.array((ks % P + P) % P, pa.int64()),
        })

    def base_rows(t: pa.Table) -> pa.Table:
        from librecatastro_ray.functions.tokenizer import tokenize_batch

        texts = pc.fill_null(t["text"].combine_chunks(), "")
        _i, _t, dl = tokenize_batch(texts)
        n_win = np.maximum(dl - (k - 1), 0).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_windows": pa.array(n_win, pa.int64()),
            "n_dup_windows": pa.array(np.zeros(len(t), np.int64), pa.int64()),
        })

    base = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        base_rows, batch_format="pyarrow", batch_size=2048
    )

    # stage 1 (eager): per-doc gram partials → scratch parquet, hash-
    # partitioned by g % P.  One directory per partition; a resumable /
    # failed run re-derives only this scratch, never the output.
    import uuid

    scratch = os.path.join(_SUBSTR_SCRATCH_ROOT, uuid.uuid4().hex[:12])
    os.makedirs(scratch, exist_ok=True)
    _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        partial_grams, batch_format="pyarrow", batch_size=2048
    ).write_parquet(scratch, partition_cols=["part"])

    part_dirs = sorted(
        d for d in os.listdir(scratch) if d.startswith("part=")
    ) if os.path.isdir(scratch) else []
    if stats_out is not None:
        rows = {
            d: pads.dataset(os.path.join(scratch, d), format="parquet")
            .count_rows()
            for d in part_dirs
        }
        stats_out["n_partitions"] = len(part_dirs)
        stats_out["partition_rows"] = rows
        stats_out["max_partition_rows"] = max(rows.values(), default=0)
        stats_out["total_gram_rows"] = sum(rows.values())
    if not part_dirs:
        return base  # no doc produced a single k-token window

    part_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_windows", pa.int64()),
         ("n_dup_windows", pa.int64())]
    )

    def per_partition(t: pa.Table) -> pa.Table:
        # one task = one partition: load (g, doc_id, c) rows for this g-range,
        # local gram-count fold, per-doc dup-window partials out.  Peak
        # memory = this partition only.
        out = []
        for d in t["dir"].to_pylist():
            rows = pads.dataset(d, format="parquet").to_table(
                columns=["g", "doc_id", "c"]
            )
            if len(rows) == 0:
                continue
            g = rows["g"].to_numpy()
            did = rows["doc_id"].to_numpy()
            c = rows["c"].to_numpy()
            order = np.argsort(g, kind="stable")
            gs = g[order]
            bnd = np.flatnonzero(np.concatenate([[True], gs[1:] != gs[:-1]]))
            tot = np.add.reduceat(c[order], bnd)
            seg = np.repeat(np.arange(len(bnd)), np.diff(np.append(bnd, len(gs))))
            dup_gram = (tot > 1)[seg]
            keep = order[dup_gram]
            if len(keep) == 0:
                continue
            dd, cc = did[keep], c[keep]
            od = np.argsort(dd, kind="stable")
            dds = dd[od]
            b2 = np.flatnonzero(np.concatenate([[True], dds[1:] != dds[:-1]]))
            out.append(pa.table({
                "doc_id": pa.array(dds[b2], pa.int64()),
                "n_windows": pa.array(np.zeros(len(b2), np.int64), pa.int64()),
                "n_dup_windows": pa.array(
                    np.add.reduceat(cc[od], b2).astype(np.int64), pa.int64()
                ),
            }))
        if not out:
            return part_schema.empty_table()
        return pa.concat_tables(out)

    dup_per_doc = ray.data.from_items(
        [{"dir": os.path.join(scratch, d)} for d in part_dirs],
        override_num_blocks=len(part_dirs),
    ).map_batches(per_partition, batch_format="pyarrow", batch_size=1)
    return (
        base.union(dup_per_doc)
        .groupby("doc_id")
        .aggregate(
            ray.data.aggregate.Sum("n_windows", alias_name="n_windows"),
            ray.data.aggregate.Sum("n_dup_windows", alias_name="n_dup_windows"),
        )
    )


# default redaction patterns: the PII set every training-data pipeline
# ships (RE2 semantics on BOTH sides: Arrow's replace_substring_regex and
# DuckDB's regexp_* are RE2) — applied IN ORDER, counts taken on the text
# state each pattern actually sees
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
)


def regex_redact(
    sf_dir: str, patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS
) -> ray.data.Dataset:
    """Sequential regex redaction with per-pattern match counts (the PII
    scrubbing pass of a training-data pipeline): for each ``(name, regex,
    replacement)`` — in order — count non-overlapping matches in the
    CURRENT text state, then replace them, so later patterns see earlier
    redactions (both sides of the oracle chain identically).  All counting
    and replacement is Arrow RE2 kernels; the only per-row Python is the
    md5 of the final redacted text (no Arrow digest kernel exists — same
    accepted cost class as sha256_batch).  Embarrassingly parallel, no
    shuffle."""
    import pyarrow.compute as pc

    def redact(t: pa.Table) -> pa.Table:
        cur = pc.fill_null(t["text"].combine_chunks(), "")
        cols: dict[str, pa.Array] = {"doc_id": t["doc_id"]}
        for name, pat, rep in patterns:
            cols[f"n_{name}"] = pc.count_substring_regex(cur, pat).cast(pa.int64())
            cur = pc.replace_substring_regex(cur, pat, rep)
        cols["redacted_len"] = pc.utf8_length(cur).cast(pa.int64())
        cols["redacted_md5"] = pa.array(
            [hashlib.md5(s.encode()).hexdigest() for s in cur.to_pylist()],
            pa.string(),
        )
        return pa.table(cols)

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        redact, batch_format="pyarrow", batch_size=4096
    )
