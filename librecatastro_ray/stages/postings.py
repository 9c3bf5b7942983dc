"""Flat-posting emission + salted term partitioning.

map_batches stage (stateless in data, stateful in config → actor pool) that
turns doc batches into flat postings ``(term, doc_id, tf, dl, skey)`` where

    pkey = term_hash(term) % P                 (term partition — the analogue
                                                of the reference's 5 shards,
                                                reference: elasticsearch_utils.py:27-30,
                                                but term- not doc-partitioned)
    salt = doc_id % S   if term is hot else 0  (skew: hot code terms like
                                                ``def``/``return`` are spread
                                                over S sub-partitions)
    skey = pkey * S + salt

Postings carry dl so the per-partition merge can compute exact BM25 block-max
bounds locally without a doc-stats join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from librecatastro_ray.functions.analysis import get_analyzer, term_frequencies_with
from librecatastro_ray.functions.hashing import term_hashes

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int64()),
        ("dl", pa.int64()),
        ("skey", pa.int64()),
    ]
)


def flat_postings(
    batch: pa.Table,
    *,
    num_partitions: int,
    num_salts: int,
    hot_terms: list[str],
    analyzer_id: str = "code_standard_v1",
) -> pa.Table:
    """map_batches (stateless task, ``fn_kwargs``): tokenize + emit flat
    postings.  Task-based rather than an actor pool: the per-task state
    (the hot-term list, typically tens of keyword-class strings) is trivially
    small, and warm-worker reuse beats paying an actor-process startup per
    pool slot.  A genuinely large broadcast side would move to ``ray.put`` +
    an actor pool.  The analyzer travels as its registry ID (resolved here,
    inside the task)."""
    P, S = num_partitions, num_salts
    hot = np.array(sorted(hot_terms), dtype=object)
    tf_table, _dl = term_frequencies_with(get_analyzer(analyzer_id), batch["content"])
    rows = tf_table["row"].to_numpy()
    doc_ids = batch["doc_id"].to_numpy()[rows]
    dl_per_row = _dl[rows]
    terms = tf_table["term"].to_numpy(zero_copy_only=False)
    tf = tf_table["tf"].to_numpy()
    h = term_hashes(terms)
    pkey = h % P
    salt = np.zeros(len(terms), dtype=np.int64)
    if len(hot) and len(terms):
        hot_mask = np.isin(terms, hot)
        salt[hot_mask] = doc_ids[hot_mask] % S
    skey = pkey * S + salt
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "tf": pa.array(tf, pa.int64()),
            "dl": pa.array(dl_per_row, pa.int64()),
            "skey": pa.array(skey, pa.int64()),
        }
    )


def _cut_binary(stream: np.ndarray, bounds: np.ndarray) -> pa.Array:
    """Zero-copy Arrow BinaryArray whose cell i is
    ``stream[bounds[i]:bounds[i+1]]`` (shared by the positional emit below and
    the merge stage's per-block cuts)."""
    if bounds[-1] >= 2**31:
        raise ValueError("binary stream exceeds 2 GiB — raise num_partitions")
    return pa.BinaryArray.from_buffers(
        pa.binary(),
        len(bounds) - 1,
        [None, pa.py_buffer(bounds.astype(np.int32).tobytes()), pa.py_buffer(stream.tobytes())],
    )


def flat_postings_positional(
    batch: pa.Table,
    *,
    num_partitions: int,
    num_salts: int,
    hot_terms: list[str],
    analyzer_id: str = "code_standard_v1",
) -> pa.Table:
    """Positional twin of :func:`flat_postings`: each output posting also
    carries ``pos``, the term's occurrence positions within the doc,
    delta+varbyte-encoded ONCE here at emission — the shuffle and the merge
    then move opaque binary cells and never re-encode (the merge only
    reorders and concatenates them per block).  Lucene analogue:
    IndexOptions.DOCS_AND_FREQS_AND_POSITIONS."""
    from librecatastro_ray.functions.codec import varbyte_encode_with_lengths
    from librecatastro_ray.functions.tokenizer import token_positions_from

    P, S = num_partitions, num_salts
    hot = np.array(sorted(hot_terms), dtype=object)
    analyzer = get_analyzer(analyzer_id)
    parent_idx, toks, dl = analyzer.tokenize_batch(batch["content"])
    pos = token_positions_from(parent_idx, dl)
    n_tok = len(toks)
    if n_tok:
        # group occurrences by (row, term); np.lexsort is stable, so within a
        # group the document-order (ascending) positions are preserved
        enc = pa.compute.dictionary_encode(pa.array(toks, pa.string()))
        codes = enc.indices.to_numpy().astype(np.int64)
        order = np.lexsort((codes, parent_idx))
        rows_s, codes_s, pos_s = parent_idx[order], codes[order], pos[order]
        change = np.ones(n_tok, dtype=bool)
        change[1:] = (rows_s[1:] != rows_s[:-1]) | (codes_s[1:] != codes_s[:-1])
        group_starts = np.nonzero(change)[0]
        tf = np.diff(np.append(group_starts, n_tok)).astype(np.int64)
        # delta within a group, absolute first position at each group start
        pgaps = np.empty(n_tok, dtype=np.int64)
        pgaps[0] = pos_s[0]
        pgaps[1:] = pos_s[1:] - pos_s[:-1]
        pgaps[group_starts] = pos_s[group_starts]
        stream, nbytes = varbyte_encode_with_lengths(pgaps)
        cum = np.concatenate([[0], np.cumsum(nbytes)])
        # groups tile [0, n_tok) contiguously, so cell i's byte range is
        # cum[group_starts[i]] .. cum[next start] — one bounds array
        bounds = cum[np.append(group_starts, n_tok)]
        pos_col = _cut_binary(stream, bounds)
        terms = enc.dictionary.to_numpy(zero_copy_only=False)[codes_s[group_starts]]
        doc_ids = batch["doc_id"].to_numpy()[rows_s[group_starts]]
        dl_per_row = dl[rows_s[group_starts]]
    else:
        tf = np.zeros(0, dtype=np.int64)
        terms = np.zeros(0, dtype=object)
        doc_ids = np.zeros(0, dtype=np.int64)
        dl_per_row = np.zeros(0, dtype=np.int64)
        pos_col = pa.array([], pa.binary())
    h = term_hashes(terms)
    pkey = h % P
    salt = np.zeros(len(terms), dtype=np.int64)
    if len(hot) and len(terms):
        hot_mask = np.isin(terms, hot)
        salt[hot_mask] = doc_ids[hot_mask] % S
    skey = pkey * S + salt
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "tf": pa.array(tf, pa.int64()),
            "dl": pa.array(dl_per_row, pa.int64()),
            "skey": pa.array(skey, pa.int64()),
            "pos": pos_col,
        }
    )


