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

from librecatastro_ray.functions.hashing import term_hashes
from librecatastro_ray.functions.tokenizer import term_frequencies_batch

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int64()),
        ("dl", pa.int64()),
        ("skey", pa.int64()),
    ]
)


class FlatPostings:
    """Callable-class UDF for ``map_batches`` (actor pool): the hot-term set
    and partitioning constants are held once per actor."""

    def __init__(self, num_partitions: int, num_salts: int, hot_terms: list[str]):
        self.P = num_partitions
        self.S = num_salts
        self.hot = np.array(sorted(hot_terms), dtype=object)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tf_table, _dl = term_frequencies_batch(batch["content"])
        rows = tf_table["row"].to_numpy()
        doc_ids = batch["doc_id"].to_numpy()[rows]
        dl_per_row = _dl[rows]
        terms = tf_table["term"].to_numpy(zero_copy_only=False)
        tf = tf_table["tf"].to_numpy()
        h = term_hashes(terms)
        pkey = h % self.P
        salt = np.zeros(len(terms), dtype=np.int64)
        if len(self.hot) and len(terms):
            hot_mask = np.isin(terms, self.hot)
            salt[hot_mask] = doc_ids[hot_mask] % self.S
        skey = pkey * self.S + salt
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "tf": pa.array(tf, pa.int64()),
                "dl": pa.array(dl_per_row, pa.int64()),
                "skey": pa.array(skey, pa.int64()),
            }
        )


class AddDocLen:
    """map_batches: append the token count ``dl`` — completes the canonical
    doc store row (doc_id, repo, path, commit, lang, content, sha256, dl):
    forward index + row-invariant + BM25 norm table in one parquet."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from librecatastro_ray.functions.tokenizer import tokenize_batch

        _idx, _terms, dl = tokenize_batch(batch["content"])
        return batch.append_column("dl", pa.array(dl, pa.int64()))
