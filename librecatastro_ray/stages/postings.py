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


