"""Per-partition posting merge: sort → per-term delta+varbyte blocks with
block-max metadata → atomic write + checkpoint.

One merge task owns one shuffle partition (skey); partitions are independent,
resumable units (reference analogue: the per-street anti-join skip that makes
crawls resumable, reference: src/utils/elasticsearch_utils.py:100-136).

Output per skey = (pkey, salt):
    parts/blocks-{pkey}-{salt}.parquet
        term, block_no, n, last_doc, max_tfnorm, docs (vb deltas), tfs (vb),
        dls (vb)
    parts/dict-{pkey}-{salt}.parquet
        term, df, cf
    checkpoints/part-{skey}.json   lineage + metrics
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from librecatastro_ray.config import IndexConfig
from librecatastro_ray.functions.bm25 import tf_norm
from librecatastro_ray.functions.codec import delta_encode, varbyte_encode
from librecatastro_ray.functions.hashing import sha256_hex
from librecatastro_ray.state.manifest import atomic_write_json, checkpoint_path

BLOCKS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("block_no", pa.int32()),
        ("n", pa.int32()),
        ("last_doc", pa.int64()),
        ("max_tfnorm", pa.float64()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
        ("dls", pa.binary()),
    ]
)

DICT_SCHEMA = pa.schema([("term", pa.string()), ("df", pa.int64()), ("cf", pa.int64())])


def blocks_file(index_dir: str, pkey: int, salt: int) -> str:
    return os.path.join(index_dir, "parts", f"blocks-{pkey:04d}-{salt:02d}.parquet")


def dict_file(index_dir: str, pkey: int, salt: int) -> str:
    return os.path.join(index_dir, "parts", f"dict-{pkey:04d}-{salt:02d}.parquet")


def _atomic_write_parquet(path: str, table: pa.Table, row_group_size: int) -> int:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp, row_group_size=row_group_size, compression="zstd")
    os.replace(tmp, path)
    return os.path.getsize(path)


def merge_partition(
    index_dir: str,
    skey: int,
    avgdl: float,
    config: IndexConfig,
) -> dict:
    """Merge one shuffle partition of flat postings into encoded blocks.

    Reads ``{index_dir}/shuffle/skey={skey}/`` (written by the phase-1
    partitioned spill), returns the checkpoint entry it wrote.
    """
    t0 = time.monotonic()
    S = config.num_salts
    pkey, salt = divmod(skey, S)
    part_dir = os.path.join(index_dir, "shuffle", f"skey={skey}")
    lineage_files: list[str] = []
    if os.path.isdir(part_dir):
        dset = pads.dataset(part_dir, format="parquet")
        lineage_files = sorted(os.path.basename(f) for f in dset.files)
        t = dset.to_table(columns=["term", "doc_id", "tf", "dl"])
    else:
        t = pa.table(
            {
                "term": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
                "dl": pa.array([], pa.int64()),
            }
        )

    order = pa.compute.sort_indices(
        t, sort_keys=[("term", "ascending"), ("doc_id", "ascending")]
    )
    t = t.take(order).combine_chunks()
    terms = t["term"].to_numpy(zero_copy_only=False)
    doc_ids = t["doc_id"].to_numpy()
    tfs = t["tf"].to_numpy()
    dls = t["dl"].to_numpy()

    B = config.block_size
    out_terms: list[str] = []
    out_block_no: list[int] = []
    out_n: list[int] = []
    out_last: list[int] = []
    out_max: list[float] = []
    out_docs: list[bytes] = []
    out_tfs: list[bytes] = []
    out_dls: list[bytes] = []
    dict_terms: list[str] = []
    dict_df: list[int] = []
    dict_cf: list[int] = []

    if len(terms):
        # term run boundaries
        change = np.ones(len(terms), dtype=bool)
        change[1:] = terms[1:] != terms[:-1]
        starts = np.nonzero(change)[0]
        ends = np.append(starts[1:], len(terms))
        for s, e in zip(starts, ends):
            term = terms[s]
            d = doc_ids[s:e]
            f = tfs[s:e]
            L = dls[s:e]
            tn = tf_norm(f, L, avgdl, config.k1, config.b)
            dict_terms.append(term)
            dict_df.append(int(e - s))
            dict_cf.append(int(f.sum()))
            n_blocks = (len(d) + B - 1) // B
            for bno in range(n_blocks):
                lo, hi = bno * B, min((bno + 1) * B, len(d))
                out_terms.append(term)
                out_block_no.append(bno)
                out_n.append(hi - lo)
                out_last.append(int(d[hi - 1]))
                out_max.append(float(tn[lo:hi].max()))
                out_docs.append(varbyte_encode(delta_encode(d[lo:hi])))
                out_tfs.append(varbyte_encode(f[lo:hi]))
                out_dls.append(varbyte_encode(L[lo:hi]))

    blocks = pa.table(
        {
            "term": pa.array(out_terms, pa.string()),
            "block_no": pa.array(out_block_no, pa.int32()),
            "n": pa.array(out_n, pa.int32()),
            "last_doc": pa.array(out_last, pa.int64()),
            "max_tfnorm": pa.array(out_max, pa.float64()),
            "docs": pa.array(out_docs, pa.binary()),
            "tfs": pa.array(out_tfs, pa.binary()),
            "dls": pa.array(out_dls, pa.binary()),
        }
    )
    dict_t = pa.table(
        {
            "term": pa.array(dict_terms, pa.string()),
            "df": pa.array(dict_df, pa.int64()),
            "cf": pa.array(dict_cf, pa.int64()),
        }
    )

    bpath = blocks_file(index_dir, pkey, salt)
    dpath = dict_file(index_dir, pkey, salt)
    nbytes = _atomic_write_parquet(bpath, blocks, config.blocks_row_group_size)
    nbytes += _atomic_write_parquet(dpath, dict_t, config.blocks_row_group_size)

    with open(bpath, "rb") as fh:
        out_sha = sha256_hex(fh.read())

    entry = {
        "skey": skey,
        "pkey": pkey,
        "salt": salt,
        "lineage": {
            "input_dir": f"shuffle/skey={skey}",
            "input_files": lineage_files,
            "input_rows": int(len(terms)),
        },
        "metrics": {
            "n_postings": int(len(terms)),
            "n_terms": int(len(dict_terms)),
            "n_blocks": int(len(out_terms)),
            "bytes": int(nbytes),
            "duration_s": round(time.monotonic() - t0, 4),
        },
        "outputs": [
            os.path.relpath(bpath, index_dir),
            os.path.relpath(dpath, index_dir),
        ],
        "output_sha256": out_sha,
    }
    atomic_write_json(checkpoint_path(index_dir, skey), entry)
    return entry


class MergeActor:
    """Actor-pool UDF: one __call__ merges the partitions named in its batch.

    State (avgdl, config) is held once per actor; each input row is one skey.
    """

    def __init__(self, index_dir: str, avgdl: float, config_json: dict):
        self.index_dir = index_dir
        self.avgdl = avgdl
        self.config = IndexConfig.from_json(config_json)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        entries = []
        for skey in batch["skey"].to_pylist():
            entry = merge_partition(self.index_dir, int(skey), self.avgdl, self.config)
            entries.append(json.dumps(entry, sort_keys=True))
        return pa.table({"checkpoint": pa.array(entries, pa.string())})
