"""Derive the input_hint corpus (repo, path, commit, lang, content) from the
driver's ``documents`` table — deterministically, so the DuckDB oracle can
mirror the derivation in SQL:

    repo    = source
    path    = 'docs/' || lang || '/' || lpad(doc_id, 8, '0') || '.txt'
    commit  = lpad(doc_id, 40, '0')
    lang    = lang
    content = text

lpad keeps lexicographic path order equal to numeric doc order, so the
engine's sorted-(repo, path) doc-id assignment matches SQL
``row_number() OVER (ORDER BY repo, path) - 1``.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

CORPUS_FROM_DOCUMENTS_SQL = """
    SELECT
        source AS repo,
        'docs/' || lang || '/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.txt' AS path,
        lpad(CAST(doc_id AS VARCHAR), 40, '0') AS "commit",
        lang,
        text AS content
    FROM documents
"""


def _derive_batch(batch: pa.Table) -> pa.Table:
    doc_id_str = pc.cast(batch["doc_id"], pa.string())
    pad = pc.utf8_lpad(doc_id_str, 8, "0")
    path = pc.binary_join_element_wise(
        pa.scalar("docs/"), batch["lang"], pa.scalar("/"), pad, pa.scalar(".txt"), ""
    )
    # binary_join_element_wise joins with the LAST argument as separator
    commit = pc.utf8_lpad(doc_id_str, 40, "0")
    return pa.table(
        {
            "repo": batch["source"],
            "path": path,
            "commit": commit,
            "lang": batch["lang"],
            "content": batch["text"],
        }
    )


def corpus_from_documents(sf_dir: str) -> ray.data.Dataset:
    from librecatastro_ray.sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "lang", "text"],
    )
    return ds.map_batches(_derive_batch, batch_format="pyarrow", batch_size=4096)
