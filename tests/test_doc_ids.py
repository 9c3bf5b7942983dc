"""Doc-id assignment determinism: ids depend only on the data, never on
block layout / parallelism (SURVEY.md §7.4 item 4, F2), and duplicate-key
runs spanning block boundaries dedup correctly."""

import numpy as np
import pyarrow as pa
import ray.data

from librecatastro_ray.stages.doc_ids import dedup_and_assign_ids


def _corpus_table(n: int, dup_every: int = 5) -> pa.Table:
    rows = []
    for i in range(n):
        key = i - (i % dup_every == 0)  # every dup_every-th row duplicates the previous key
        rows.append(
            {
                "repo": f"org{key % 7:03d}/proj{key % 13:03d}",
                "path": f"src/m{key:05d}.py",
                "commit": f"{i:040d}",
                "lang": "py",
                "content": f"def f{i}(): return {i} " + ("x " * (i % 9)),
            }
        )
    return pa.Table.from_pylist(rows)


def _ids_for_layout(table: pa.Table, n_blocks: int) -> dict:
    import ray

    ds = ray.data.from_arrow(table).repartition(n_blocks)
    out, n_docs = dedup_and_assign_ids(ds)
    t = pa.concat_tables([b for b in (ray.get(r) for r in _refs(out)) if len(b)])
    assert t.num_rows == n_docs
    return {
        (r, p): (d, s)
        for r, p, d, s in zip(
            t["repo"].to_pylist(),
            t["path"].to_pylist(),
            t["doc_id"].to_pylist(),
            t["sha256"].to_pylist(),
        )
    }


def _refs(ds):
    import ray

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    return refs


def test_ids_invariant_under_block_layout(ray_session):
    table = _corpus_table(120)
    a = _ids_for_layout(table, 2)
    b = _ids_for_layout(table, 17)
    assert a == b
    # dense 0..n-1 in sorted (repo, path) order
    ids = [d for d, _ in a.values()]
    assert sorted(ids) == list(range(len(a)))
    by_key = sorted(a.items())
    assert [d for _, (d, _) in by_key] == list(range(len(a)))


def test_dedup_keeps_max_sha_winner(ray_session):
    table = _corpus_table(60, dup_every=3)
    got = _ids_for_layout(table, 5)
    # recompute expected winners in plain python
    import hashlib

    exp = {}
    for row in table.to_pylist():
        sha = hashlib.sha256((row["content"] or "").encode()).hexdigest()
        k = (row["repo"], row["path"])
        if k not in exp or sha > exp[k]:
            exp[k] = sha
    assert {k: s for k, (_, s) in got.items()} == exp


def test_empty_and_single_doc(ray_session):
    schema = pa.schema(
        [("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
         ("lang", pa.string()), ("content", pa.string())]
    )
    ds_e, n_e = dedup_and_assign_ids(ray.data.from_arrow(schema.empty_table()))
    assert n_e == 0
    one = _corpus_table(1)
    ds_1, n_1 = dedup_and_assign_ids(ray.data.from_arrow(one))
    assert n_1 == 1
    t = pa.concat_tables([ray.get(r) for r in _refs(ds_1)])
    assert t["doc_id"].to_pylist() == [0]
