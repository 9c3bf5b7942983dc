"""Incremental indexing (`add_documents`): the ES continuous-upsert behavior
the reference crawler relies on (one batch at a time here; reference:
src/utils/elasticsearch_utils.py:100-136 + cadaster_entry.py:46-77),
Lucene-style — new ids append, colliding keys tombstone-then-add, every
partition re-merges decoded old postings with the new spill (content never
re-tokenized), the manifest flips last (MVCC)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from librecatastro_ray.config import IndexConfig
from librecatastro_ray.pipelines.build import add_documents, build_index
from librecatastro_ray.pipelines.query import QueryEngine
from librecatastro_ray.sources.synth import make_corpus
from librecatastro_ray.stages.merge import dict_file


def _dictionary(index_dir: str) -> list[tuple]:
    """(term, df, cf) over all partitions — doc-id-INVARIANT index content."""
    eng = QueryEngine(index_dir)
    rows = []
    for pkey in range(eng.config.num_partitions):
        for salt in range(eng.config.num_salts):
            p = dict_file(index_dir, pkey, salt, eng._parts)
            if os.path.exists(p):
                t = pq.read_table(p)
                rows += list(zip(t["term"].to_pylist(), t["df"].to_pylist(),
                                 t["cf"].to_pylist()))
    agg = {}
    for term, df, cf in rows:
        d, c = agg.get(term, (0, 0))
        agg[term] = (d + df, c + cf)
    return sorted((t, d, c) for t, (d, c) in agg.items())


CFG = IndexConfig(num_partitions=4, num_salts=2, hot_df_ratio=0.1, block_size=16,
                  positions=True)


def test_add_disjoint_equals_full_build(tmp_path, corpus_small):
    """base ∪ add over disjoint keys ≡ one full build: identical dictionary
    (term, df, cf), identical global stats, identical per-KEY match hits."""
    n = corpus_small.num_rows
    base, batch = corpus_small.slice(0, n - 120), corpus_small.slice(n - 120, 120)
    inc_dir, full_dir = str(tmp_path / "inc"), str(tmp_path / "full")
    build_index(base, inc_dir, CFG)
    r = add_documents(batch, inc_dir)
    build_index(corpus_small, full_dir, CFG)
    inc, full = QueryEngine(inc_dir), QueryEngine(full_dir)
    # the synth corpus has intra-corpus dup keys: the incremental path
    # tombstones old versions (n_docs counts them), the full build dedups
    # them away — live doc count matches
    assert inc.n_docs - len(inc._deleted) == full.n_docs
    if r["report"]["n_upserts"] == 0:
        # truly disjoint keys: index CONTENT is identical (id-invariant view)
        assert _dictionary(inc_dir) == _dictionary(full_dir)
        assert (inc.n_docs, inc.sum_dl) == (full.n_docs, full.sum_dl)
    # per-key hits identical (ids differ — compare via hydrated keys)
    for text in ["def return", "id_00007", "class for"]:
        a = inc.match(text, k=10**9)
        b = full.match(text, k=10**9)
        ka = inc.hydrate(a["doc_id"].to_numpy())
        kb = full.hydrate(b["doc_id"].to_numpy())
        keys_a = sorted(zip(ka["repo"].to_pylist(), ka["path"].to_pylist()))
        keys_b = sorted(zip(kb["repo"].to_pylist(), kb["path"].to_pylist()))
        assert keys_a == keys_b, text


def test_add_upsert_replaces_and_tombstones(tmp_path, corpus_small):
    idx = str(tmp_path / "idx")
    build_index(corpus_small, idx, CFG)
    eng0 = QueryEngine(idx)
    stats = pads.dataset(os.path.join(idx, "docs")).to_table(
        columns=["doc_id", "repo", "path"])
    old_id = int(stats["doc_id"][0].as_py())
    repo, path = stats["repo"][0].as_py(), stats["path"][0].as_py()
    batch = pa.table(
        {
            "repo": pa.array([repo, "newrepo"], pa.string()),
            "path": pa.array([path, "new/file.py"], pa.string()),
            "commit": pa.array(["c1", "c2"], pa.string()),
            "lang": pa.array(["py", "py"], pa.string()),
            "content": pa.array(
                ["zzzupsert fresh content here", "zzzbrandnew other doc"],
                pa.string(),
            ),
        }
    )
    r = add_documents(batch, idx)
    assert r["report"]["n_added"] == 2
    assert r["report"]["n_upserts"] == 1
    eng = QueryEngine(idx)
    hit = eng.match("zzzupsert", k=5)
    assert hit.num_rows == 1
    new_id = int(hit["doc_id"][0].as_py())
    assert new_id >= eng0.n_docs  # appended id space
    h = eng.hydrate([old_id, new_id])
    assert h["doc_id"].to_pylist() == [new_id]  # old version tombstoned
    assert (h["repo"][0].as_py(), h["path"][0].as_py()) == (repo, path)


def test_add_generations_stack_and_old_parts_reclaimed(tmp_path, corpus_small):
    idx = str(tmp_path / "idx")
    base = corpus_small.slice(0, 200)
    build_index(base, idx, CFG)
    add_documents(corpus_small.slice(200, 100), idx)
    add_documents(corpus_small.slice(300, 100), idx)
    eng = QueryEngine(idx)
    assert eng._parts == "parts-g2"
    assert not os.path.isdir(os.path.join(idx, "parts"))
    assert not os.path.isdir(os.path.join(idx, "parts-g1"))
    # phrase + wand still rank-identical after two generations
    w = eng.match_wand("def return", k=20)
    m = eng.match("def return", k=20)
    assert w["doc_id"].to_pylist() == m["doc_id"].to_pylist()
    assert eng.match_phrase("return def", k=5).num_rows > 0


def test_add_crash_before_manifest_flip_leaves_old_index(tmp_path, corpus_small,
                                                         monkeypatch):
    idx = str(tmp_path / "idx")
    base = corpus_small.slice(0, 250)
    build_index(base, idx, CFG)
    before = QueryEngine(idx).match("def return", k=10)

    import librecatastro_ray.pipelines.build as build_mod

    def boom(*a, **k):
        raise RuntimeError("simulated crash before manifest flip")

    monkeypatch.setattr(build_mod, "save_manifest", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        add_documents(corpus_small.slice(250, 100), idx)
    monkeypatch.undo()
    # old index fully readable, results unchanged
    after_crash = QueryEngine(idx).match("def return", k=10)
    assert before.equals(after_crash)
    # rerunning the add succeeds and lands the new docs
    r = add_documents(corpus_small.slice(250, 100), idx)
    assert r["report"]["n_added"] > 0
    assert QueryEngine(idx).n_docs == 250 + r["report"]["n_added"]


def test_compact_reclaims_tombstones_bit_identical(tmp_path, corpus_small):
    """delete + add + compact ≡ one fresh build over the live rows: same
    partition output hashes, same stats, bitwise-equal query results."""
    import pyarrow as pa

    from librecatastro_ray.pipelines.build import compact_index
    from librecatastro_ray.state.manifest import delete_docs, load_deleted

    idx = str(tmp_path / "idx")
    build_index(corpus_small, idx, CFG)
    eng = QueryEngine(idx)
    victims = eng.match("id_00012", k=3)["doc_id"].to_numpy()
    assert len(victims)
    delete_docs(idx, victims)
    tgt = str(tmp_path / "compacted")
    with pytest.raises(ValueError, match="distinct target"):
        compact_index(idx, idx)
    compact_index(idx, tgt)
    assert len(load_deleted(tgt)) == 0
    ceng = QueryEngine(tgt)
    assert ceng.n_docs == eng.n_docs - len(victims)
    # independent reference: fresh build over the live rows of the source
    stats = pads.dataset(os.path.join(idx, "docs")).to_table(
        columns=["doc_id", "repo", "path", "commit", "lang", "content"])
    keep = ~np.isin(stats["doc_id"].to_numpy(), victims)
    ref_corpus = stats.filter(pa.array(keep)).drop_columns(["doc_id"])
    ref = str(tmp_path / "ref")
    build_index(ref_corpus, ref, CFG)
    m_ref = QueryEngine(ref).match("def return", k=10**9)
    m_cmp = ceng.match("def return", k=10**9)
    assert m_ref.equals(m_cmp)  # bitwise: ids, raw scores, ranks
    from librecatastro_ray.state.manifest import load_manifest

    pa_ref = {k: v["output_sha256"] for k, v in load_manifest(ref)["partitions"].items()}
    pa_cmp = {k: v["output_sha256"] for k, v in load_manifest(tgt)["partitions"].items()}
    assert pa_ref == pa_cmp
