"""Document deletion lifecycle (ES DELETE by id / _delete_by_query;
reference: the delete-ignoring-404 index lifecycle, elasticsearch_utils.py:
85-98).  Lucene-faithful semantics: tombstoned docs vanish from every result
immediately; N / avgdl / df keep counting them until a rebuild — so every
surviving doc's SCORE is unchanged, only ranks close up."""

import numpy as np
import pytest

from librecatastro_ray.config import IndexConfig
from librecatastro_ray.pipelines.build import build_index
from librecatastro_ray.pipelines.query import (
    QueryEngine,
    batch_search_scatter,
    delete_by_query,
)
from librecatastro_ray.state.manifest import delete_docs, load_deleted


@pytest.fixture(scope="module")
def del_index(tmp_path_factory, corpus_small):
    """A dedicated positional index this module may mutate."""
    index_dir = str(tmp_path_factory.mktemp("delidx") / "idx")
    cfg = IndexConfig(
        num_partitions=4, num_salts=2, hot_df_ratio=0.2, block_size=16, positions=True
    )
    build_index(corpus_small, index_dir, cfg)
    return index_dir


def _surviving(table, deleted):
    """Expected post-delete result: drop deleted rows, recompute ranks."""
    keep = [
        (d, s)
        for d, s in zip(table["doc_id"].to_pylist(), table["score"].to_pylist())
        if d not in deleted
    ]
    return keep


def test_delete_filters_all_query_paths(del_index):
    eng = QueryEngine(del_index)
    before_match = eng.match("def return", k=10**9)
    before_bool = eng.bool_must(["def"], k=10**9, must_not_terms=["zzz"])
    before_prefix = eng.prefix_content("id_000", k=10**9)
    before_phrase = eng.match_phrase("return def", k=10**9)
    before_count = eng.count("def")
    # delete the TOP match doc plus two others — exercises the θ-inflation
    # hazard in WAND (a deleted high scorer must not over-prune live docs)
    dead = {
        int(before_match["doc_id"][0].as_py()),
        int(before_match["doc_id"][3].as_py()),
        int(before_prefix["doc_id"][0].as_py()),
    }
    delete_docs(del_index, dead)
    eng2 = QueryEngine(del_index)

    for before, after in [
        (before_match, eng2.match("def return", k=10**9)),
        (before_bool, eng2.bool_must(["def"], k=10**9, must_not_terms=["zzz"])),
        (before_prefix, eng2.prefix_content("id_000", k=10**9)),
        (before_phrase, eng2.match_phrase("return def", k=10**9)),
    ]:
        want = _surviving(before, dead)
        got = list(zip(after["doc_id"].to_pylist(), after["score"].to_pylist()))
        assert got == want  # scores unchanged, deleted gone, ranks closed up
        assert after["rank"].to_pylist() == list(range(1, len(want) + 1))

    n_def_dead = sum(
        1 for d in dead if d in set(before_bool["doc_id"].to_pylist())
    )
    assert eng2.count("def") == before_count - n_def_dead
    # WAND stays rank-identical to full scoring after the delete
    w = eng2.match_wand("def return", k=25)
    m = eng2.match("def return", k=25)
    assert w["doc_id"].to_pylist() == m["doc_id"].to_pylist()
    np.testing.assert_allclose(w["score"].to_numpy(), m["score"].to_numpy(), atol=0)
    # hydrate: deleted ids return no row (ES 404)
    alive_id = int(m["doc_id"][0].as_py())
    h = eng2.hydrate(sorted(dead) + [alive_id])
    assert h["doc_id"].to_pylist() == [alive_id]
    # scatter path agrees with the single engine after deletes
    out = batch_search_scatter(
        del_index,
        [{"query_id": 0, "kind": "match", "text": "def return", "k": 12},
         {"query_id": 1, "kind": "match_phrase", "text": "return def", "k": 6},
         {"query_id": 2, "kind": "prefix_content", "prefix": "id_000", "k": 8}],
        n_ranges=4,
    )
    for qid, want_t in [
        (0, eng2.match("def return", k=12)),
        (1, eng2.match_phrase("return def", k=6)),
        (2, eng2.prefix_content("id_000", k=8)),
    ]:
        got_t = out.filter(np.array(out["query_id"].to_numpy() == qid))
        assert got_t["doc_id"].to_pylist() == want_t["doc_id"].to_pylist(), qid
        np.testing.assert_allclose(
            got_t["score"].to_numpy(), want_t["score"].to_numpy(), atol=0
        )


def test_delete_accumulates_and_is_idempotent(del_index):
    n0 = len(load_deleted(del_index))
    assert n0 >= 3  # from the previous test
    n1 = delete_docs(del_index, [10**7])  # unknown id: tombstoned harmlessly
    assert n1 == n0 + 1
    assert delete_docs(del_index, [10**7]) == n1  # idempotent


def test_delete_by_query(del_index):
    eng = QueryEngine(del_index)
    victims = eng.match_phrase("def if", k=10**9)["doc_id"].to_pylist()
    assert victims
    n_new = delete_by_query(del_index, {"kind": "match_phrase", "text": "def if"})
    assert n_new == len(victims)
    eng2 = QueryEngine(del_index)
    assert eng2.match_phrase("def if", k=10**9).num_rows == 0
    # stats are Lucene-faithful: unchanged until rebuild
    assert eng2.n_docs == eng.n_docs
    assert eng2.term_df("def") == eng.term_df("def")


def test_rebuild_clears_tombstones(tmp_path, corpus_small):
    index_dir = str(tmp_path / "idx")
    cfg = IndexConfig(num_partitions=2, num_salts=1)
    build_index(corpus_small, index_dir, cfg)
    delete_docs(index_dir, [0, 1, 2])
    assert QueryEngine(index_dir).hydrate([0]).num_rows == 0
    from librecatastro_ray.state.manifest import drop_index

    drop_index(index_dir)
    build_index(corpus_small, index_dir, cfg)
    assert len(load_deleted(index_dir)) == 0
    assert QueryEngine(index_dir).hydrate([0]).num_rows == 1
