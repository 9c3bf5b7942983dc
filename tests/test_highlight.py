"""ES ``highlight`` (plain-highlighter analogue: re-analyze the fetched
field, wrap matches, window around the first hit).  The reference's UI layer
renders fetched _source fields (reference: src/librecatastro/domain/
cadaster_entry.py:46-77); highlight is the ES-side twin of that fetch."""

import numpy as np
import pytest

from librecatastro_ray.pipelines.query import QueryEngine


@pytest.fixture(scope="module")
def engine(built_index):
    index_dir, _ = built_index
    return QueryEngine(index_dir)


def test_highlight_wraps_all_terms_in_window(engine):
    res = engine.match("def return", k=5)
    ids = res["doc_id"].to_numpy()
    h = engine.highlight(ids, "def return", window=60)
    assert h["doc_id"].to_pylist() == ids.tolist()
    for snip in h["snippet"].to_pylist():
        assert snip is not None
        assert "<em>" in snip and "</em>" in snip
        inner = [s.split("</em>")[0] for s in snip.split("<em>")[1:]]
        assert all(t.lower() in ("def", "return") for t in inner)
        # window bound: tags excluded, snippet body stays near the window
        body = snip.replace("<em>", "").replace("</em>", "").strip("…")
        assert len(body) <= 60 + len("return")


def _engine_over(content: str):
    """A QueryEngine shell whose doc store is one in-memory document —
    exercises the REAL highlight logic against pinned strings."""
    import re

    import pyarrow as pa

    class _FakeAnalyzer:
        analyzer_id = "code_standard_v1"

        @staticmethod
        def tokenize(s):
            return re.findall(r"[a-z0-9_]+", s.lower())

    fake_tbl = pa.table(
        {"doc_id": pa.array([0], pa.int64()),
         "content": pa.array([content], pa.string())}
    )

    class _DS:
        @staticmethod
        def to_table(columns=None, filter=None):
            return fake_tbl

    eng = QueryEngine.__new__(QueryEngine)
    eng.analyzer = _FakeAnalyzer()
    eng._docstats_ds = lambda: _DS()
    return eng


def test_highlight_exact_snippet_rule():
    """Pin the deterministic rule: first match centered, every in-window
    occurrence wrapped, ellipsis only at cut edges."""
    eng = _engine_over("aa def bb def cc " + "x" * 100)
    h = QueryEngine.highlight(eng, [0], "def", window=20)
    # first match at chars [3,6), window 20 → half 8 → span [0,14): both defs
    # wrapped, cut mid-" cc" → trailing ellipsis
    assert h["snippet"].to_pylist()[0] == "aa <em>def</em> bb <em>def</em> …"


def test_highlight_phrase_only_wraps_full_phrase():
    eng = _engine_over("def alone here, then def return wins")
    h = QueryEngine.highlight(eng, [0], "def return", window=30, phrase=True)
    snip = h["snippet"].to_pylist()[0]
    # only the consecutive occurrence is wrapped — the lone 'def' is not
    assert "<em>def return</em>" in snip
    assert snip.count("<em>") == 1


def test_highlight_no_match_is_null(engine):
    h = engine.highlight([0, 1], "zzznotaterm", window=40)
    assert h["snippet"].to_pylist() == [None, None]
