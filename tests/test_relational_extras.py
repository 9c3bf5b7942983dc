"""Hermetic tests for the round-2 custom operators: as-of join, hopping
windows, BPE-ish token counts, multimodal frame sampling."""

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def tiny_events_dir(tmp_path):
    ts = pa.array(
        np.array([10, 20, 30, 40, 50, 60, 15, 25], dtype="int64") * 1_000_000_000_000,
        pa.timestamp("us"),
    )  # spaced ~11.5 days apart; user 1 and user 2 interleaved
    t = pa.table(
        {
            "event_id": pa.array(range(8), pa.int64()),
            "ts": ts,
            "user_id": pa.array([1, 1, 1, 1, 2, 2, 2, 1], pa.int64()),
            "event_type": pa.array(
                ["view", "click", "view", "click", "view", "click", "click", "error"],
                pa.string(),
            ),
            "value": pa.array([1.0] * 8, pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_asof_join_events(tiny_events_dir):
    from librecatastro_ray.pipelines.relational import asof_join_events

    out = {r["event_id"]: r for r in asof_join_events(tiny_events_dir).to_pylist()}
    # user 1: click@20 ← view@10; click@40 ← view@30
    assert out[1]["view_event_id"] == 0
    assert out[3]["view_event_id"] == 2
    # user 2: click@60 ← view@50; click@15 has NO prior view (view@50 is later) → dropped
    assert out[5]["view_event_id"] == 4
    assert 6 not in out
    assert 7 not in out  # 'error' is not a click
    assert out[1]["gap_us"] == 10 * 1_000_000_000_000


def test_events_sliding_four_windows(tiny_events_dir):
    from librecatastro_ray.pipelines.relational import events_sliding

    out = events_sliding(tiny_events_dir).to_pylist()
    # every event lands in exactly 4 hopping windows → sum of n == 4 × events
    assert sum(r["n"] for r in out) == 4 * 8
    # each window_start is 15-minute aligned and covers its event
    for r in out:
        assert r["window_start"].minute % 15 == 0
        assert r["window_start"].second == 0


def test_token_counts_bpe_matches_python_re(tmp_path):
    from librecatastro_ray.pipelines.training import BPE_SPLIT_RE, token_counts_bpe

    texts = [
        "Hello, world! 123 foo_bar", "", None, "a  b   c", "!!!", "x9y8z7",
        "CamelCase and under_scores, plus 3.14 numbers",
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"),
    )
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in token_counts_bpe(str(tmp_path)).take_all()}
    pat = re.compile(BPE_SPLIT_RE)
    for i, t in enumerate(texts):
        assert got[i] == len(pat.findall((t or "").lower())), (i, t)


def test_multimodal_frames(tmp_path):
    from librecatastro_ray.pipelines.training import multimodal_frames

    texts = ["x" * 600, "", "short", "y" * (256 * 10)]  # 3 frames, 0, 1, capped 8
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"),
    )
    got = {r["doc_id"]: r for r in multimodal_frames(str(tmp_path)).take_all()}
    assert got[0]["n_frames"] == 3
    assert got[0]["first_frame_md5"] == hashlib.md5(("x" * 256).encode()).hexdigest()
    assert got[0]["last_frame_md5"] == hashlib.md5(("x" * 88).encode()).hexdigest()
    assert got[1]["n_frames"] == 0 and got[1]["first_frame_md5"] is None
    assert got[2]["n_frames"] == 1
    assert got[2]["first_frame_md5"] == got[2]["last_frame_md5"]
    assert got[3]["n_frames"] == 8  # frame cap


def test_frame_sampler_gates_real_decoder():
    from librecatastro_ray.pipelines.training import FrameSampler

    with pytest.raises(NotImplementedError):
        FrameSampler(real_decoder=True)


def test_asof_tie_break_is_deterministic(tmp_path):
    """Two prior views at the SAME timestamp: the max view_event_id wins
    (the explicit tie-break mirrored in the SQL oracle)."""
    us = 1_000_000
    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "ts": pa.array(np.array([100, 100, 200], dtype="int64") * us, pa.timestamp("us")),
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "event_type": pa.array(["view", "view", "click"], pa.string()),
            "value": pa.array([1.0] * 3, pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    from librecatastro_ray.pipelines.relational import asof_join_events

    out = asof_join_events(str(tmp_path)).to_pylist()
    assert len(out) == 1
    assert out[0]["view_event_id"] == 1  # max event_id among the ts ties


def test_scatter_sink_empty_queries(built_index, tmp_path):
    from librecatastro_ray.pipelines.query import batch_search_scatter

    index_dir, _ = built_index
    out = batch_search_scatter(index_dir, [], n_ranges=2, output_dir=str(tmp_path / "o"))
    assert out.to_pylist() == [{"rows_written": 0, "output_dir": str(tmp_path / "o")}]


def test_prefix_content_offset(built_index):
    from librecatastro_ray.pipelines.query import QueryEngine

    index_dir, _ = built_index
    eng = QueryEngine(index_dir)
    full = eng.prefix_content("de", k=10**9).to_pylist()
    page = eng.prefix_content("de", k=4, offset=2).to_pylist()
    assert [(r["rank"], r["doc_id"]) for r in page] == [
        (r["rank"], r["doc_id"]) for r in full[2:6]
    ]


def test_asof_many_users_bucketed_matches_oracle(tmp_path):
    """≥10⁴ distinct user_ids: the bucket-vectorized as-of join must (a)
    match the exact SQL oracle and (b) bound the shuffle's group count at
    n_buckets — never one group per user (the per-group-overhead cliff)."""
    import duckdb

    rng = np.random.RandomState(7)
    n, n_users, n_buckets = 60_000, 20_000, 32
    user = rng.randint(0, n_users, n).astype(np.int64)
    ts_us = rng.randint(1, 10**7, n).astype(np.int64) * 1_000_000
    kinds = np.array(["view", "click", "error"], dtype=object)[
        rng.randint(0, 3, n)
    ]
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array(user, pa.int64()),
            "event_type": pa.array(kinds, pa.string()),
            "value": pa.array(np.ones(n), pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    from librecatastro_ray.pipelines.relational import asof_join_events

    got = (
        asof_join_events(str(tmp_path), n_buckets=n_buckets)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    # the equality key cardinality the shuffle actually sees is the bucket
    assert len(np.unique(user % n_buckets)) <= n_buckets
    assert len(np.unique(user)) > 10_000  # genuinely many-key input
    assert got["user_id"].nunique() > 1_000  # and a many-key output

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    exp = (
        con.sql(entrymod.oracle_sql()["asof_join_events"])
        .df()
        .sort_values("event_id", ignore_index=True)
    )
    assert len(got) == len(exp) > 0
    for c in ("event_id", "user_id", "view_event_id", "gap_us"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_asof_no_clicks_returns_typed_empty(tmp_path):
    t = pa.table(
        {
            "event_id": pa.array([0, 1], pa.int64()),
            "ts": pa.array(np.array([1, 2], dtype="int64") * 10**12, pa.timestamp("us")),
            "user_id": pa.array([1, 2], pa.int64()),
            "event_type": pa.array(["error", "error"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    from librecatastro_ray.pipelines.relational import asof_join_events

    out = asof_join_events(str(tmp_path))
    assert len(out) == 0
    assert out.column_names == ["event_id", "user_id", "ts", "view_event_id", "view_ts", "gap_us"]
