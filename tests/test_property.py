"""Property-based and randomized-conformance tests: vectorized kernels vs
their obviously-correct scalar counterparts, and a randomized query sweep
against the pure-Python oracle."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from librecatastro_ray.functions.bm25 import topk_indices


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=0, max_size=200),
    st.integers(min_value=0, max_value=50),
)
def test_topk_indices_matches_naive_lexsort(scores, k):
    scores = np.asarray(scores, dtype=np.float64)
    doc_ids = np.arange(len(scores), dtype=np.int64)[::-1].copy()  # non-trivial ids
    got = topk_indices(scores, doc_ids, k)
    order = np.lexsort((doc_ids, -scores))[: min(k, len(scores))]
    assert list(got) == list(order)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=60), st.text(max_size=60))
def test_gram_set_np_matches_char_ngrams(a, b):
    from librecatastro_ray.pipelines.training import _char_ngrams, _gram_set_np

    for n in (3, 4):
        sa_np, sb_np = _gram_set_np(a, n), _gram_set_np(b, n)
        sa, sb = _char_ngrams(a, n), _char_ngrams(b, n)
        assert len(sa_np) == len(sa)
        inter = np.intersect1d(sa_np, sb_np, assume_unique=True).size
        assert inter == len(sa & sb), (a, b, n)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(max_codepoint=0x2FFF), max_size=120))
def test_fingerprint_property(text):
    import pyarrow as pa

    from librecatastro_ray.functions.hashing import term_hash
    from librecatastro_ray.functions.tokenizer import tokenize
    from librecatastro_ray.pipelines.training import _fingerprint_batch

    MOD = (1 << 61) - 1
    BASE = 1_000_003
    h = 0
    for tok in tokenize(text):
        h = (h * BASE + term_hash(tok)) % MOD
    got = _fingerprint_batch(pa.array([text], pa.string()))
    assert int(got[0]) == h


@settings(max_examples=150, deadline=None)
@given(st.text(min_size=1, max_size=30, alphabet=st.characters(min_codepoint=1, max_codepoint=0x10FFFF)))
def test_prefix_upper_bound_property(value):
    from librecatastro_ray.pipelines.query import _prefix_upper_bound

    ub = _prefix_upper_bound(value)
    if ub is None:
        assert all(ord(c) >= 0x10FFFF for c in value)
        return
    assert value < ub
    # every string with this prefix sorts below the bound
    for suffix in ("", "a", "￿", "zzz"):
        assert value + suffix < ub


def test_randomized_query_conformance(engine_and_oracle):
    """50 random match / bool queries: engine vs the pure-Python oracle,
    rank- and score-identical."""
    engine, oracle = engine_and_oracle
    rng = np.random.RandomState(99)
    vocab = sorted(oracle.postings)[:60]
    for i in range(50):
        nt = 1 + rng.randint(3)
        terms = [vocab[rng.randint(len(vocab))] for _ in range(nt)]
        k = int(1 + rng.randint(15))
        if i % 3 == 0:
            got = engine.match(" ".join(terms), k).to_pylist()
            exp = oracle.match(" ".join(terms), k)
        else:
            got = engine.bool_must(list(dict.fromkeys(terms)), k).to_pylist()
            exp = oracle.bool_must(list(dict.fromkeys(terms)), k)
        assert [r["doc_id"] for r in got] == [d for d, _ in exp], (i, terms)
        for row, (_, s) in zip(got, exp):
            assert abs(row["score"] - s) < 1e-9, (i, terms)


@pytest.fixture(scope="module")
def engine_and_oracle(built_index, oracle_small):
    from librecatastro_ray.pipelines.query import QueryEngine

    index_dir, _ = built_index
    return QueryEngine(index_dir), oracle_small


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=64))
def test_popcount64_matches_int_bit_count(xs):
    from librecatastro_ray.pipelines.training import _popcount64

    arr = np.array(xs, dtype=np.uint64)
    got = _popcount64(arr)
    assert got.tolist() == [int(x).bit_count() for x in xs]


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0),
)
def test_ppm_roundtrip_property(w, h, seed):
    from librecatastro_ray.pipelines.multimodal import decode_ppm, encode_ppm

    rng = np.random.RandomState(seed % 2**31)
    rgb = rng.randint(0, 256, size=w * h * 3).astype(np.uint8)
    w2, h2, arr = decode_ppm(encode_ppm(w, h, rgb))
    assert (w2, h2) == (w, h)
    assert (arr.reshape(-1) == rgb).all()


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=192000),
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=400),
)
def test_wav_roundtrip_property(rate, samples):
    from librecatastro_ray.pipelines.multimodal import decode_wav, encode_wav

    s = np.array(samples, dtype=np.int16)
    rate2, s2 = decode_wav(encode_wav(rate, s))
    assert rate2 == rate
    assert s2.tolist() == samples


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**62),
    st.integers(min_value=1, max_value=6),
    st.sets(st.integers(min_value=0, max_value=62), max_size=6),
)
def test_simhash_banding_pigeonhole_property(sig, radius, flips):
    """Any signature pair within Hamming distance `radius` shares >=1 band;
    beyond radius the property is allowed (not required) to fail."""
    import pyarrow as pa

    from librecatastro_ray.pipelines.training import _simhash_bands

    mate = sig
    for f in flips:
        mate ^= 1 << f
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "simhash": pa.array([sig, mate], pa.int64())})
    b = _simhash_bands(t, radius).to_pandas()
    shared = set(map(tuple, b[b.doc_id == 0][["band", "bucket"]].values)) & \
        set(map(tuple, b[b.doc_id == 1][["band", "bucket"]].values))
    if len(flips) <= radius:
        assert shared, (sig, radius, flips)


@settings(max_examples=12, deadline=None)
@given(st.integers(min_value=1, max_value=9))
def test_search_after_walk_is_a_partition_of_the_ranking(engine_and_oracle, k):
    """Cursor-paging invariant: walking pages of ANY size k via
    match_search_after visits the full ranking exactly once, in order —
    no document skipped, none repeated, regardless of score ties at page
    boundaries."""
    engine, _ = engine_and_oracle
    full = [r["doc_id"] for r in engine.match("def return", k=10**9).to_pylist()]
    walked: list[int] = []
    cursor = None
    for _ in range(len(full) + 2):  # bounded: must terminate
        page = engine.match_search_after("def return", k=k, after=cursor).to_pylist()
        if not page:
            break
        walked.extend(r["doc_id"] for r in page)
        cursor = (page[-1]["score"], page[-1]["doc_id"])
    assert walked == full
