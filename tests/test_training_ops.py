"""Unit tests for the training-data ops that have no SQL oracle
(minhash recall, simhash locality, fingerprint determinism, IVF recall)."""

import numpy as np
import pandas as pd
import pytest

from librecatastro_ray.pipelines.training import (
    IvfIndex,
    MinHasher,
    SimHasher,
    _char_ngrams,
)


def _jac(a, b, n=4):
    sa, sb = _char_ngrams(a.lower(), n), _char_ngrams(b.lower(), n)
    u = len(sa | sb)
    return len(sa & sb) / u if u else 0.0


def test_minhash_signature_estimates_jaccard():
    mh = MinHasher(seed=42)
    a = "the quick brown fox jumps over the lazy dog and runs far away today"
    b = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    c = "completely different content with nothing shared at all whatsoever xyz"
    sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
    est_ab = (sa == sb).mean()
    est_ac = (sa == sc).mean()
    true_ab = _jac(a, b)
    assert abs(est_ab - true_ab) < 0.25
    assert est_ac < 0.2
    # determinism
    assert (MinHasher(seed=42).signature(a) == sa).all()


def test_minhash_lsh_finds_near_duplicates():
    """LSH bands (16x4) catch pairs with jaccard ~>0.8 with near-certainty."""
    mh = MinHasher(seed=42)
    base = " ".join(f"tok{i:03d}" for i in range(100))
    near = base.replace("tok050", "tok999")  # ~high overlap
    assert _jac(base, near) > 0.8
    r = 64 // 16
    batch = pd.DataFrame({"doc_id": [0, 1], "text": [base, near]})
    bands = mh(batch)
    b0 = set(map(tuple, bands[bands.doc_id == 0][["band", "bucket"]].values))
    b1 = set(map(tuple, bands[bands.doc_id == 1][["band", "bucket"]].values))
    assert b0 & b1, "near-duplicates must share at least one LSH band bucket"


def test_simhash_locality():
    sh = SimHasher()
    base = " ".join(f"word{i:03d}" for i in range(80))
    near = base.replace("word007", "word777")
    far = " ".join(f"other{i:03d}" for i in range(80))
    h = sh(pd.DataFrame({"doc_id": [0, 1, 2], "text": [base, near, far]}))["simhash"]
    def ham(x, y):
        return bin(int(x) ^ int(y)).count("1")
    assert ham(h[0], h[1]) < ham(h[0], h[2])
    assert ham(h[0], h[1]) <= 8
    assert ham(h[0], h[2]) >= 16


def test_fingerprint_order_sensitive():
    from librecatastro_ray.functions.hashing import term_hash
    from librecatastro_ray.functions.tokenizer import tokenize

    MOD = (1 << 61) - 1
    BASE = 1_000_003

    def fp(s):
        h = 0
        for tok in tokenize(s):
            h = (h * BASE + term_hash(tok)) % MOD
        return h

    assert fp("a b c") != fp("c b a")  # order matters
    assert fp("a b c") == fp("a  b\nc")  # whitespace-insensitive
    assert fp("") == 0


def test_ivf_recall_vs_brute_force():
    """IVF with nprobe=2 of 8 cells must recover most of the exact top-10
    (deterministic data + deterministic centroids)."""
    sf = "/root/testdata/sf0.01"
    idx = IvfIndex(sf, n_cells=8)
    rng_qids = idx.vids[:5]
    recalls = []
    for qid in rng_qids:
        qpos = int(np.nonzero(idx.vids == qid)[0][0])
        q = idx.En[qpos]
        exact_cos = idx.En @ q
        exact_cos[qpos] = -np.inf
        exact_top = set(idx.vids[np.argsort(-exact_cos)[:10]].tolist())
        approx = {v for v, _ in idx.search(q, k=11, nprobe=2) if v != qid}
        recalls.append(len(exact_top & approx) / 10)
    assert np.mean(recalls) >= 0.3  # nprobe=2/8 cells on near-random vectors
    # full probe = exact
    for qid in rng_qids[:2]:
        qpos = int(np.nonzero(idx.vids == qid)[0][0])
        q = idx.En[qpos]
        exact_cos = np.round(idx.En @ q, 6)
        exact_cos[qpos] = -np.inf
        order = np.lexsort((idx.vids, -exact_cos))[:5]
        exact = [int(idx.vids[i]) for i in order]
        approx = [v for v, _ in idx.search(q, k=6, nprobe=8) if v != qid][:5]
        assert approx == exact


def test_decode_stub_gates_real_decoder():
    from librecatastro_ray.pipelines.training import DecodeStub

    with pytest.raises(NotImplementedError):
        DecodeStub(real_decoder=True)
