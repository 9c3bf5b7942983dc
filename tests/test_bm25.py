"""BM25 formula vs hand-computed values + tiny worked example
(FIXTURES.md §5: 8-doc hand-scored example)."""

import math

import numpy as np

from librecatastro_ray.functions.bm25 import idf, tf_norm, topk_indices
from librecatastro_ray.oracle import OracleIndex


def test_idf_hand():
    # N=10, df=2: ln(1 + (10-2+0.5)/(2+0.5)) = ln(1+3.4) = ln(4.4)
    assert abs(float(idf(2, 10)) - math.log(4.4)) < 1e-12


def test_tfnorm_hand():
    # tf=3, dl=4, avgdl=2, k1=1.2, b=0.75:
    # 3*2.2 / (3 + 1.2*(0.25 + 0.75*2)) = 6.6 / (3 + 1.2*1.75) = 6.6/5.1
    got = float(tf_norm(np.array([3]), np.array([4]), 2.0)[0])
    assert abs(got - 6.6 / 5.1) < 1e-12


def test_topk_tiebreak():
    scores = np.array([1.0, 2.0, 2.0, 0.5, 2.0])
    docs = np.array([10, 7, 3, 1, 5])
    sel = topk_indices(scores, docs, 3)
    # score desc, doc asc: (2.0,3), (2.0,5), (2.0,7)
    assert list(docs[sel]) == [3, 5, 7]
    assert list(scores[sel]) == [2.0, 2.0, 2.0]


def test_oracle_tiny_example():
    # 4 docs; hand-checkable
    repos = ["r"] * 4
    paths = ["a", "b", "c", "d"]
    langs = ["py"] * 4
    contents = ["cat dog", "cat cat cat", "dog", "bird"]
    idx = OracleIndex.build(repos, paths, langs, contents)
    assert idx.n_docs == 4
    assert idx.avgdl == (2 + 3 + 1 + 1) / 4.0
    res = idx.match("cat", k=10)
    assert [d for d, _ in res] == [1, 0]  # doc 'b' (tf=3) outranks 'a'
    n, avgdl = 4, 7 / 4
    w = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    s_b = w * (3 * 2.2 / (3 + 1.2 * (1 - 0.75 + 0.75 * 3 / avgdl)))
    s_a = w * (1 * 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75 * 2 / avgdl)))
    assert abs(res[0][1] - s_b) < 1e-12
    assert abs(res[1][1] - s_a) < 1e-12
    # conjunction
    res = idx.bool_must(["cat", "dog"], k=10)
    assert [d for d, _ in res] == [0]
    # count / existence
    assert idx.count("cat dog") == 3
    assert idx.count("zzz") == 0
    # prefix on analyzed field
    res = idx.prefix_content("ca", k=10)
    assert [d for d, _ in res] == [0, 1]
    assert all(s == 1.0 for _, s in res)
