"""TextRank: exact-int PageRank over the word-adjacency graph."""

import numpy as np
import pyarrow as pa
import ray

from core_ray.functions import textrank


def _ds(texts):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    )


def _hand_pagerank(edges, iters=5):
    """Arbitrary-precision replay of the published update on a tiny graph."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {w: i for i, w in enumerate(nodes)}
    outdeg = {w: 0 for w in nodes}
    for u, _ in edges:
        outdeg[u] += 1
    ranks = {w: 10**9 for w in nodes}
    for _ in range(iters):
        acc = {w: 0 for w in nodes}
        for u, v in edges:
            acc[v] += ranks[u] // outdeg[u]  # Python int: no overflow possible
        ranks = {w: 150_000_000 + (85 * acc[w]) // 100 for w in nodes}
    return nodes, ranks, idx


def test_textrank_hand_case(ray_session):
    # "a b a c" + "b a": edges a->b, b->a, a->c (distinct), outdeg a=2 b=1 c=0
    out = textrank(_ds(["a b a c", "b a"]), iters=5, k=10).to_pandas()
    nodes, ranks, _ = _hand_pagerank([("a", "b"), ("b", "a"), ("a", "c")])
    exp = sorted(((w, ranks[w]) for w in nodes), key=lambda t: (-t[1], t[0]))
    assert list(map(tuple, out.itertuples(index=False))) == exp
    # a receives b's full rank; b and c each get half of a's: a > b == c
    r = dict(zip(out["word"], out["rank"]))
    assert r["a"] > r["b"] == r["c"]


def test_textrank_duplicate_edges_collapse(ray_session):
    # the same adjacent pair in many docs is ONE edge (distinct graph)
    once = textrank(_ds(["x y"]), iters=3, k=10).to_pandas()
    many = textrank(_ds(["x y"] * 7 + ["x  y", "X Y"]), iters=3, k=10).to_pandas()
    assert once.equals(many)


def test_textrank_empty_and_single_word(ray_session):
    out = textrank(_ds(["", "solo", "  "]), iters=5, k=10)
    assert out.count() == 0  # no adjacent pair anywhere -> empty graph
    assert out.schema().names == ["word", "rank"]


def test_textrank_partition_invariance(ray_session):
    texts = [f"w{i % 7} w{(i + 3) % 7} w{i % 5}" for i in range(200)]
    a = textrank(_ds(texts), iters=5, k=50).to_pandas()
    b = textrank(_ds(texts).repartition(13), iters=5, k=50).to_pandas()
    assert a.equals(b)


def test_textrank_matches_bigint_replay(ray_session):
    # int64 engine arithmetic == arbitrary-precision replay (no overflow,
    # no float drift) on a graph with hubs and dangling sinks
    rng = np.random.default_rng(7)
    texts = [
        " ".join(rng.choice([f"t{j}" for j in range(40)], size=30))
        for _ in range(60)
    ]
    out = textrank(_ds(texts), iters=5, k=1000).to_pandas()
    edges = set()
    for t in texts:
        ws = t.lower().split()
        edges |= set(zip(ws[:-1], ws[1:]))
    nodes, ranks, _ = _hand_pagerank(sorted(edges))
    exp = dict(ranks)
    got = dict(zip(out["word"], out["rank"]))
    assert got == {w: exp[w] for w in got} and len(got) == len(exp)
