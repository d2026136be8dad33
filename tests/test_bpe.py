"""BPE primitives vs a pure-python reference: pair counts, greedy merge
(overlap runs), multi-round training, partitioning invariance."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from core_ray.functions import apply_merge, pair_counts, top_pair, train_merges
from core_ray.functions.bpe import merge_values


def _py_pair_counts(rows):
    c = Counter()
    for r in rows:
        for a, b in zip(r, r[1:]):
            c[(a, b)] += 1
    return c


def _py_merge(row, first, second, new_id):
    out, i = [], 0
    while i < len(row):
        if i + 1 < len(row) and row[i] == first and row[i + 1] == second:
            out.append(new_id)
            i += 2
        else:
            out.append(row[i])
            i += 1
    return out


def _ds(rows, blocks=4, dtype=pa.int32()):
    t = pa.table({"doc": pa.array(range(len(rows)), pa.int64()),
                  "tokens": pa.array(rows, pa.list_(dtype))})
    return ray.data.from_arrow(t).repartition(blocks)


@pytest.fixture()
def corpus():
    rng = np.random.default_rng(13)
    return [rng.integers(0, 12, rng.integers(0, 30)).tolist() for _ in range(400)]


def test_pair_counts_match_python(corpus):
    got = pair_counts(_ds(corpus), "tokens").to_pandas()
    want = _py_pair_counts(corpus)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert want[(r["first"], r["second"])] == r["cnt"]
    # sorted by cnt desc with deterministic ties
    assert list(got["cnt"]) == sorted(got["cnt"], reverse=True)


def test_pair_counts_partitioning_invariant(corpus):
    a = pair_counts(_ds(corpus, blocks=1), "tokens").to_pandas()
    b = pair_counts(_ds(corpus, blocks=8), "tokens").to_pandas()
    assert a.equals(b)


def test_top_pair(corpus):
    f, s, c = top_pair(_ds(corpus), "tokens")
    want = _py_pair_counts(corpus)
    assert want[(f, s)] == c == max(want.values())


def test_merge_values_overlap_runs():
    # AAAA + (A,A): greedy gives (AA)(AA); AAA gives (AA)A
    vals = np.array([7, 7, 7, 7, 0, 7, 7, 7], dtype=np.int64)
    off = np.array([0, 4, 8], dtype=np.int64)
    nv, no = merge_values(vals, off, 7, 7, 99)
    assert nv.tolist() == [99, 99, 0, 99, 7]
    assert no.tolist() == [0, 2, 5]


def test_apply_merge_matches_python(corpus):
    out = (
        apply_merge(_ds(corpus), 3, 5, 100, "tokens")
        .to_pandas()
        .sort_values("doc")["tokens"]
        .tolist()
    )
    for got, row in zip(out, corpus):
        assert list(got) == _py_merge(row, 3, 5, 100)


def test_apply_merge_preserves_dtype(corpus):
    ds = apply_merge(_ds(corpus, dtype=pa.int32()), 3, 5, 100, "tokens")
    b = next(iter(ds.iter_batches(batch_format="pyarrow", batch_size=50)))
    assert b.schema.field("tokens").type == pa.list_(pa.int32())


def test_text_to_byte_tokens_sliced():
    from core_ray.functions import text_to_byte_tokens

    col = pa.array(["abc", "", "xy"])
    tok = text_to_byte_tokens(col.slice(1))  # sliced input: offsets rebased
    assert tok.to_pylist() == [[], [120, 121]]
    full = text_to_byte_tokens(col)
    assert full.to_pylist()[0] == [97, 98, 99]
    # large_string has int64 offsets — must decode identically, not garbage
    big = pa.array(["abc", "", "xy"], pa.large_string())
    assert text_to_byte_tokens(big).to_pylist() == full.to_pylist()
    with pytest.raises(TypeError, match="string"):
        text_to_byte_tokens(pa.array([1, 2]))


def test_train_merges_matches_python(corpus):
    merges = train_merges(_ds(corpus), n_merges=4, first_new_id=1000)
    rows = [list(r) for r in corpus]
    for f, s, nid in merges:
        want = _py_pair_counts(rows)
        best = max(want.items(), key=lambda kv: (kv[1], -kv[0][0], -kv[0][1]))
        assert (f, s) == best[0] and want[(f, s)] == best[1]
        rows = [_py_merge(r, f, s, nid) for r in rows]
    assert len(merges) == 4


def test_bpe_train_full_run(corpus):
    from core_ray.functions import bpe_train

    tbl, final = bpe_train(_ds(corpus), n_merges=3, first_new_id=500)
    # sequential reference: per round argmax (ties smallest pair) + merge
    rows = [list(r) for r in corpus]
    for rank in range(3):
        want = _py_pair_counts(rows)
        (f, s), c = max(want.items(), key=lambda kv: (kv[1], -kv[0][0], -kv[0][1]))
        got = {k: tbl[k][rank].as_py() for k in tbl.column_names}
        assert got == {"rank": rank, "first": f, "second": s,
                       "new_id": 500 + rank, "cnt": c}
        rows = [_py_merge(r, f, s, 500 + rank) for r in rows]
    # the returned corpus has every merge applied
    out = final.to_pandas().sort_values("doc")["tokens"].tolist()
    assert [list(r) for r in out] == rows


def test_bpe_train_exhausts_gracefully():
    # corpus with exactly one mergeable pair type -> stops after 1 round
    tbl, final = bpe_train_short()
    assert tbl.num_rows == 1
    assert list(final.to_pandas()["tokens"].tolist()[0]) == [900]


def bpe_train_short():
    from core_ray.functions import bpe_train

    return bpe_train(_ds([[1, 2]], blocks=1), n_merges=5, first_new_id=900)
