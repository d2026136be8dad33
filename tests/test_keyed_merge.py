"""Conditional keyed MERGE arms (reference SparkDeltaMergeDestination
delta_merge.py:30-39,215-270): arm-by-arm semantics incl. conditional
update-if-changed, conditional delete, insert filters and by-source arms."""

import pandas as pd
import pytest
import ray.data

from core_ray.state.keyed_merge import (
    KeyedMergeDestination,
    MergeCondition,
    MergeConditionValues,
)


def _src(rows):
    return ray.data.from_pandas(pd.DataFrame(rows))


@pytest.fixture()
def dest(tmp_path):
    return KeyedMergeDestination(str(tmp_path / "merged"), key_cols=["id"], num_buckets=4)


def _seed(dest):
    stats = dest.merge(
        _src([{"id": 1, "v": 10.0, "s": "a"}, {"id": 2, "v": 20.0, "s": "b"},
              {"id": 3, "v": 30.0, "s": "c"}]),
        when_not_matched_insert_list=[MergeConditionValues(values="*")],
    )
    assert stats["inserted"] == 3
    return dest


def test_insert_then_unconditional_update(dest):
    _seed(dest)
    stats = dest.merge(
        _src([{"id": 2, "v": 99.0, "s": "B"}]),
        when_matched_update_list=[MergeConditionValues(values="*")],
        when_not_matched_insert_list=[MergeConditionValues(values="*")],
    )
    assert stats == {"updated": 1, "deleted": 0, "inserted": 0,
                     "bs_updated": 0, "bs_deleted": 0}
    df = dest.read().sort_values("id")
    assert df[df["id"] == 2]["v"].iloc[0] == 99.0


def test_conditional_update_if_changed(dest):
    _seed(dest)
    stats = dest.merge(
        _src([{"id": 1, "v": 10.0, "s": "a"}, {"id": 2, "v": 21.0, "s": "b"}]),
        when_matched_update_list=[
            MergeConditionValues(
                condition="source.v != target.v",
                values={"v": "source.v", "s": "source.s"},
            )
        ],
    )
    # id=1 unchanged -> clause condition false -> no update counted
    assert stats["updated"] == 1
    df = dest.read().sort_values("id")
    assert df["v"].tolist() == [10.0, 21.0, 30.0]


def test_conditional_delete_arm(dest):
    _seed(dest)
    stats = dest.merge(
        _src([{"id": 1, "v": -1.0, "s": "x"}, {"id": 3, "v": 5.0, "s": "y"}]),
        when_matched_delete_list=[MergeCondition(condition="source.v < 0")],
    )
    assert stats["deleted"] == 1
    assert dest.read()["id"].tolist() == [2, 3]


def test_clause_order_first_match_wins(dest):
    _seed(dest)
    stats = dest.merge(
        _src([{"id": 2, "v": 200.0, "s": "hot"}]),
        when_matched_update_list=[
            MergeConditionValues(condition="source.v > 100", values={"v": "source.v", "s": "'capped'"}),
            MergeConditionValues(values="*"),  # would apply otherwise
        ],
    )
    assert stats["updated"] == 1
    assert dest.read().set_index("id").loc[2, "s"] == "capped"


def test_insert_condition_filters(dest):
    _seed(dest)
    stats = dest.merge(
        _src([{"id": 8, "v": 1.0, "s": "n"}, {"id": 9, "v": -1.0, "s": "n"}]),
        when_not_matched_insert_list=[
            MergeConditionValues(condition="source.v >= 0", values="*")
        ],
    )
    assert stats["inserted"] == 1
    assert 9 not in dest.read()["id"].tolist()


def test_by_source_update_and_delete(dest):
    _seed(dest)
    stats = dest.merge(
        _src([{"id": 1, "v": 10.0, "s": "a"}]),
        when_matched_update_list=[MergeConditionValues(values="*")],
        when_not_matched_by_source_update_list=[
            MergeConditionValues(condition="target.v < 25", values={"s": "'stale'"})
        ],
        when_not_matched_by_source_delete_list=[
            MergeCondition(condition="target.v >= 25")
        ],
    )
    assert stats["bs_updated"] == 1  # id=2 marked stale
    assert stats["bs_deleted"] == 1  # id=3 removed
    df = dest.read().sort_values("id")
    assert df["id"].tolist() == [1, 2]
    assert df.set_index("id").loc[2, "s"] == "stale"
    assert df.set_index("id").loc[2, "v"] == 20.0  # untouched columns kept


def test_idempotent_replay_upsert(dest):
    _seed(dest)
    batch = _src([{"id": 2, "v": 77.0, "s": "z"}, {"id": 4, "v": 40.0, "s": "d"}])
    for _ in range(2):  # same CDC batch applied twice -> same final state
        dest.merge(
            batch,
            when_matched_update_list=[MergeConditionValues(values="*")],
            when_not_matched_insert_list=[MergeConditionValues(values="*")],
        )
    df = dest.read().sort_values("id")
    assert df["id"].tolist() == [1, 2, 3, 4]
    assert df.set_index("id").loc[2, "v"] == 77.0
