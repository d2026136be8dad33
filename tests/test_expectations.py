"""Native expectations suite (the GE-wrapper analog): GE `mostly` semantics,
null handling, uniqueness via shuffle, aggregate expectations."""

import pandas as pd
import pytest

import ray.data


def _ds():
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "v": [1.0, 2.0, None, 50.0, 200.0],
                "cat": ["a", "b", "a", "z", "a"],
                "id": [1, 2, 3, 3, 4],
            }
        )
    )


def test_expectations_semantics():
    from core_ray.dq.expectations import ExpectationSuite, validate

    suite = (
        ExpectationSuite("t")
        .add_expectation("expect_column_values_to_not_be_null", column="v")
        .add_expectation(
            "expect_column_values_to_be_between",
            column="v", min_value=0.0, max_value=100.0, mostly=0.75,
        )
        .add_expectation(
            "expect_column_values_to_be_in_set",
            column="cat", value_set=["a", "b"], mostly=0.8,
        )
        .add_expectation(
            "expect_column_values_to_match_regex", column="cat", regex="^[a-z]$"
        )
        .add_expectation("expect_column_values_to_be_unique", column="id")
        .add_expectation(
            "expect_column_mean_to_be_between", column="v",
            min_value=60.0, max_value=70.0,
        )
        .add_expectation(
            "expect_table_row_count_to_be_between", min_value=5, max_value=5
        )
    )
    out = validate(_ds(), suite)
    by = {r["expectation_type"]: r for _, r in out.iterrows()}

    r = by["expect_column_values_to_not_be_null"]
    assert (r["element_count"], r["unexpected_count"], r["success"]) == (5, 1, False)
    # nulls excluded; 200.0 out of range -> 1/4 unexpected, mostly 0.75 passes
    r = by["expect_column_values_to_be_between"]
    assert (r["element_count"], r["unexpected_count"], r["success"]) == (4, 1, True)
    # 'z' not in set -> 1/5, mostly 0.8 passes exactly
    r = by["expect_column_values_to_be_in_set"]
    assert (r["element_count"], r["unexpected_count"], r["success"]) == (5, 1, True)
    assert by["expect_column_values_to_match_regex"]["success"]
    # id 3 occurs twice -> 2 unexpected rows
    r = by["expect_column_values_to_be_unique"]
    assert (r["element_count"], r["unexpected_count"], r["success"]) == (5, 2, False)
    # mean of [1,2,50,200] = 63.25
    assert by["expect_column_mean_to_be_between"]["success"]
    assert by["expect_table_row_count_to_be_between"]["success"]


def test_unknown_expectation_rejected():
    from core_ray.dq.expectations import ExpectationSuite

    with pytest.raises(ValueError, match="unsupported expectation"):
        ExpectationSuite("t").add_expectation("expect_nonsense", column="v")


def test_unique_expectation_ignores_nulls():
    """GE semantics: nulls are not uniqueness violations — and must not
    crash the groupby."""
    import ray.data

    from core_ray.dq.expectations import ExpectationSuite, validate

    ds = ray.data.from_items(
        [{"k": "a"}, {"k": None}, {"k": "b"}, {"k": None}, {"k": "a"}]
    )
    suite = ExpectationSuite("nulls").add_expectation(
        "expect_column_values_to_be_unique", column="k"
    )
    out = validate(ds, suite)
    r = out.iloc[0]
    assert not bool(r["success"])  # 'a' duplicates
    assert int(r["element_count"]) == 3  # nulls excluded
