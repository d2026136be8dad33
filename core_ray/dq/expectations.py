"""Native declarative data-quality expectations (the engine's analog of the
reference's Great Expectations wrapper,
``pipelines/data_quality/monitoring/spark/great_expectations_data_quality.py:32-240``).

The reference delegates to the third-party GE library (build expectation
configs by type-name string + kwargs, add to a suite, validate, return a
checkpoint result).  This engine implements the same surface natively —
expectation-type names and ``mostly`` semantics follow GE's public contract —
as vectorized Arrow kernels with a distributed two-phase shape:

- row-level expectations (not-null / between / in-set / regex) reduce each
  batch to a tiny partial (element_count, unexpected_count) — ONE pass over
  the data for the whole suite, nothing but per-expectation counters moves;
- aggregate expectations (mean-between, row-count-between) ride the same
  partials (sum + count);
- uniqueness is the only expectation that genuinely needs a shuffle: a
  ``groupby(column).count()`` marks duplicated values (unexpected = rows
  whose value occurs more than once).

``validate`` returns one row per expectation:
(expectation_type, column, element_count, unexpected_count, success) with
``success = (1 - unexpected/element) >= mostly`` (GE semantics; mostly
defaults to 1.0).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

ROW_LEVEL = {
    "expect_column_values_to_not_be_null",
    "expect_column_values_to_be_between",
    "expect_column_values_to_be_in_set",
    "expect_column_values_to_match_regex",
}
AGGREGATE = {
    "expect_column_mean_to_be_between",
    "expect_table_row_count_to_be_between",
}
SHUFFLE = {"expect_column_values_to_be_unique"}
SUPPORTED = ROW_LEVEL | AGGREGATE | SHUFFLE


@dataclass
class Expectation:
    expectation_type: str
    kwargs: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.expectation_type not in SUPPORTED:
            raise ValueError(
                f"unsupported expectation {self.expectation_type!r}; "
                f"supported: {sorted(SUPPORTED)}"
            )


@dataclass
class ExpectationSuite:
    """Named collection of expectations (reference ``create_expectations`` /
    ``build_expectations`` / ``add_expectations``)."""

    expectation_suite_name: str
    expectations: list[Expectation] = field(default_factory=list)

    def add_expectation(self, expectation_type: str, **kwargs) -> "ExpectationSuite":
        self.expectations.append(Expectation(expectation_type, kwargs))
        return self


def _unexpected_mask(batch: pa.Table, exp: Expectation) -> tuple[int, int]:
    """(element_count, unexpected_count) for one row-level expectation."""
    kw = exp.kwargs
    col = batch[kw["column"]]
    t = exp.expectation_type
    if t == "expect_column_values_to_not_be_null":
        return len(col), col.null_count
    # GE row-level semantics: nulls are excluded from the element count of
    # value-based expectations
    valid = len(col) - col.null_count
    if t == "expect_column_values_to_be_between":
        ok = pa.array(np.ones(len(col), dtype=bool))
        if kw.get("min_value") is not None:
            ok = pc.and_kleene(ok, pc.greater_equal(col, kw["min_value"]))
        if kw.get("max_value") is not None:
            ok = pc.and_kleene(ok, pc.less_equal(col, kw["max_value"]))
    elif t == "expect_column_values_to_be_in_set":
        ok = pc.is_in(col, value_set=pa.array(kw["value_set"]))
    elif t == "expect_column_values_to_match_regex":
        ok = pc.match_substring_regex(col, kw["regex"])
    else:  # pragma: no cover
        raise AssertionError(t)
    bad = valid - pc.sum(pc.cast(ok, pa.int64())).as_py() if valid else 0
    return valid, int(bad)


def validate(ds: ray.data.Dataset, suite: ExpectationSuite) -> pd.DataFrame:
    """Evaluate the suite against the Dataset; one result row per
    expectation, in suite order."""
    exps = suite.expectations
    row_idx = [i for i, e in enumerate(exps) if e.expectation_type in ROW_LEVEL]
    mean_idx = [
        i for i, e in enumerate(exps)
        if e.expectation_type == "expect_column_mean_to_be_between"
    ]
    count_idx = [
        i for i, e in enumerate(exps)
        if e.expectation_type == "expect_table_row_count_to_be_between"
    ]
    uniq_idx = [i for i, e in enumerate(exps) if e.expectation_type in SHUFFLE]

    def partial(batch: pa.Table) -> pa.Table:
        idx, elem, bad, s = [], [], [], []
        for i in row_idx:
            n, b = _unexpected_mask(batch, exps[i])
            idx.append(i); elem.append(n); bad.append(b); s.append(0.0)
        for i in mean_idx:
            col = batch[exps[i].kwargs["column"]]
            n = len(col) - col.null_count
            total = pc.sum(col).as_py() or 0.0
            idx.append(i); elem.append(n); bad.append(0); s.append(float(total))
        for i in count_idx:
            idx.append(i); elem.append(len(batch)); bad.append(0); s.append(0.0)
        return pa.table(
            {
                "idx": pa.array(idx, pa.int64()),
                "elem": pa.array(elem, pa.int64()),
                "bad": pa.array(bad, pa.int64()),
                "sum": pa.array(s, pa.float64()),
            }
        )

    rows: dict[int, dict] = {}
    if row_idx or mean_idx or count_idx:
        agg = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("idx")
            .aggregate(
                ray.data.aggregate.Sum("elem", alias_name="elem"),
                ray.data.aggregate.Sum("bad", alias_name="bad"),
                ray.data.aggregate.Sum("sum", alias_name="sum"),
            )
            .to_pandas()  # bounded: per-column aggregate
        )
        for _, r in agg.iterrows():
            rows[int(r["idx"])] = {
                "elem": int(r["elem"]),
                "bad": int(r["bad"]),
                "sum": float(r["sum"]),
            }
    for i in uniq_idx:
        column = exps[i].kwargs["column"]
        # GE semantics: nulls are excluded from uniqueness — and Ray's
        # sort-based groupby cannot order null keys anyway
        import pyarrow.compute as _pc

        nn = ds.map_batches(
            lambda t, c=column: t.filter(_pc.is_valid(t[c])),
            batch_format="pyarrow",
        )
        counts = nn.groupby(column).count().to_pandas()  # bounded: distinct-value counts
        dup_rows = int(counts.loc[counts["count()"] > 1, "count()"].sum())
        rows[i] = {"elem": int(counts["count()"].sum()), "bad": dup_rows, "sum": 0.0}

    out = []
    for i, e in enumerate(exps):
        r = rows.get(i, {"elem": 0, "bad": 0, "sum": 0.0})
        mostly = float(e.kwargs.get("mostly", 1.0))
        t = e.expectation_type
        if t == "expect_column_mean_to_be_between":
            observed = r["sum"] / r["elem"] if r["elem"] else 0.0
            success = (
                (e.kwargs.get("min_value") is None or observed >= e.kwargs["min_value"])
                and (e.kwargs.get("max_value") is None or observed <= e.kwargs["max_value"])
            )
            unexpected = 0
        elif t == "expect_table_row_count_to_be_between":
            observed = r["elem"]
            success = (
                (e.kwargs.get("min_value") is None or observed >= e.kwargs["min_value"])
                and (e.kwargs.get("max_value") is None or observed <= e.kwargs["max_value"])
            )
            unexpected = 0
        else:
            unexpected = r["bad"]
            frac_ok = 1.0 - (unexpected / r["elem"]) if r["elem"] else 1.0
            success = frac_ok >= mostly
        out.append(
            {
                "expectation_type": t,
                "column": e.kwargs.get("column", ""),
                "element_count": int(r["elem"]),
                "unexpected_count": int(unexpected),
                "success": bool(success),
            }
        )
    return pd.DataFrame(out)


__all__ = ["Expectation", "ExpectationSuite", "validate", "SUPPORTED"]
