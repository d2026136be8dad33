"""ML feature-prep transformers (reference
``transformers/spark/machine_learning/*`` — SURVEY.md §2.4): numpy column ops
in ``map_batches`` instead of Spark MLlib."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def columns_to_vector(
    ds: ray.data.Dataset, columns: list[str], output: str = "features"
) -> ray.data.Dataset:
    """Assemble numeric columns into one list<double> vector column
    (reference ``ColumnsToVector`` = VectorAssembler)."""

    def fn(batch: pa.Table) -> pa.Table:
        mat = np.stack(
            [batch[c].to_numpy(zero_copy_only=False).astype(np.float64) for c in columns],
            axis=1,
        )
        vec = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float64()), len(columns)
        )
        return batch.append_column(output, vec)

    return ds.map_batches(fn, batch_format="pyarrow")


def one_hot_encoding(
    ds: ray.data.Dataset, column: str, categories: list[str] | None = None
) -> ray.data.Dataset:
    """One-hot a categorical column into 0/1 columns ``{column}_{cat}``
    (reference ``OneHotEncoding``).  ``categories=None`` computes the distinct
    set up front with a small aggregate (broadcast to every batch)."""
    if categories is None:
        categories = sorted(
            r[column] for r in ds.unique(column) if isinstance(r, dict)
        ) or sorted(ds.unique(column))

    cats = list(categories)

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[column].to_numpy(zero_copy_only=False)
        for c in cats:
            # int32 indicator matches the SQL CAST(x AS INTEGER) oracle dtype
            batch = batch.append_column(
                f"{column}_{c}", pa.array((col == c).astype(np.int32))
            )
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


def polynomial_features(
    ds: ray.data.Dataset, columns: list[str], degree: int = 2
) -> ray.data.Dataset:
    """Append pairwise products / powers up to ``degree`` (reference
    ``PolynomialFeatures``). Degree 2: x_i*x_j for i<=j."""
    if degree != 2:
        raise NotImplementedError("only degree=2 is supported")

    def fn(batch: pa.Table) -> pa.Table:
        arrs = {
            c: batch[c].to_numpy(zero_copy_only=False).astype(np.float64) for c in columns
        }
        for i, a in enumerate(columns):
            for b in columns[i:]:
                batch = batch.append_column(
                    f"{a}_x_{b}", pa.array(arrs[a] * arrs[b])
                )
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")
