"""Semi-structured payload extraction over string columns.

``json_field_stats`` pulls one integer field out of a JSON-string column
and folds exact int stats per group — the "typed column out of a JSON
payload" step every event pipeline has (reference keeps payloads as JSON
strings through its PCDM transformers, e.g.
``transformers/spark/opc_publisher_opcua_json_to_pcdm.py``).

The extraction is a VECTORIZED RE2 kernel (``pc.extract_regex``): for the
flat-object wire format a regex reads the field exactly like a JSON parser
(the oracle uses ``json_extract``; both skip rows without the field as
NULL).  Nested/escaped payloads would swap in the actor-pool orjson arm the
vendor stages use — the aggregation shape is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def json_field_stats(
    ds: ray.data.Dataset,
    column: str = "props",
    field: str = "k",
    group_by: str = "event_type",
) -> ray.data.Dataset:
    """Per-``group_by`` exact int stats (n, sum, min, max) of integer
    ``field`` inside JSON-string ``column``; rows without the field don't
    count (NULL semantics, same as the SQL oracle's ``json_extract``)."""
    import re

    from ..ops.common import grouped_map

    pat = '"' + re.escape(field) + r'"\s*:\s*(?P<v>-?\d+)'

    def partial(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t[column], pat)
        v = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        sub = pa.table({group_by: t[group_by], "v": v})
        sub = sub.filter(pc.is_valid(sub["v"]))
        out = sub.group_by([group_by], use_threads=False).aggregate(
            [("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max")]
        )
        return out.rename_columns([group_by, "n", "sum_k", "min_k", "max_k"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                group_by: [g[group_by].iloc[0]],
                "n": np.array([g["n"].sum()], dtype=np.int64),
                "sum_k": np.array([g["sum_k"].sum()], dtype=np.int64),
                "min_k": np.array([g["min_k"].min()], dtype=np.int64),
                "max_k": np.array([g["max_k"].max()], dtype=np.int64),
            }
        )

    return grouped_map(
        ds.map_batches(partial, batch_format="pyarrow"), [group_by], merge,
        num_buckets=8,
    )
