"""Partitioned hash join — the large-x-large join path (ray_guide "Both
sides large"): add ``bucket = hash(key) % B`` to both sides, co-group by
bucket, and join pairwise inside each bucket task.  Used when the build side
is too big to broadcast (the broadcast path lives in
``pipelines/relational.py``).

Arrow-native shuffle: each side is conformed to the union schema with typed
null columns and tagged with (side, bucket) IN ARROW — payload columns never
round-trip through pandas until the single per-bucket merge (pandas' C join
kernel), which runs once per bucket, not once per batch.

Skew note: a hot key inflates one bucket; mitigate by raising ``num_buckets``
or pre-salting the probe side — documented, not automatic."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    how: str = "inner",
    num_buckets: int = 32,
    broadcast_threshold_bytes: int = 64 << 20,
) -> ray.data.Dataset:
    """Join two Datasets on one key column.

    When the build (right) side is provably small — its metadata size is
    under ``broadcast_threshold_bytes`` — it is broadcast once via
    ``ray.put`` and merged inside ``map_batches`` with NO shuffle (the
    autoBroadcastJoinThreshold rule every SQL engine applies; driver memory
    stays bounded by the threshold).  Otherwise both sides are tagged with a
    side marker and a deterministic key-hash bucket, unioned (ONE shuffle
    co-locates both sides), and merged per bucket with a pandas join."""
    lschema, rschema = left.schema(), right.schema()
    lcols, rcols = list(lschema.names), list(rschema.names)
    overlap = (set(lcols) & set(rcols)) - {on}
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    if how in ("inner", "left"):
        try:
            rsize = right.size_bytes()
        except Exception:
            rsize = None
        if rsize is not None and 0 < rsize <= broadcast_threshold_bytes:
            rt = right.to_pandas()  # bounded: size-gated broadcast side
            if rt.shape[1] == 0:
                # a 0-row dataset loses its columns through to_pandas();
                # rebuild the typed empty frame from the Arrow schema so the
                # merge still sees the key column (empty right = no matches)
                rt = pa.schema(
                    list(zip(rschema.names, rschema.types))
                ).empty_table().to_pandas()  # bounded: typed empty

            import ray as _ray

            ref = _ray.put(rt)

            def bj(df: pd.DataFrame) -> pd.DataFrame:
                return df.merge(_ray.get(ref), on=on, how=how)

            return left.map_batches(bj, batch_format="pandas")

    def _arrow_types(schema) -> dict:
        base = getattr(schema, "base_schema", None)
        if isinstance(base, pa.Schema):
            return {f.name: f.type for f in base}
        out = {}
        for n, t in zip(schema.names, schema.types):
            if isinstance(t, pa.DataType):
                out[n] = t
            else:
                try:  # pandas-block schema carries numpy dtypes
                    out[n] = pa.from_numpy_dtype(np.dtype(t))
                except (TypeError, pa.ArrowNotImplementedError):
                    out[n] = pa.string()
        return out

    types = _arrow_types(lschema)
    types.update(_arrow_types(rschema))
    all_cols = lcols + [c for c in rcols if c not in lcols]

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {}
            for c in all_cols:
                cols[c] = (
                    t[c] if c in t.column_names else pa.nulls(n, types[c])
                )
            out = pa.table(cols)
            key_np = t[on].to_numpy(zero_copy_only=False)
            h = (
                pd.util.hash_pandas_object(pd.Series(key_np), index=False).to_numpy()
                % num_buckets
            ).astype(np.int64)
            out = out.append_column("_side", pa.array(np.full(n, side, dtype=np.int8)))
            return out.append_column("_bucket", pa.array(h))

        return fn

    tagged = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # split sides IN ARROW so each side drops the other's null-padded
        # columns before the pandas conversion (an int column with union
        # nulls would otherwise come back float64)
        lf = t.filter(pc.equal(t["_side"], 0)).select(lcols).to_pandas()  # per-batch
        rf = t.filter(pc.equal(t["_side"], 1)).select(rcols).to_pandas()  # per-batch
        return pa.Table.from_pandas(lf.merge(rf, on=on, how=how), preserve_index=False)

    return tagged.groupby("_bucket").map_groups(join_bucket, batch_format="pyarrow")


def semi_join_filter(
    ds: ray.data.Dataset,
    keys: ray.data.Dataset | None,
    on: str,
    key_cols: list[str] | None = None,
    key_set: pa.Array | None = None,
) -> ray.data.Dataset:
    """Filter ``ds`` to rows whose ``on`` value appears in any of ``keys``'
    ``key_cols`` — the dynamic-partition-pruning / broadcast-semi-join
    pattern.

    The keep-set must be control-plane small (ids, not payloads): it is
    collected once, deduplicated, and shipped via ``ray.put``; the big side
    is then pruned in ONE vectorized Arrow scan with no shuffle.  Use this
    before a ``hash_join`` whose probe side is a large table but whose
    matching row set is known to be small — the join then runs against the
    pruned side instead of shuffling the full table.  Pass ``key_set`` when
    the keys were already collected (skips the extra pass).
    """
    import pyarrow.compute as pc

    keep = key_set if key_set is not None else collect_key_set(keys, key_cols or [on])

    import ray as _ray

    ref = _ray.put(keep)

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[on], value_set=_ray.get(ref)))

    return ds.map_batches(fn, batch_format="pyarrow")


def collect_key_set(keys: ray.data.Dataset, cols: list[str]) -> pa.Array:
    """Gather the distinct union of ``cols`` values from a control-plane
    Dataset (ids, never payloads) into one Arrow array.  This is the only
    driver-side materialization in the semi-join path and is bounded by the
    key-set size — 8 bytes per int key."""
    import pyarrow.compute as pc

    chunks = []
    for b in keys.select_columns(cols).iter_batches(batch_format="pyarrow"):
        for c in cols:
            chunks.append(b[c].combine_chunks())
    if not chunks:
        return pa.array([], pa.int64())
    return pc.unique(pa.concat_arrays([c.cast(chunks[0].type) for c in chunks]))


_BCAST_CACHE: dict = {}


def object_store_table(ds: ray.data.Dataset):
    """Materialize a SMALL Dataset's blocks in the object store and return
    the block refs — a broadcast build side that never lands on the driver
    (contrast hash_join's broadcast path, which goes through driver pandas).
    Workers fetch the refs zero-copy and assemble the table locally once
    per process (cached)."""
    return ds.materialize().to_arrow_refs()


def fetch_broadcast_table(refs) -> pa.Table:
    """Worker-side: assemble (and cache per process) the table behind
    :func:`object_store_table` refs."""
    import ray as _ray

    key = tuple(r.hex() for r in refs)
    tbl = _BCAST_CACHE.get(key)
    if tbl is None:
        tables = _ray.get(list(refs))
        tbl = pa.concat_tables(tables) if tables else pa.table({})
        _BCAST_CACHE.clear()  # hold at most one broadcast table per worker
        _BCAST_CACHE[key] = tbl
    return tbl


def anti_join_filter(
    ds: ray.data.Dataset,
    keys: ray.data.Dataset | None,
    on: str,
    key_cols: list[str] | None = None,
    key_set: pa.Array | None = None,
    distributed: bool = False,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """ANTI-join: keep rows of ``ds`` whose ``on`` value appears in NONE of
    ``keys``' ``key_cols`` — the NOT EXISTS / EXCEPT pattern
    (:func:`semi_join_filter`'s complement).

    Broadcast arm (default): the key set is collected once, deduplicated and
    shipped via ``ray.put``; the big side is pruned in one vectorized
    ``is_in``-inverted scan, no shuffle.  Right only when the key side is
    control-plane small.

    Distributed arm (``distributed=True``) for key sides too large to
    broadcast: the keys are deduplicated in their buckets
    (``bucketed_distinct``), tagged with a marker column, LEFT-hash-joined
    against ``ds`` (one co-locating shuffle via :func:`hash_join`, which
    itself auto-broadcasts if the deduped key side turns out small), and
    rows whose marker is null survive.  No driver-side state at any key
    cardinality.
    """
    import pyarrow.compute as pc

    import ray as _ray

    kc = (key_cols or [on])[0]
    if not distributed:
        keep = (
            key_set if key_set is not None
            else collect_key_set(keys, key_cols or [on])
        )
        ref = _ray.put(keep)

        def fn(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.invert(pc.is_in(t[on], value_set=_ray.get(ref)))
            )

        return ds.map_batches(fn, batch_format="pyarrow")

    from ..ops.common import bucketed_distinct

    sch = ds.schema()
    key_type = sch.types[sch.names.index(on)]

    def as_marker(t: pa.Table) -> pa.Table:
        return pa.table(
            {on: t[kc].cast(key_type),
             "_anti_m": pa.array(np.ones(len(t), np.int8))}
        )

    marked = bucketed_distinct(
        keys.map_batches(as_marker, batch_format="pyarrow"), [on], [on],
        num_buckets=num_buckets,
    )
    # an empty key side (nothing matched the predicate) leaves zero groups
    # above, i.e. a schema-less dataset; pin the schema so the left join
    # runs and NOT EXISTS correctly keeps every row
    marked = ray.data.from_arrow(
        pa.table({on: pa.array([], key_type),
                  "_anti_m": pa.array([], pa.int8())})
    ).union(marked)
    joined = hash_join(ds, marked, on=on, how="left", num_buckets=num_buckets)

    def keep_null(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t["_anti_m"])).drop_columns(["_anti_m"])

    return joined.map_batches(keep_null, batch_format="pyarrow")
