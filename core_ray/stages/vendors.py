"""Per-vendor JSON → PCDM preset transformers.

Each function mirrors one reference transformer's field semantics (cited per
function) as a Ray Data ``map_batches`` stage over a string payload column,
emitting the 6-column PCDM CDC shape (TagName, EventTime, Status,
Value:string, ValueType, ChangeType).

Parsing is per-message (each message is one independent JSON document — the
same grain the reference's ``from_json`` works at) through the orjson Rust
parser when available (``stages/_json.py``; Spark's ``from_json`` is likewise
a native parser, so this is the honest analog rather than stdlib ``json``);
all downstream stages stay vectorized Arrow.  For very large messages, run
these as an actor-pool stage (``concurrency=N``) so buffers are reused per
actor.
"""

from __future__ import annotations

from ._json import loads as _loads
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

import ray.data

PCDM_COLS = ["TagName", "EventTime", "Status", "Value", "ValueType", "ChangeType"]


def _to_utc_naive_us(val) -> np.datetime64 | None:
    """Parse ISO strings (with or without offset) / epoch numbers to UTC-naive us."""
    if val is None:
        return None
    if isinstance(val, (int, float)):
        v = float(val)
        if v > 1e12:  # ms epoch
            return np.datetime64(int(v * 1000), "us")
        return np.datetime64(int(v * 1_000_000), "us")
    s = str(val).replace("Z", "+00:00")
    try:
        dt = datetime.fromisoformat(s)
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return np.datetime64(dt, "us")


def _float_value_type(v) -> str:
    """Spark's ``cast('float') IS NOT NULL`` heuristic: float-castable ->
    'float' else 'string' (OPC-UA/Fledge/AIO rule)."""
    try:
        float(v)
        return "float"
    except (TypeError, ValueError):
        return "string"


def _pcdm_table(rows: list[tuple]) -> pa.Table:
    cols = list(zip(*rows)) if rows else [[], [], [], [], [], []]
    times = [t if t is not None else None for t in cols[1]]
    return pa.table(
        {
            "TagName": pa.array(cols[0], pa.string()),
            "EventTime": pa.array(times, pa.timestamp("us")),
            "Status": pa.array(cols[2], pa.string()),
            "Value": pa.array([None if v is None else str(v) for v in cols[3]], pa.string()),
            "ValueType": pa.array(cols[4], pa.string()),
            "ChangeType": pa.array(cols[5], pa.string()),
        }
    )


def _vendor_stage(parse_message, source_column: str):
    def fn(batch: pa.Table) -> pa.Table:
        rows: list[tuple] = []
        for body in batch[source_column].to_pylist():
            if body is None:
                continue
            rows.extend(parse_message(body))
        return _pcdm_table(rows)

    return fn


# --- Fledge (reference fledge_opcua_json_to_pcdm.py) -----------------------


def fledge_opcua_to_pcdm(
    ds: ray.data.Dataset,
    source_column: str = "body",
    status_null_value: str = "Good",
    change_type: str = "insert",
) -> ray.data.Dataset:
    """Fledge south-service JSON: array of {asset, readings{tag: value},
    timestamp} — one PCDM row per reading key; ValueType by float-castability."""

    def parse(body: str):
        out = []
        for msg in _loads(body):
            t = _to_utc_naive_us(msg.get("timestamp"))
            for tag, val in (msg.get("readings") or {}).items():
                out.append(
                    (tag, t, status_null_value, val, _float_value_type(val), change_type)
                )
        return out

    return ds.map_batches(_vendor_stage(parse, source_column), batch_format="pyarrow")


# --- OPC Publisher OPC-UA (reference opc_publisher_opcua_json_to_pcdm.py) --


def opc_publisher_opcua_to_pcdm(
    ds: ray.data.Dataset,
    source_column: str = "body",
    multiple_rows_per_message: bool = True,
    tagname_field: str = "DisplayName",
    status_null_value: str = "Good",
    change_type: str = "insert",
    filter_fn=None,
) -> ray.data.Dataset:
    """Azure OPC Publisher telemetry: [{NodeId, DisplayName, Value:{Value,
    SourceTimestamp, StatusCode:{Symbol}}}] — Status from StatusCode.Symbol
    when present, else the configured null value."""

    def parse(body: str):
        msgs = _loads(body)
        if not multiple_rows_per_message:
            msgs = [msgs]
        out = []
        for m in msgs:
            if filter_fn is not None and not filter_fn(m):
                continue
            v = m.get("Value") or {}
            symbol = ((v.get("StatusCode") or {}).get("Symbol"))
            out.append(
                (
                    m.get(tagname_field),
                    _to_utc_naive_us(v.get("SourceTimestamp")),
                    symbol if symbol is not None else status_null_value,
                    v.get("Value"),
                    _float_value_type(v.get("Value")),
                    change_type,
                )
            )
        return out

    return ds.map_batches(_vendor_stage(parse, source_column), batch_format="pyarrow")


# --- EdgeX (reference edgex_opcua_json_to_pcdm.py) -------------------------

_EDGEX_VTYPES = {
    **{t: "integer" for t in ("Int8", "Int16", "Int32", "Int64",
                               "Uint8", "Uint16", "Uint32", "Uint64")},
    "Float32": "float",
    "Float64": "float",
    "Bool": "bool",
}


def edgex_to_pcdm(
    ds: ray.data.Dataset,
    source_column: str = "body",
    tagname_field: str = "resourceName",
    status_null_value: str = "Good",
    change_type: str = "insert",
) -> ray.data.Dataset:
    """EdgeX events: {readings: [{resourceName, origin(ns epoch), value,
    valueType}]} — EventTime = origin/1e9; vendor valueType mapped onto PCDM
    integer/float/bool/string."""

    def parse(body: str):
        msg = _loads(body)
        out = []
        for r in msg.get("readings") or []:
            origin = r.get("origin")
            t = (
                np.datetime64(int(origin / 1000), "us")  # ns -> us
                if origin is not None
                else None
            )
            out.append(
                (
                    r.get(tagname_field),
                    t,
                    status_null_value,
                    r.get("value"),
                    _EDGEX_VTYPES.get(r.get("valueType"), "string"),
                    change_type,
                )
            )
        return out

    return ds.map_batches(_vendor_stage(parse, source_column), batch_format="pyarrow")


# --- AIO (reference aio_json_to_pcdm.py) -----------------------------------


def aio_to_pcdm(
    ds: ray.data.Dataset,
    source_column: str = "body",
    status_null_value: str = "Good",
    change_type: str = "insert",
) -> ray.data.Dataset:
    """Azure IoT Operations: outer JSON carries a nested ``Payload`` JSON
    mapping tag -> {SourceTimestamp, Value}; one PCDM row per tag."""

    def parse(body: str):
        outer = _loads(body)
        payload = outer.get("Payload")
        if isinstance(payload, str):
            payload = _loads(payload)
        out = []
        for tag, entry in (payload or {}).items():
            out.append(
                (
                    tag,
                    _to_utc_naive_us((entry or {}).get("SourceTimestamp")),
                    status_null_value,
                    (entry or {}).get("Value"),
                    _float_value_type((entry or {}).get("Value")),
                    change_type,
                )
            )
        return out

    return ds.map_batches(_vendor_stage(parse, source_column), batch_format="pyarrow")


# --- SEM (reference sem_json_to_pcdm.py) -----------------------------------


def sem_to_pcdm(
    ds: ray.data.Dataset,
    field_mappings: dict[int, dict[str, str]],
    source_column: str = "body",
    status_null_value: str = "Good",
    change_type: str = "insert",
) -> ray.data.Dataset:
    """SEM OBC messages: readings melt to {dID, d: "[v0,v1,...]", t:
    "<epoch-digits>"}; the epoch string is split after 10 digits into seconds
    (reference regexp ``(\\d{10})(\\d+)`` -> ``$1.$2``), ``d`` posexplodes and
    each position maps through the configured OBC field mapping to
    (TagName suffix, ValueType); TagName = "{dID}:{suffix}"."""

    def parse(body: str):
        msg = _loads(body)
        readings = msg.get("readings") or {}
        names = readings.get("resourceName") or []
        values = readings.get("value") or []
        rec = dict(zip(names, values))
        d_id, d, t = rec.get("dID"), rec.get("d"), rec.get("t")
        ts = None
        if t is not None:
            digits = str(t)
            ts = _to_utc_naive_us(float(digits[:10] + "." + digits[10:]))
        out = []
        if not d:
            return out
        parts = str(d)[1:-1].split(",")  # strip [ ] then posexplode
        for pos, val in enumerate(parts):
            m = field_mappings.get(pos)
            if m is None:
                continue
            out.append(
                (
                    f"{d_id}:{m['TagName']}",
                    ts,
                    status_null_value,
                    val,
                    m["ValueType"],
                    change_type,
                )
            )
        return out

    return ds.map_batches(_vendor_stage(parse, source_column), batch_format="pyarrow")


# --- Mirico (reference mirico_json_to_pcdm.py / mirico_json_to_metadata.py)

_MIRICO_META_KEYS = {"timeStamp", "siteName", "retroName", "gasType"}


def _mirico_tag(site, retro, key, gas, tagname_field: str | None) -> str:
    k = key.upper()
    if k == "GASPPM" and gas is not None:
        k = f"{k}_{str(gas).upper()}"
    base = "_".join(
        p for p in ((site or "").upper(), (retro or "").upper(), k) if p
    )
    return f"{tagname_field.upper()}:{base}" if tagname_field else base


def mirico_to_pcdm(
    ds: ray.data.Dataset,
    field_value_types: dict[str, str] | None = None,
    source_column: str = "body",
    tagname_field: str | None = None,
    change_type: str = "insert",
) -> ray.data.Dataset:
    """Mirico gas-sensor messages: a flat JSON map; metadata keys (timeStamp,
    siteName, retroName, gasType) shape the TagName
    (SITE_RETRO_KEY[, _GASTYPE for GASPPM][, prefixed TAGNAME_FIELD:]); every
    remaining key becomes one PCDM row.  ``field_value_types`` maps keys to
    ValueType (default: float-castability)."""
    vt_map = field_value_types or {}

    def parse(body: str):
        msg = _loads(body)
        site, retro, gas = msg.get("siteName"), msg.get("retroName"), msg.get("gasType")
        t = _to_utc_naive_us(msg.get("timeStamp"))
        out = []
        for key, val in msg.items():
            if key in _MIRICO_META_KEYS:
                continue
            out.append(
                (
                    _mirico_tag(site, retro, key, gas, tagname_field),
                    t,
                    "Good",
                    val,
                    vt_map.get(key, _float_value_type(val)),
                    change_type,
                )
            )
        return out

    return ds.map_batches(_vendor_stage(parse, source_column), batch_format="pyarrow")


def mirico_to_metadata(
    ds: ray.data.Dataset, source_column: str = "body"
) -> ray.data.Dataset:
    """Mirico metadata rows (reference mirico_json_to_metadata.py): one row
    per message with the site/retro identity and lat/long description."""

    def fn(batch: pa.Table) -> pa.Table:
        rows = []
        for body in batch[source_column].to_pylist():
            if body is None:
                continue
            m = _loads(body)
            site, retro = m.get("siteName"), m.get("retroName")
            rows.append(
                (
                    "_".join(p for p in ((site or "").upper(), (retro or "").upper()) if p),
                    f"lat: {m.get('retroLatitude')}, long: {m.get('retroLongitude')}",
                    str(m.get("retroAltitude")) if m.get("retroAltitude") is not None else None,
                )
            )
        cols = list(zip(*rows)) if rows else [[], [], []]
        return pa.table(
            {
                "TagName": pa.array(cols[0], pa.string()),
                "Description": pa.array(cols[1], pa.string()),
                "UoM": pa.array(cols[2], pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# --- Honeywell APM (reference honeywell_apm_to_pcdm.py) --------------------


def honeywell_apm_to_pcdm(
    ds: ray.data.Dataset,
    source_column: str = "body",
    status_null_value: str = "Good",
    change_type: str = "insert",
) -> ray.data.Dataset:
    """Honeywell APM: {SystemTimeSeries: {Samples: [{ItemName, Time, Value}]}}
    — one PCDM row per sample, ValueType by float-castability."""

    def parse(body: str):
        msg = _loads(body)
        data = ((msg.get("SystemTimeSeries") or {}).get("Samples")) or []
        out = []
        for item in data:
            out.append(
                (
                    item.get("ItemName"),
                    _to_utc_naive_us(item.get("Time")),
                    status_null_value,
                    item.get("Value"),
                    _float_value_type(item.get("Value")),
                    change_type,
                )
            )
        return out

    return ds.map_batches(_vendor_stage(parse, source_column), batch_format="pyarrow")


# --- plain OPC-UA (reference opcua_json_to_pcdm.py) ------------------------


def opcua_to_pcdm(
    ds: ray.data.Dataset,
    source_column: str = "body",
    status_null_value: str = "Good",
    change_type: str = "insert",
) -> ray.data.Dataset:
    """Plain OPC-UA telemetry: {Messages: [{Timestamp, Payload: {tag:
    {Value}}}]} — one PCDM row per payload key (reference
    ``opcua_json_to_pcdm.py:61-86``: inline Messages, explode Payload,
    ValueType by float-castability)."""

    def parse(body: str):
        msg = _loads(body)
        out = []
        for m in msg.get("Messages") or []:
            t = _to_utc_naive_us(m.get("Timestamp"))
            for tag, payload in (m.get("Payload") or {}).items():
                val = (payload or {}).get("Value")
                out.append(
                    (tag, t, status_null_value, val, _float_value_type(val), change_type)
                )
        return out

    return ds.map_batches(_vendor_stage(parse, source_column), batch_format="pyarrow")


# --- SSIP PI JSON stream (reference ssip_pi_binary_json_to_pcdm.py) --------

_SSIP_POINT_TYPES = {
    "Digital": "string",
    "String": "string",
    "Float16": "float",
    "Float32": "float",
    "Float64": "float",
    "Int16": "integer",
    "Int32": "integer",
}
_SSIP_ACTIONS = {
    "Insert": "insert",
    "Add": "insert",
    "Delete": "delete",
    "Update": "update",
    "Refresh": "update",
}


def ssip_pi_json_to_pcdm(
    ds: ray.data.Dataset,
    source_column: str = "body",
    properties_column: str = "properties",
    metadata_point_types: dict[str, str] | None = None,
) -> ray.data.Dataset:
    """SSIP PI JSON stream → PCDM CDC rows (reference
    ``ssip_pi_binary_json_to_pcdm.py:76-176``): body JSON carries
    TagName/EventTime/Quality/Value; the message properties map carries
    PointType (falling back to a broadcast metadata lookup) and Action.
    ValueType maps from PointType and DEMOTES to 'string' when the value
    fails the integer/float cast; ChangeType maps Insert/Add→insert,
    Delete→delete, Update/Refresh→update.  Output adds EventDate (the merge
    sink's partition key)."""

    def fn(batch: pa.Table) -> pa.Table:
        rows = []
        props = batch[properties_column].to_pylist()
        for body, prop in zip(batch[source_column].to_pylist(), props):
            if body is None:
                continue
            msg = _loads(body)
            prop = prop or {}
            tag = msg.get("TagName")
            t = _to_utc_naive_us(msg.get("EventTime"))
            point_type = prop.get("PointType")
            if point_type is None and metadata_point_types:
                point_type = metadata_point_types.get(tag)
            vtype = _SSIP_POINT_TYPES.get(point_type, "string")
            val = msg.get("Value")
            if vtype == "integer":
                try:
                    int(str(val))
                except (TypeError, ValueError):
                    vtype = "string"
            elif vtype == "float":
                try:
                    float(str(val))
                except (TypeError, ValueError):
                    vtype = "string"
            rows.append(
                (
                    t.astype("datetime64[D]").item() if t is not None else None,
                    tag,
                    t,
                    msg.get("Quality"),
                    None if val is None else str(val),
                    vtype,
                    _SSIP_ACTIONS.get(prop.get("Action")),
                )
            )
        cols = list(zip(*rows)) if rows else [[]] * 7
        return pa.table(
            {
                "EventDate": pa.array(cols[0], pa.date32()),
                "TagName": pa.array(cols[1], pa.string()),
                "EventTime": pa.array(cols[2], pa.timestamp("us")),
                "Status": pa.array(cols[3], pa.string()),
                "Value": pa.array(cols[4], pa.string()),
                "ValueType": pa.array(cols[5], pa.string()),
                "ChangeType": pa.array(cols[6], pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# --- OPC Publisher A&E (reference opc_publisher_opcae_json_to_pcdm.py) -----

# (output column, nested Value field or None for top-level, arrow type)
_AE_FIELDS = [
    ("NodeId", None, pa.string()),
    ("DisplayName", None, pa.string()),
    ("ConditionId", "ConditionId", pa.string()),
    ("AckedState", "AckedState", pa.string()),
    ("AckedState/FalseState", "AckedState/FalseState", pa.string()),
    ("AckedState/Id", "AckedState/Id", pa.bool_()),
    ("AckedState/TrueState", "AckedState/TrueState", pa.string()),
    ("ActiveState", "ActiveState", pa.string()),
    ("ActiveState/FalseState", "ActiveState/FalseState", pa.string()),
    ("ActiveState/Id", "ActiveState/Id", pa.bool_()),
    ("ActiveState/TrueState", "ActiveState/TrueState", pa.string()),
    ("EnabledState", "EnabledState", pa.string()),
    ("EnabledState/FalseState", "EnabledState/FalseState", pa.string()),
    ("EnabledState/Id", "EnabledState/Id", pa.bool_()),
    ("EnabledState/TrueState", "EnabledState/TrueState", pa.string()),
    ("EventId", "EventId", pa.string()),
    ("EventType", "EventType", pa.string()),
    ("HighHighLimit", "HighHighLimit", pa.float64()),
    ("HighLimit", "HighLimit", pa.float64()),
    ("InputNode", "InputNode", pa.string()),
    ("LowLimit", "LowLimit", pa.float64()),
    ("LowLowLimit", "LowLowLimit", pa.float64()),
    ("Message", "Message", pa.string()),
    ("Quality", "Quality", pa.string()),
    ("ReceiveTime", "ReceiveTime", pa.timestamp("us")),
    ("Retain", "Retain", pa.bool_()),
    ("Severity", "Severity", pa.float64()),
    ("SourceName", "SourceName", pa.string()),
    ("SourceNode", "SourceNode", pa.string()),
    ("EventTime", "Time", pa.timestamp("us")),
]


def opc_publisher_ae_to_events(
    ds: ray.data.Dataset, source_column: str = "body"
) -> ray.data.Dataset:
    """OPC Publisher Alarms & Events JSON → one flat typed row per alarm
    (reference ``opc_publisher_opcae_json_to_pcdm.py:73-141``): the body is a
    JSON array of alarm objects whose condition fields live under
    ``Value.<Field>.Value``; timestamps parse through the multi-format
    coalesce and ``Time`` lands as ``EventTime``."""

    def fn(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for body in batch[source_column].to_pylist():
            if body is None:
                continue
            for alarm in _loads(body):
                value = alarm.get("Value") or {}
                row = {}
                for out_name, field, typ in _AE_FIELDS:
                    if field is None:
                        v = alarm.get(out_name)
                    else:
                        v = (value.get(field) or {}).get("Value")
                    if pa.types.is_timestamp(typ):
                        v = _to_utc_naive_us(v)
                    elif pa.types.is_float64(typ) and v is not None:
                        v = float(v)
                    elif pa.types.is_string(typ) and v is not None:
                        v = str(v)
                    row[out_name] = v
                rows.append(row)
        return pa.table(
            {
                name: pa.array([r[name] for r in rows], typ)
                for name, _, typ in _AE_FIELDS
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
