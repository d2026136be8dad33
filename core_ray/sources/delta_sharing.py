"""Native Delta Sharing protocol client — no ``delta-sharing`` pip client.

Reference ``sources/python/delta_sharing.py:23`` (PythonDeltaSharingSource)
and ``sources/spark/delta_sharing.py:24`` wrap the vendor client/connector;
here the PUBLIC REST protocol itself (delta.io delta-sharing PROTOCOL.md) is
implemented: bearer-token profile files, paginated share/schema/table
listings, the ``version`` / ``metadata`` endpoints, and the NDJSON ``query``
response — a ``protocol`` line, a ``metaData`` line (same schemaString +
partitionColumns shape as the Delta transaction log), then one ``file``
action per live file carrying a presigned URL, ``partitionValues`` and
``size``.

The HTTP layer is a single injectable callable
``transport(method, url, headers, body) -> (status, headers, data)`` so the
protocol logic is fully testable in the no-network sandbox (tests drive it
against an in-process fake server over local parquet); the default urllib
arm is what a real deployment uses.

Query results land as a Ray Dataset through
:func:`core_ray.sources.delta_log.read_snapshot` — file URLs grouped by
partition tuple, one pruned ``read_parquet`` per group, partition values
attached as typed constant columns — so a shared table scales exactly like
a local Delta table (reads stay parallel, column pruning intact).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import ray.data

from ..pipelines.framework import SourceComponent
from .delta_log import DeltaSnapshot, read_snapshot


class DeltaSharingError(RuntimeError):
    """Protocol-level failure (non-2xx response or malformed payload)."""

    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status


@dataclass
class DeltaSharingProfile:
    """Share credential file (PROTOCOL.md 'Profile File Format')."""

    endpoint: str
    bearer_token: str
    share_credentials_version: int = 1
    expiration_time: str | None = None

    @classmethod
    def from_file(cls, path: str) -> "DeltaSharingProfile":
        with open(path) as f:
            raw = json.load(f)
        try:
            return cls(
                endpoint=raw["endpoint"].rstrip("/"),
                bearer_token=raw["bearerToken"],
                share_credentials_version=int(
                    raw.get("shareCredentialsVersion", 1)
                ),
                expiration_time=raw.get("expirationTime"),
            )
        except KeyError as e:
            raise ValueError(f"profile missing required field {e}") from e


def _urllib_transport(method, url, headers, body):  # pragma: no cover
    """Default arm for real deployments; unreachable in the no-network
    sandbox (every test injects a fake transport)."""
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers or {}), e.read()


class DeltaSharingClient:
    """REST client over an injectable transport."""

    def __init__(self, profile: DeltaSharingProfile, transport=None):
        self.profile = profile
        self._transport = transport or _urllib_transport

    # -- wire ---------------------------------------------------------

    def _request(self, method: str, path: str, body: dict | None = None):
        headers = {
            "Authorization": f"Bearer {self.profile.bearer_token}",
            "Content-Type": "application/json; charset=utf-8",
        }
        data = None if body is None else json.dumps(body).encode()
        status, resp_headers, payload = self._transport(
            method, self.profile.endpoint + path, headers, data
        )
        if status >= 400:
            try:
                message = json.loads(payload).get("message", "")
            except (ValueError, AttributeError):
                message = (payload or b"").decode("utf-8", "replace")[:200]
            raise DeltaSharingError(status, message)
        return resp_headers, payload

    def _paged(self, path: str, key: str = "items") -> list[dict]:
        """Drain a paginated listing (``nextPageToken`` loop)."""
        out: list[dict] = []
        token = None
        while True:
            suffix = f"?pageToken={token}" if token else ""
            _, payload = self._request("GET", path + suffix)
            doc = json.loads(payload)
            out.extend(doc.get(key) or [])
            token = doc.get("nextPageToken")
            if not token:
                return out

    @staticmethod
    def _ndjson(payload: bytes) -> list[dict]:
        return [
            json.loads(line)
            for line in payload.decode().splitlines()
            if line.strip()
        ]

    # -- listings -----------------------------------------------------

    def list_shares(self) -> list[str]:
        return [s["name"] for s in self._paged("/shares")]

    def list_schemas(self, share: str) -> list[str]:
        return [s["name"] for s in self._paged(f"/shares/{share}/schemas")]

    def list_tables(self, share: str, schema: str) -> list[str]:
        return [
            t["name"]
            for t in self._paged(f"/shares/{share}/schemas/{schema}/tables")
        ]

    # -- table endpoints ----------------------------------------------

    def table_version(self, share: str, schema: str, table: str) -> int:
        headers, _ = self._request(
            "GET", f"/shares/{share}/schemas/{schema}/tables/{table}/version"
        )
        lowered = {k.lower(): v for k, v in headers.items()}
        return int(lowered["delta-table-version"])

    def table_metadata(self, share, schema, table) -> tuple[dict, dict]:
        _, payload = self._request(
            "GET", f"/shares/{share}/schemas/{schema}/tables/{table}/metadata"
        )
        lines = self._ndjson(payload)
        protocol = lines[0].get("protocol", {})
        metadata = lines[1].get("metaData", {})
        return protocol, metadata

    def query_table(
        self,
        share: str,
        schema: str,
        table: str,
        predicate_hints: list[str] | None = None,
        limit_hint: int | None = None,
        version: int | None = None,
    ) -> tuple[dict, list[dict]]:
        """POST …/query → (metaData, file actions).  Hints are advisory —
        the server MAY return a superset (PROTOCOL.md), so callers must not
        treat them as filters."""
        body: dict = {}
        if predicate_hints:
            body["predicateHints"] = list(predicate_hints)
        if limit_hint is not None:
            body["limitHint"] = int(limit_hint)
        if version is not None:
            body["version"] = int(version)
        _, payload = self._request(
            "POST",
            f"/shares/{share}/schemas/{schema}/tables/{table}/query",
            body=body,
        )
        lines = self._ndjson(payload)
        metadata = lines[1].get("metaData", {})
        files = [ln["file"] for ln in lines[2:] if "file" in ln]
        return metadata, files

    def snapshot(
        self, share: str, schema: str, table: str, **query_kwargs
    ) -> DeltaSnapshot:
        """Query response → the same snapshot shape the local ``_delta_log``
        reader produces, file paths being the server's (presigned) URLs."""
        metadata, files = self.query_table(share, schema, table, **query_kwargs)
        return DeltaSnapshot(
            version=int(metadata.get("version") or 0),
            files=[
                {
                    "path": _local_path(f["url"]),
                    "partitionValues": dict(f.get("partitionValues") or {}),
                }
                for f in files
            ],
            schema_string=metadata.get("schemaString"),
            partition_columns=list(metadata.get("partitionColumns") or []),
        )


def _local_path(url: str) -> str:
    """``file://`` URLs (local/NFS shares, and every in-sandbox test) become
    plain paths; anything else passes through for the parquet reader's
    filesystem resolution."""
    return url[len("file://"):] if url.startswith("file://") else url


class DeltaSharingSource(SourceComponent):
    """Shared Delta table → Ray Dataset (reference
    ``sources/python/delta_sharing.py:23`` constructor signature, protocol
    implemented natively above)."""

    def __init__(
        self,
        profile_path: str,
        share_name: str,
        schema_name: str,
        table_name: str,
        transport=None,
        columns: list[str] | None = None,
        limit_hint: int | None = None,
    ):
        self.profile_path = profile_path
        self.share_name = share_name
        self.schema_name = schema_name
        self.table_name = table_name
        self.columns = columns
        self.limit_hint = limit_hint
        self._client = DeltaSharingClient(
            DeltaSharingProfile.from_file(profile_path), transport=transport
        )

    @property
    def client(self) -> DeltaSharingClient:
        return self._client

    def read_batch(self) -> ray.data.Dataset:
        snap = self._client.snapshot(
            self.share_name,
            self.schema_name,
            self.table_name,
            limit_hint=self.limit_hint,
        )
        return read_snapshot(snap, columns=self.columns)

    def read_stream(self):
        """Parity with reference ``delta_sharing.py:95`` — batch only."""
        raise NotImplementedError(
            "Delta Sharing reads are batch-only (reference parity)."
        )

    def to_polars(self):
        """Reference ``read_batch`` returns a Polars LazyFrame; same bridge
        as :class:`PolarsSource` (Arrow hand-off, lazy)."""
        import polars as pl

        return pl.from_pandas(self.read_batch().to_pandas()).lazy()  # bounded: shared-table read API


def load_as_ray(table_url: str, transport=None, **kwargs) -> ray.data.Dataset:
    """``profile#share.schema.table`` locator (the vendor client's
    ``load_as_pandas`` addressing, reference ``delta_sharing.py:89``)."""
    profile_path, _, fqn = table_url.partition("#")
    parts = fqn.split(".")
    if len(parts) != 3 or not profile_path:
        raise ValueError(
            "expected 'profile#share.schema.table', got " + repr(table_url)
        )
    return DeltaSharingSource(
        profile_path, *parts, transport=transport, **kwargs
    ).read_batch()


__all__ = [
    "DeltaSharingClient",
    "DeltaSharingError",
    "DeltaSharingProfile",
    "DeltaSharingSource",
    "load_as_ray",
]
