"""Delta Sharing protocol client over an in-process fake server.

The fake implements the REST surface from PROTOCOL.md (paginated listings,
version header, metadata + query NDJSON with file:// URLs over local
parquet), so the client's protocol logic — auth header, pagination drain,
NDJSON parse, snapshot assembly, typed partition attach — is exercised end
to end without a network.
"""

import json

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from core_ray.sources.delta_sharing import (
    DeltaSharingClient,
    DeltaSharingError,
    DeltaSharingProfile,
    DeltaSharingSource,
    load_as_ray,
)

SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
            {"name": "part", "type": "integer", "nullable": True, "metadata": {}},
        ],
    }
)


class FakeSharingServer:
    """transport(method, url, headers, body) -> (status, headers, data)."""

    def __init__(self, endpoint, token, files_by_part):
        self.endpoint = endpoint
        self.token = token
        # {partition_value: parquet_path}
        self.files_by_part = files_by_part
        self.requests = []

    def __call__(self, method, url, headers, body):
        self.requests.append((method, url, body))
        if headers.get("Authorization") != f"Bearer {self.token}":
            return 401, {}, json.dumps({"message": "bad token"}).encode()
        assert url.startswith(self.endpoint)
        path, _, query = url[len(self.endpoint):].partition("?")
        if path == "/shares":
            # two pages to exercise the pagination drain
            if "pageToken=p2" in query:
                doc = {"items": [{"name": "share2"}]}
            else:
                doc = {"items": [{"name": "share1"}], "nextPageToken": "p2"}
            return 200, {}, json.dumps(doc).encode()
        if path == "/shares/share1/schemas":
            return 200, {}, json.dumps({"items": [{"name": "default"}]}).encode()
        if path == "/shares/share1/schemas/default/tables":
            return 200, {}, json.dumps({"items": [{"name": "tbl"}]}).encode()
        if path == "/shares/share1/schemas/default/tables/tbl/version":
            return 200, {"Delta-Table-Version": "7"}, b"{}"
        meta = {
            "metaData": {
                "id": "m1",
                "version": 7,
                "schemaString": SCHEMA_STRING,
                "partitionColumns": ["part"],
            }
        }
        proto = {"protocol": {"minReaderVersion": 1}}
        if path == "/shares/share1/schemas/default/tables/tbl/metadata":
            lines = [json.dumps(proto), json.dumps(meta)]
            return 200, {}, "\n".join(lines).encode()
        if path == "/shares/share1/schemas/default/tables/tbl/query":
            assert method == "POST"
            req = json.loads(body)
            lines = [json.dumps(proto), json.dumps(meta)]
            for part, fpath in sorted(self.files_by_part.items()):
                lines.append(
                    json.dumps(
                        {
                            "file": {
                                "id": f"f{part}",
                                "url": f"file://{fpath}",
                                "partitionValues": {"part": str(part)},
                                "size": 1,
                            }
                        }
                    )
                )
                if req.get("limitHint") == 1:
                    break  # advisory trim — server may return fewer files
            return 200, {}, "\n".join(lines).encode()
        return 404, {}, json.dumps({"message": f"no route {path}"}).encode()


@pytest.fixture()
def share(tmp_path):
    files = {}
    for part, ids in ((1, [1, 2, 3]), (2, [4, 5])):
        p = tmp_path / f"part{part}.parquet"
        pq.write_table(
            pa.table({"id": pa.array(ids, pa.int64()),
                      "v": pa.array([float(i) * 0.5 for i in ids])}),
            p,
        )
        files[part] = str(p)
    profile = tmp_path / "profile.share"
    profile.write_text(
        json.dumps(
            {
                "shareCredentialsVersion": 1,
                "endpoint": "https://fake.sharing/delta-sharing/",
                "bearerToken": "tok123",
            }
        )
    )
    server = FakeSharingServer(
        "https://fake.sharing/delta-sharing", "tok123", files
    )
    return str(profile), server


def test_profile_parse(share):
    profile_path, _ = share
    prof = DeltaSharingProfile.from_file(profile_path)
    assert prof.endpoint == "https://fake.sharing/delta-sharing"
    assert prof.bearer_token == "tok123"
    # missing required field surfaces as ValueError
    import os
    import tempfile
    bad = tempfile.NamedTemporaryFile("w", suffix=".share", delete=False)
    json.dump({"endpoint": "x"}, bad)
    bad.close()
    try:
        with pytest.raises(ValueError):
            DeltaSharingProfile.from_file(bad.name)
    finally:
        os.unlink(bad.name)


def test_listings_paginated_and_version(share):
    profile_path, server = share
    client = DeltaSharingClient(
        DeltaSharingProfile.from_file(profile_path), transport=server
    )
    assert client.list_shares() == ["share1", "share2"]
    assert client.list_schemas("share1") == ["default"]
    assert client.list_tables("share1", "default") == ["tbl"]
    assert client.table_version("share1", "default", "tbl") == 7
    proto, meta = client.table_metadata("share1", "default", "tbl")
    assert proto["minReaderVersion"] == 1
    assert meta["partitionColumns"] == ["part"]


def test_read_batch_typed_partitions(ray_session, share):
    profile_path, server = share
    src = DeltaSharingSource(
        profile_path, "share1", "default", "tbl", transport=server
    )
    df = (
        src.read_batch()
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(df["id"]) == [1, 2, 3, 4, 5]
    # partition column attached and typed per schemaString (integer)
    assert list(df["part"]) == [1, 1, 1, 2, 2]
    assert pd.api.types.is_integer_dtype(df["part"])
    assert df["v"].tolist() == [0.5, 1.0, 1.5, 2.0, 2.5]


def test_limit_hint_and_column_pruning(ray_session, share):
    profile_path, server = share
    src = DeltaSharingSource(
        profile_path, "share1", "default", "tbl",
        transport=server, limit_hint=1, columns=["id", "part"],
    )
    df = src.read_batch().to_pandas()
    assert set(df.columns) == {"id", "part"}
    assert list(sorted(df["id"])) == [1, 2, 3]  # server trimmed to part 1
    (method, url, body) = next(
        r for r in server.requests if r[0] == "POST"
    )
    assert json.loads(body)["limitHint"] == 1


def test_load_as_ray_locator_and_errors(ray_session, share):
    profile_path, server = share
    ds = load_as_ray(f"{profile_path}#share1.default.tbl", transport=server)
    assert ds.count() == 5
    with pytest.raises(ValueError):
        load_as_ray("no-fragment-here")
    bad_client = DeltaSharingClient(
        DeltaSharingProfile(
            endpoint="https://fake.sharing/delta-sharing",
            bearer_token="WRONG",
        ),
        transport=server,
    )
    with pytest.raises(DeltaSharingError) as ei:
        bad_client.list_shares()
    assert ei.value.status == 401
    good = DeltaSharingClient(
        DeltaSharingProfile.from_file(profile_path), transport=server
    )
    with pytest.raises(DeltaSharingError) as ei:
        good._request("GET", "/nope")
    assert ei.value.status == 404


def test_read_stream_batch_only(share):
    profile_path, server = share
    src = DeltaSharingSource(
        profile_path, "share1", "default", "tbl", transport=server
    )
    with pytest.raises(NotImplementedError):
        src.read_stream()


def test_to_polars_bridge(ray_session, share):
    profile_path, server = share
    src = DeltaSharingSource(
        profile_path, "share1", "default", "tbl", transport=server
    )
    lf = src.to_polars()
    out = lf.collect().sort("id")
    assert out["id"].to_list() == [1, 2, 3, 4, 5]
