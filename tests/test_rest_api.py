"""REST destination: micro-batch packing, bounded concurrency, rate limit."""

import time

import pandas as pd
import pytest
import ray
import ray.data

from core_ray.stages.rest_api import rest_api_write


@ray.remote
class _MockServer:
    def __init__(self):
        self.calls = []

    def record(self, url, payload):
        self.calls.append((url, payload))
        return 200

    def get_calls(self):
        return self.calls


def _mock_transport(server):
    def send(url, payload):
        return ray.get(server.record.remote(url, payload))

    return send


def test_rest_api_packs_batches_and_counts():
    server = _MockServer.remote()
    ds = ray.data.from_pandas(
        pd.DataFrame({"TagName": [f"t{i}" for i in range(25)], "Value": range(25)})
    )
    stats = rest_api_write(
        ds, "http://api.test/ingest", batch_size=10, parallelism=2,
        transport=_mock_transport(server),
    )
    assert stats["rows_sent"] == 25
    assert stats["failed_requests"] == 0
    calls = ray.get(server.get_calls.remote())
    assert stats["requests"] == len(calls)
    # every payload is <= batch_size rows joined with ",|"
    for url, payload in calls:
        assert url == "http://api.test/ingest"
        assert 1 <= len(payload.split(",|")) <= 10
    total_rows = sum(len(p.split(",|")) for _, p in calls)
    assert total_rows == 25


def test_rest_api_rate_limit_throttles():
    server = _MockServer.remote()
    ds = ray.data.from_pandas(pd.DataFrame({"v": range(12)})).repartition(1)
    t0 = time.monotonic()
    stats = rest_api_write(
        ds, "http://api.test", batch_size=2, parallelism=1,
        rate_limit_per_sec=10.0, transport=_mock_transport(server),
    )
    wall = time.monotonic() - t0
    assert stats["requests"] == 6
    # 6 requests at 10/s from one actor: ~0.5s of enforced spacing
    assert wall >= 0.4


def test_rest_api_requires_transport_in_sandbox():
    ds = ray.data.from_pandas(pd.DataFrame({"v": [1]}))
    with pytest.raises(Exception):
        rest_api_write(ds, "http://api.test", transport=None)
