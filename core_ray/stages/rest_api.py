"""REST API destination: rate-limited bounded-concurrency micro-batch POST.

Reference ``destinations/spark/rest_api.py:39,173-225``: each row is JSON-ified,
rows are packed into ceil(n/batch_size) payloads joined with ``",|"``, the
payload set is repartitioned to ``parallelism`` and each partition executes
the HTTP call.  Here the bounded concurrency is an ACTOR POOL
(``map_batches(cls, concurrency=parallelism)``) and each actor applies a
token-bucket rate limit sized to ``rate_limit_per_sec / parallelism`` so the
aggregate request rate is bounded no matter how many rows stream through.

No network exists in this sandbox, so the default transport must be injected
(tests use a recording mock); with none provided the stage raises on first
use.  A real deployment passes ``transport=requests_transport(headers)``.
"""

from __future__ import annotations

import json
import time

import pandas as pd

import ray.data


def requests_transport(headers: dict | None = None, method: str = "POST"):
    """Real HTTP transport (import-gated: requests is absent in-sandbox)."""
    import requests  # noqa: F401  (raises ImportError where unavailable)

    def send(url: str, payload: str) -> int:
        resp = requests.request(method, url, data=payload, headers=headers or {})
        return resp.status_code

    return send


class _RestPoster:
    """Actor: posts packed payloads with a local token bucket."""

    def __init__(self, url: str, batch_size: int, rate_per_actor: float, transport):
        if transport is None:
            raise ValueError(
                "rest_api_write needs a transport callable (no network in-sandbox; "
                "use requests_transport(...) in a real deployment)"
            )
        self.url = url
        self.batch_size = batch_size
        self.rate = rate_per_actor
        self.transport = transport
        self._allowance = rate_per_actor
        self._last = time.monotonic()

    def _throttle(self) -> None:
        if self.rate <= 0:
            return
        now = time.monotonic()
        self._allowance = min(
            self.rate, self._allowance + (now - self._last) * self.rate
        )
        self._last = now
        if self._allowance < 1.0:
            wait = (1.0 - self._allowance) / self.rate
            time.sleep(wait)
            self._allowance = 0.0
        else:
            self._allowance -= 1.0

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        contents = [json.dumps(rec, default=str) for rec in df.to_dict("records")]
        codes, sizes = [], []
        for i in range(0, len(contents), self.batch_size):
            payload = ",|".join(contents[i : i + self.batch_size])
            self._throttle()
            codes.append(int(self.transport(self.url, payload)))
            sizes.append(min(self.batch_size, len(contents) - i))
        return pd.DataFrame({"response_code": codes, "rows_sent": sizes})


def rest_api_write(
    ds: ray.data.Dataset,
    url: str,
    batch_size: int = 100,
    parallelism: int = 8,
    rate_limit_per_sec: float = 0.0,
    transport=None,
) -> dict:
    """Write every row of ``ds`` to the API; returns delivery stats.

    ``rate_limit_per_sec`` caps the AGGREGATE request rate across the actor
    pool (0 = unlimited).  Consumes the dataset streaming — payload rows never
    collect on the driver, only per-request status codes do."""
    per_actor = rate_limit_per_sec / parallelism if rate_limit_per_sec else 0.0
    results = ds.map_batches(
        _RestPoster,
        fn_constructor_args=(url, batch_size, per_actor, transport),
        batch_format="pandas",
        concurrency=parallelism,
    ).to_pandas()  # bounded: per-request status codes
    ok = (results["response_code"] >= 200) & (results["response_code"] < 300)
    return {
        "requests": int(len(results)),
        "rows_sent": int(results["rows_sent"].sum()),
        "failed_requests": int((~ok).sum()),
    }
