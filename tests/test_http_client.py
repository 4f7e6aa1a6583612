"""HttpBarClient: pagination, retry/backoff, auth headers, error paths —
all through an injected fake transport (no network)."""

from __future__ import annotations

import datetime as dt
import json
import urllib.parse

import pytest

from at_data_pipelines_spark.sources.http_client import HttpBarClient, TransportError
from at_data_pipelines_spark.sources.rest import BAR_SCHEMA, fetch_daily_bars_batched


def _bar(day: str, o=1.0):
    return {"t": f"{day}T05:00:00Z", "o": o, "h": o + 1, "l": o - 1, "c": o, "v": 100, "n": 5, "vw": o}


class FakeTransport:
    """Scripted (status, payload) responses; records every request."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.requests: list[tuple[str, dict]] = []

    def __call__(self, url, headers):
        self.requests.append((url, dict(headers)))
        status, payload = self.responses.pop(0)
        body = json.dumps(payload).encode() if isinstance(payload, dict) else payload
        return status, body


def _client(transport, **kw):
    return HttpBarClient(
        "key-id", "secret", transport=transport, sleep=lambda s: None, **kw
    )


def test_pagination_stitches_pages_and_sends_auth():
    t = FakeTransport(
        [
            (200, {"bars": {"AAPL": [_bar("2024-01-02")]}, "next_page_token": "tok1"}),
            (200, {"bars": {"AAPL": [_bar("2024-01-03")], "MSFT": [_bar("2024-01-02", 9.0)]},
                   "next_page_token": None}),
        ]
    )
    pdf = _client(t)(["AAPL", "MSFT"], dt.date(2024, 1, 1), dt.date(2024, 12, 31))
    assert len(pdf) == 3
    assert set(pdf.ticker) == {"AAPL", "MSFT"}
    # page 2 carried the token; page 1 did not
    q1 = urllib.parse.parse_qs(urllib.parse.urlparse(t.requests[0][0]).query)
    q2 = urllib.parse.parse_qs(urllib.parse.urlparse(t.requests[1][0]).query)
    assert "page_token" not in q1 and q2["page_token"] == ["tok1"]
    assert q1["symbols"] == ["AAPL,MSFT"]
    for _, headers in t.requests:
        assert headers["APCA-API-KEY-ID"] == "key-id"
        assert headers["APCA-API-SECRET-KEY"] == "secret"


def test_retry_on_429_then_success_with_backoff():
    sleeps = []
    t = FakeTransport(
        [
            (429, b"slow down"),
            (503, b"unavailable"),
            (200, {"bars": {"AAPL": [_bar("2024-01-02")]}, "next_page_token": None}),
        ]
    )
    c = HttpBarClient("k", "s", transport=t, sleep=sleeps.append, backoff_s=0.5)
    pdf = c(["AAPL"], dt.date(2024, 1, 1), dt.date(2024, 1, 31))
    assert len(pdf) == 1
    assert sleeps == [0.5, 1.0]  # exponential


def test_non_retryable_4xx_raises_immediately():
    t = FakeTransport([(403, b"forbidden")])
    with pytest.raises(TransportError, match="non-retryable"):
        _client(t)(["AAPL"], dt.date(2024, 1, 1), dt.date(2024, 1, 31))
    assert len(t.requests) == 1  # no retry spin on auth errors


def test_gives_up_after_max_retries():
    t = FakeTransport([(500, b"boom")] * 4)
    with pytest.raises(TransportError, match="gave up"):
        _client(t)(["AAPL"], dt.date(2024, 1, 1), dt.date(2024, 1, 31))
    assert len(t.requests) == 4  # initial + 3 retries


def test_transport_oserror_is_retried():
    calls = {"n": 0}

    def flaky(url, headers):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConnectionResetError("reset")
        return 200, json.dumps({"bars": {}, "next_page_token": None}).encode()

    pdf = _client(flaky)(["AAPL"], dt.date(2024, 1, 1), dt.date(2024, 1, 31))
    assert len(pdf) == 0 and calls["n"] == 2


def test_plugs_into_year_batched_fetch(spark):
    """End-to-end: the HTTP client satisfies the BarClient protocol used by
    fetch_daily_bars_batched (one request per calendar year here)."""
    t = FakeTransport(
        [
            (200, {"bars": {"AAPL": [_bar("2023-06-01")]}, "next_page_token": None}),
            (200, {"bars": {"AAPL": [_bar("2024-01-02")]}, "next_page_token": None}),
        ]
    )
    df = fetch_daily_bars_batched(
        spark, _client(t), ["AAPL"], dt.date(2023, 1, 1), dt.date(2024, 12, 31)
    )
    assert df.schema == BAR_SCHEMA
    assert df.count() == 2
    assert len(t.requests) == 2
