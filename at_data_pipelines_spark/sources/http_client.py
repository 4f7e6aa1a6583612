"""HTTP implementation of the ``BarClient`` protocol (SURVEY §2.1 S5/S6).

The reference wraps the Alpaca SDK (``pipelines/clients/alpaca.py:12-24``,
``pipelines/stock_prices_flow.py:26-55``), which under the hood issues
``GET /v2/stocks/bars`` requests with key/secret auth headers, pages via
``page_token``, and retries transient failures. This module implements
that transport surface directly against the *public* REST API shape so a
production user can fetch real bars without the SDK:

- **auth**: ``APCA-API-KEY-ID`` / ``APCA-API-SECRET-KEY`` headers;
- **pagination**: follow ``next_page_token`` until exhausted, stitching
  per-symbol bar lists across pages;
- **retry**: bounded exponential backoff on HTTP 429/5xx and transport
  errors; other 4xx raise immediately (auth/param bugs never spin);
- **injection**: the raw ``transport(url, headers) -> (status, body)``
  callable is a constructor argument, so tests exercise pagination and
  retry logic with canned responses and CI never touches the network
  (the default transport is stdlib ``urllib`` — no extra dependency).

The client is driver-side by design, matching the reference's
fetch-then-frame flow: one year-batch of bars at a time enters Spark via
``createDataFrame`` (see ``sources/rest.py``).
"""

from __future__ import annotations

import datetime as dt
import json
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable

import pandas as pd

# (url, headers) -> (http_status, response_body)
Transport = Callable[[str, dict[str, str]], tuple[int, bytes]]

_RETRYABLE = {429, 500, 502, 503, 504}


def _urllib_transport(url: str, headers: dict[str, str]) -> tuple[int, bytes]:
    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # non-2xx still carries a body
        return e.code, e.read()


class TransportError(RuntimeError):
    """Raised when the API keeps failing after all retries."""


class HttpBarClient:
    """Callable matching ``BarClient``: ``(tickers, start, end) ->
    pandas DataFrame`` with the ``BAR_SCHEMA`` columns.

    Parameters mirror the observable knobs of the reference's request
    (timeframe/adjustment/feed — ``pipelines/stock_prices_flow.py:31-38``).
    ``sleep`` is injectable so retry tests run instantly.
    """

    def __init__(
        self,
        api_key: str,
        secret_key: str,
        base_url: str = "https://data.alpaca.markets",
        timeframe: str = "1Day",
        adjustment: str = "all",
        feed: str = "iex",
        page_limit: int = 10_000,
        max_retries: int = 3,
        backoff_s: float = 0.5,
        transport: Transport | None = None,
        sleep: Callable[[float], None] | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.headers = {
            "APCA-API-KEY-ID": api_key,
            "APCA-API-SECRET-KEY": secret_key,
            "Accept": "application/json",
        }
        self.timeframe = timeframe
        self.adjustment = adjustment
        self.feed = feed
        self.page_limit = page_limit
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.transport = transport or _urllib_transport
        if sleep is None:
            import time

            sleep = time.sleep
        self.sleep = sleep

    # -- low level ---------------------------------------------------------
    def _get_json(self, url: str) -> dict:
        """One GET with bounded exponential backoff on retryable failures."""
        last = "no attempt"
        for attempt in range(self.max_retries + 1):
            if attempt:
                self.sleep(self.backoff_s * (2 ** (attempt - 1)))
            try:
                status, body = self.transport(url, self.headers)
            except OSError as e:  # DNS/conn reset — retryable transport fault
                last = f"transport error: {e}"
                continue
            if status == 200:
                return json.loads(body)
            last = f"HTTP {status}: {body[:200]!r}"
            if status not in _RETRYABLE:
                raise TransportError(f"non-retryable {last}")
        raise TransportError(f"gave up after {self.max_retries + 1} attempts; last: {last}")

    # -- bars --------------------------------------------------------------
    def __call__(self, tickers: list[str], start: dt.date, end: dt.date) -> pd.DataFrame:
        params = {
            "symbols": ",".join(sorted(tickers)),
            "start": f"{start.isoformat()}T00:00:00Z",
            "end": f"{end.isoformat()}T23:59:59Z",
            "timeframe": self.timeframe,
            "adjustment": self.adjustment,
            "feed": self.feed,
            "limit": str(self.page_limit),
        }
        rows: list[tuple] = []
        page_token: str | None = None
        while True:
            q = dict(params, **({"page_token": page_token} if page_token else {}))
            url = f"{self.base_url}/v2/stocks/bars?{urllib.parse.urlencode(q)}"
            payload = self._get_json(url)
            for symbol, bars in (payload.get("bars") or {}).items():
                for b in bars or []:
                    rows.append(
                        (
                            symbol,
                            dt.date.fromisoformat(b["t"][:10]),
                            float(b["o"]),
                            float(b["h"]),
                            float(b["l"]),
                            float(b["c"]),
                            float(b["v"]),
                            float(b.get("n", 0)),
                            float(b.get("vw", 0.0)),
                        )
                    )
            page_token = payload.get("next_page_token")
            if not page_token:
                break
        return pd.DataFrame(
            rows,
            columns=[
                "ticker", "date", "open", "high", "low",
                "close", "volume", "trade_count", "vwap",
            ],
        )
