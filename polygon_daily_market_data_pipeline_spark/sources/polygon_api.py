"""Polygon-style EOD HTTP source (SURVEY.md §2.1 S1–S4).

Driver-side ingest client mirroring the reference downloader
(``/root/reference/dags/lib/eod_data_downloader.py``): grouped-daily
endpoint shape, retry/backoff transport, JSON envelope extraction with
min-cardinality DQ, lookback walk over non-trading days, and CSV
serialization into the landing zone.

Network access and the ``requests`` dependency are isolated behind
``transport`` so tests inject a fake; nothing here touches Spark — the
landing CSV is the Spark boundary (sources/csv_landing.py), matching
the reference where S3 CSV is the warehouse boundary.
"""

from __future__ import annotations

import csv
import datetime as dt
import io
import json
import time
from collections.abc import Callable
from dataclasses import dataclass

REQUEST_TIMEOUT = 30  # eod_data_downloader.py:16
MIN_EXPECTED_TICKERS = 100  # :17
RETRY_STATUS_CODES = (429, 500, 502, 503, 504)  # :18
MAX_RETRIES = 3  # :96-100
BACKOFF_FACTOR = 1.0
EXCHANGE_TZ = "America/New_York"  # eod_data_downloader.py:15; get_securities_data.py:14

GROUPED_DAILY_PATH = "/v2/aggs/grouped/locale/us/market/stocks/{date}"  # :66
POLYGON_FIELDS = ["T", "o", "h", "l", "c", "v"]  # :152
CSV_HEADER = ["trade_date", "symbol", "open", "high", "low", "close", "volume"]  # :153


class EmptyTradingDay(Exception):
    """No results for the date (weekend/holiday) — skip, don't fail."""


class TooFewTickers(Exception):
    """resultsCount below the DQ floor (eod_data_downloader.py:138-145)."""


@dataclass
class HttpResponse:
    status: int
    body: str


Transport = Callable[[str, dict], HttpResponse]


def _requests_transport(url: str, params: dict) -> HttpResponse:
    """Real transport — import-gated so the package loads without
    ``requests`` installed (this container has no network anyway)."""
    import requests  # noqa: PLC0415

    r = requests.get(url, params=params, timeout=REQUEST_TIMEOUT)
    return HttpResponse(status=r.status_code, body=r.text)


def fetch_with_retry(
    url: str,
    params: dict,
    transport: Transport = _requests_transport,
    sleep: Callable[[float], None] = time.sleep,
) -> HttpResponse:
    """S2: Retry(total=3, backoff_factor=1) on 429/5xx
    (eod_data_downloader.py:93-102)."""
    last: HttpResponse | None = None
    for attempt in range(MAX_RETRIES + 1):
        last = transport(url, params)
        if last.status not in RETRY_STATUS_CODES:
            return last
        if attempt < MAX_RETRIES:
            sleep(BACKOFF_FACTOR * (2**attempt))
    return last  # type: ignore[return-value]


def extract_results(body: str, min_tickers: int = MIN_EXPECTED_TICKERS) -> list[dict]:
    """S3: pull resultsCount/results; empty → EmptyTradingDay, fewer than
    ``min_tickers`` → TooFewTickers (eod_data_downloader.py:125-147)."""
    payload = json.loads(body)
    count = payload.get("resultsCount", 0)
    results = payload.get("results") or []
    if count == 0 or not results:
        raise EmptyTradingDay("resultsCount == 0")
    if count < min_tickers:
        raise TooFewTickers(f"resultsCount {count} < {min_tickers}")
    return results


def download_eod_for_date(
    date: dt.date,
    api_key: str,
    base_url: str = "https://api.polygon.io",
    transport: Transport = _requests_transport,
) -> list[dict]:
    """S1: GET grouped-daily aggs for one date with the reference's
    params (adjusted=true, include_otc=false — eod_data_downloader.py:67-71)."""
    url = base_url + GROUPED_DAILY_PATH.format(date=date.isoformat())
    params = {"adjusted": "true", "include_otc": "false", "apiKey": api_key}
    resp = fetch_with_retry(url, params, transport=transport)
    if resp.status != 200:
        raise RuntimeError(f"polygon request failed: HTTP {resp.status}")
    return extract_results(resp.body)


def trading_today(now_utc: dt.datetime | None = None) -> dt.date:
    """F15: 'today' in exchange-local time, NOT host/UTC time.

    The reference pins the trading calendar to ``America/New_York``
    (eod_data_downloader.py:15 ``pendulum.timezone``;
    get_securities_data.py:14,103 ``pendulum.today('America/New_York')``)
    so a daily run firing at 00:30 UTC still ingests the US trading
    date that just closed, not the not-yet-traded UTC date. Spark's
    session TZ stays UTC — only the ingest-driver date math is
    exchange-local.

    ``now_utc`` (an aware or naive-UTC datetime) is injectable for
    tests; default is the current wall clock."""
    from zoneinfo import ZoneInfo  # noqa: PLC0415 (stdlib; keeps module import light)

    tz = ZoneInfo(EXCHANGE_TZ)
    if now_utc is None:
        return dt.datetime.now(tz).date()
    if now_utc.tzinfo is None:
        now_utc = now_utc.replace(tzinfo=dt.timezone.utc)
    return now_utc.astimezone(tz).date()


def download_latest(
    api_key: str,
    lookback_days: int = 5,
    transport: Transport = _requests_transport,
    now_utc: dt.datetime | None = None,
) -> tuple[dt.date, list[dict]]:
    """The live daily entrypoint: lookback walk anchored at the
    exchange-local trading date (get_securities_data.py:103 anchors at
    ``pendulum.today('America/New_York')``)."""
    return download_with_lookback(
        trading_today(now_utc), api_key, lookback_days, transport=transport
    )


def download_with_lookback(
    end_date: dt.date,
    api_key: str,
    lookback_days: int = 5,
    transport: Transport = _requests_transport,
) -> tuple[dt.date, list[dict]]:
    """S4: walk back up to ``lookback_days`` until a date yields data —
    the holiday/weekend skip loop (eod_data_downloader.py:22-55)."""
    for back in range(lookback_days + 1):
        candidate = end_date - dt.timedelta(days=back)
        try:
            return candidate, download_eod_for_date(
                candidate, api_key, transport=transport
            )
        except EmptyTradingDay:
            continue
    raise EmptyTradingDay(
        f"no trading data within {lookback_days} days of {end_date}"
    )


def results_to_csv(trade_date: dt.date, results: list[dict]) -> str:
    """S5: serialize results to the landing CSV (header + rows, fields
    [T,o,h,l,c,v] prefixed with the trade date —
    eod_data_downloader.py:150-163)."""
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerow(CSV_HEADER)
    for r in results:
        w.writerow([trade_date.isoformat()] + [r.get(f, "") for f in POLYGON_FIELDS])
    return buf.getvalue()


def land_csv(path: str, content: str, replace: bool = False) -> bool:
    """S6: idempotent landing write — skip if exists unless replace
    (check_for_key / load_string(replace=False),
    get_securities_data.py:117-132). Returns True if written."""
    import os

    if os.path.exists(path) and not replace:
        return False
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)
    return True
