"""Unit tests: the driver-side HTTP ingest client (S1–S6) with an
injected fake transport — no network, mirroring the reference's
retry/backoff, envelope DQ, lookback, and idempotent landing."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from polygon_daily_market_data_pipeline_spark.sources import polygon_api as api


def _ok_body(n=150):
    return json.dumps(
        {
            "resultsCount": n,
            "results": [
                {"T": f"S{i}", "o": 1.0, "h": 2.0, "l": 0.5, "c": 1.5, "v": 100 + i}
                for i in range(n)
            ],
        }
    )


def test_retry_backoff_on_5xx_then_success():
    calls = []

    def transport(url, params):
        calls.append(url)
        status = 503 if len(calls) < 3 else 200
        return api.HttpResponse(status, _ok_body())

    sleeps = []
    resp = api.fetch_with_retry("u", {}, transport=transport, sleep=sleeps.append)
    assert resp.status == 200 and len(calls) == 3
    assert sleeps == [1.0, 2.0]  # backoff_factor * 2**attempt


def test_retry_gives_up_after_max():
    def transport(url, params):
        return api.HttpResponse(429, "")

    resp = api.fetch_with_retry("u", {}, transport=transport, sleep=lambda s: None)
    assert resp.status == 429


def test_envelope_dq_gates():
    with pytest.raises(api.EmptyTradingDay):
        api.extract_results(json.dumps({"resultsCount": 0, "results": []}))
    with pytest.raises(api.TooFewTickers):
        api.extract_results(_ok_body(50))
    assert len(api.extract_results(_ok_body(150))) == 150


def test_lookback_walks_to_prior_trading_day():
    sat = dt.date(2024, 1, 6)

    def transport(url, params):
        if "2024-01-05" in url:  # Friday has data
            return api.HttpResponse(200, _ok_body())
        return api.HttpResponse(200, json.dumps({"resultsCount": 0, "results": []}))

    found, results = api.download_with_lookback(sat, "key", transport=transport)
    assert found == dt.date(2024, 1, 5) and len(results) == 150


def test_csv_serialization_and_idempotent_landing(tmp_path):
    results = [{"T": "AAPL", "o": 1, "h": 2, "l": 0.5, "c": 1.5, "v": 9}]
    csv_text = api.results_to_csv(dt.date(2024, 1, 5), results)
    lines = csv_text.strip().splitlines()
    assert lines[0] == "trade_date,symbol,open,high,low,close,volume"
    assert lines[1] == "2024-01-05,AAPL,1,2,0.5,1.5,9"

    p = str(tmp_path / "market/bronze/eod/eod_prices_2024-01-05.csv")
    assert api.land_csv(p, csv_text) is True
    assert api.land_csv(p, "other") is False          # skip-if-exists
    assert open(p).read() == csv_text                 # unchanged
    assert api.land_csv(p, "other", replace=True) is True


def test_polygon_eod_datasource(spark):
    from polygon_daily_market_data_pipeline_spark.sources import polygon_datasource

    polygon_datasource.register(spark)
    # 2024-01-05 Fri, 06/07 weekend, 08 Mon → 2 trading days
    df = (
        spark.read.format("polygon_eod")
        .option("start", "2024-01-05")
        .option("end", "2024-01-08")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # one InputPartition per date
    rows = df.count()
    assert rows == 2 * 120
    assert dict(df.dtypes)["trade_date"] == "date"
    assert df.where("trade_date = '2024-01-06'").count() == 0  # weekend empty
    # deterministic replay: same plan, same data
    again = (
        spark.read.format("polygon_eod")
        .option("start", "2024-01-05")
        .option("end", "2024-01-08")
        .load()
    )
    assert sorted(df.collect()) == sorted(again.collect())


def test_polygon_eod_datasource_dq_floor(spark):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from polygon_daily_market_data_pipeline_spark.sources import polygon_datasource

    polygon_datasource.register(spark)
    df = (
        spark.read.format("polygon_eod")
        .option("dates", "2024-01-05")
        .option("num_tickers", "5")  # below the 100-ticker DQ floor
        .load()
    )
    with _pytest.raises(Exception) as ei:
        df.count()
    assert "TooFewTickers" in str(ei.value) or "resultsCount" in str(ei.value)


def test_trading_today_rolls_at_midnight_eastern():
    """F15 exchange-TZ semantics: the trading date flips at midnight
    America/New_York, not midnight UTC (eod_data_downloader.py:15,
    get_securities_data.py:103). At 00:30 UTC on July 2 it is still
    20:30 EDT July 1 — a UTC-date anchor would ingest a day that has
    not traded yet."""
    assert api.trading_today(
        dt.datetime(2026, 7, 2, 0, 30, tzinfo=dt.timezone.utc)
    ) == dt.date(2026, 7, 1)
    # after the ET rollover (04:00 UTC = 00:00 EDT) it is July 2
    assert api.trading_today(
        dt.datetime(2026, 7, 2, 4, 0, tzinfo=dt.timezone.utc)
    ) == dt.date(2026, 7, 2)
    # naive datetimes are interpreted as UTC
    assert api.trading_today(dt.datetime(2026, 7, 2, 0, 30)) == dt.date(2026, 7, 1)
    # winter (EST, UTC-5): rollover at 05:00 UTC
    assert api.trading_today(
        dt.datetime(2026, 1, 10, 4, 59, tzinfo=dt.timezone.utc)
    ) == dt.date(2026, 1, 9)


def test_download_latest_anchors_at_exchange_date():
    seen = []

    def transport(url, params):
        seen.append(url)
        return api.HttpResponse(200, _ok_body())

    # 01:00 UTC July 2 → ET trading date July 1 is the lookback anchor
    date, rows = api.download_latest(
        "k", transport=transport,
        now_utc=dt.datetime(2026, 7, 2, 1, 0, tzinfo=dt.timezone.utc),
    )
    assert date == dt.date(2026, 7, 1)
    assert "2026-07-01" in seen[0] and len(rows) == 150
