"""The self-evidencing eval log (evidence.py): its normalization must
be byte-identical to the harness mirror ``tools/check_oracle._norm``
(the log's normalized values are only diagnostic if they reduce rows
exactly the way the driver's hash does), and every ``_run_union``
evaluation must leave a parseable JSONL record with full-precision raw
values — the round-8/9 flakes were unreproducible precisely because the
failing evaluations recorded nothing row-level."""

from __future__ import annotations

import datetime
import decimal
import json
import math
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

SF = "/root/testdata/sf0.001"

_BATTERY = [
    None,
    0,
    -7,
    12345678901234567,
    "plain",
    "",
    "with|pipe",
    0.0,
    -0.0,
    1.5,
    2.675,
    -123.456789123,
    1e-9,
    1e17,
    float("nan"),
    float("inf"),
    decimal.Decimal("0"),
    decimal.Decimal("0.000000"),
    decimal.Decimal("-12.30"),
    datetime.date(2024, 2, 29),
    datetime.datetime(2024, 2, 29, 23, 59, 59, 123456),
    datetime.datetime(
        2024, 6, 1, 12, 0, 0, tzinfo=datetime.timezone.utc
    ),
    datetime.datetime(
        2024, 6, 1, 12, 0, 0,
        tzinfo=datetime.timezone(datetime.timedelta(hours=-5)),
    ),
    [1, 2.5, "x"],
    [],
    [[1.0], [float("nan")]],
    True,
    False,
]


def test_norm_matches_check_oracle_norm():
    from check_oracle import _norm

    from polygon_daily_market_data_pipeline_spark.evidence import norm_value

    for v in _BATTERY:
        for side in (True, False):
            got, want = norm_value(v, side), _norm(v, spark_side=side)
            assert got == want, (v, side, got, want)


def test_fingerprint_matches_check_oracle_fingerprint():
    from check_oracle import fingerprint as oracle_fp

    from polygon_daily_market_data_pipeline_spark.evidence import fingerprint

    cols = ["check_name", "n_rows", "n_aux", "val"]
    rows = [
        ("a_check", 10, 1, 123.45),
        ("b_check", 0, 0, float("nan")),
        ("c_check", 7, 2, -0.005),
    ]
    for side in (True, False):
        assert fingerprint(cols, rows, side) == oracle_fp(
            cols, rows, spark_side=side
        )
    # order-insensitive in rows, sensitive to values
    assert fingerprint(cols, rows) == fingerprint(cols, rows[::-1])
    bumped = [rows[0][:3] + (123.450001,)] + rows[1:]
    assert fingerprint(cols, rows) != fingerprint(cols, bumped)


def test_log_eval_appends_jsonl_and_prints(tmp_path, monkeypatch, capsys):
    from polygon_daily_market_data_pipeline_spark.evidence import log_eval

    log = tmp_path / "eval.jsonl"
    monkeypatch.setenv("WAREHOUSE_EVAL_LOG", str(log))
    rows = [("x_check", 3, 1, 1.23456789), ("y_check", 0, 0, 0.0)]
    cols = ["check_name", "n_rows", "n_aux", "val"]
    fp1 = log_eval("q1", "/some/sf", cols, rows)
    fp2 = log_eval("q1", "/some/sf", cols, rows)
    assert fp1 == fp2
    out = capsys.readouterr().out
    assert f"fp={fp1}" in out and "query=q1" in out
    lines = [json.loads(x) for x in log.read_text().splitlines()]
    assert len(lines) == 2
    rec = lines[0]
    assert rec["query"] == "q1" and rec["fingerprint"] == fp1
    assert rec["cols"] == cols
    # raw keeps full precision, norm is the 6dp driver reduction
    assert rec["rows"][0]["raw"][3] == repr(1.23456789)
    assert rec["rows"][0]["norm"][3] == "1.234568"
    assert rec["pid"] == os.getpid()


def test_log_eval_compact_census_mode(tmp_path, monkeypatch):
    """detail=False (daily_change_pct's 2399-row census): per-column
    digests ride the record instead of per-row payloads; the digests
    attribute a mismatch to a named column and differ when one value
    moves."""
    from polygon_daily_market_data_pipeline_spark.evidence import (
        col_digests,
        log_eval,
    )

    log = tmp_path / "eval.jsonl"
    monkeypatch.setenv("WAREHOUSE_EVAL_LOG", str(log))
    cols = ["trade_date", "tv_c", "change_ppm"]
    rows = [("2024-01-05", 123456, 0), ("2024-01-06", 130000, 53011)]
    fp = log_eval("dcp", "/sf", cols, rows, detail=False)
    rec = json.loads(log.read_text().splitlines()[0])
    assert rec["fingerprint"] == fp and rec["n_rows"] == 2
    assert "rows" not in rec
    assert rec["col_digests"] == col_digests(cols, rows)
    # digest is column-attributable: bump one cell, only its column moves
    bumped = [rows[0], ("2024-01-06", 130000, 53012)]
    d0, d1 = col_digests(cols, rows), col_digests(cols, bumped)
    assert d0["tv_c"] == d1["tv_c"] and d0["trade_date"] == d1["trade_date"]
    assert d0["change_ppm"] != d1["change_ppm"]
    # digests are row-order-insensitive like the fingerprint
    assert col_digests(cols, rows[::-1]) == d0


def test_log_eval_never_raises_on_unwritable_sink(monkeypatch, capsys):
    from polygon_daily_market_data_pipeline_spark.evidence import log_eval

    monkeypatch.setenv(
        "WAREHOUSE_EVAL_LOG", "/nonexistent-dir/nope/eval.jsonl"
    )
    fp = log_eval("q", "/sf", ["check_name", "val"], [("c", 1.0)])
    assert f"fp={fp}" in capsys.readouterr().out
    # empty value disables the sink entirely, stdout line remains
    monkeypatch.setenv("WAREHOUSE_EVAL_LOG", "")
    fp = log_eval("q", "/sf", ["check_name", "val"], [("c", 1.0)])
    assert f"fp={fp}" in capsys.readouterr().out


def test_log_rotation_keeps_two_windows(tmp_path, monkeypatch):
    from polygon_daily_market_data_pipeline_spark import evidence
    from polygon_daily_market_data_pipeline_spark.evidence import log_eval

    log = tmp_path / "eval.jsonl"
    monkeypatch.setenv("WAREHOUSE_EVAL_LOG", str(log))
    monkeypatch.setattr(evidence, "_ROTATE_BYTES", 500)
    cols = ["check_name", "val"]
    for i in range(20):
        log_eval(f"q{i}", "/sf", cols, [("c", float(i))])
    prev = tmp_path / "eval.jsonl.prev"
    assert prev.exists() and log.exists()
    # every record lives in exactly one of the two windows, none lost
    # beyond the single retired generation
    names = [
        json.loads(x)["query"]
        for p in (prev, log)
        for x in p.read_text().splitlines()
    ]
    assert names[-1] == "q19" and len(names) == len(set(names))
    assert log.stat().st_size < 600


def test_run_union_writes_eval_record(spark, tmp_path, monkeypatch):
    """An actual registered-query evaluation (smallest branch: packing,
    one audit row over sf0.001 documents) leaves a complete log record
    whose normalized values match what a caller's own collect sees."""
    from check_oracle import _norm

    from polygon_daily_market_data_pipeline_spark.plans.warehouse_ops import (
        _run_union,
    )

    log = tmp_path / "eval.jsonl"
    monkeypatch.setenv("WAREHOUSE_EVAL_LOG", str(log))
    df = _run_union(spark, SF, ["packing"], name="eval_probe")
    got = [tuple(r) for r in df.collect()]
    recs = [json.loads(x) for x in log.read_text().splitlines()]
    assert len(recs) == 1
    rec = recs[0]
    assert rec["query"] == "eval_probe" and rec["sf_dir"] == SF
    assert len(rec["rows"]) == len(got) == 1
    assert rec["rows"][0]["norm"] == [
        _norm(v, spark_side=True) for v in got[0]
    ]
    assert not math.isnan(float(rec["rows"][0]["raw"][3]))
    # round 11: the record carries the code version and BOTH halves of
    # the evaluation — the local DuckDB oracle must have run and agreed
    assert rec["sha"] not in ("", None)
    assert rec["oracle_match"] is True
    assert rec["oracle_fingerprint"] == rec["fingerprint"]
    assert len(rec["oracle_rows"]) == len(rec["rows"])


def test_log_eval_oracle_env_gate(tmp_path, monkeypatch):
    """WAREHOUSE_ORACLE_EVAL=0 (bench's timed runs) must skip the
    in-evaluation oracle entirely; a broken oracle SQL must degrade to
    an error field, never an exception."""
    from polygon_daily_market_data_pipeline_spark.evidence import log_eval

    log = tmp_path / "eval.jsonl"
    monkeypatch.setenv("WAREHOUSE_EVAL_LOG", str(log))
    monkeypatch.setenv("WAREHOUSE_ORACLE_EVAL", "0")
    cols = ["check_name", "n_rows", "n_aux", "val"]
    log_eval("q", "/sf", cols, [("c", 1, 1, 2)], oracle_sql="SELECT 1")
    monkeypatch.setenv("WAREHOUSE_ORACLE_EVAL", "1")
    log_eval(
        "q", "/sf", cols, [("c", 1, 1, 2)], oracle_sql="SELECT nope FROM"
    )
    recs = [json.loads(x) for x in log.read_text().splitlines()]
    assert "oracle_fingerprint" not in recs[0]
    assert "oracle_error" not in recs[0]
    assert "oracle_error" in recs[1] and "oracle_match" not in recs[1]


def test_eval_log_diff_reads_both_windows_and_filters_by_sha(tmp_path):
    """tools/eval_log_diff must see records across the rotation
    boundary (.prev + current) and restrict by code version with
    --sha — fingerprints are only comparable within one (ADVICE r10 /
    VERDICT r10 #3)."""
    import sys
    from pathlib import Path

    sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "tools")
    )
    import eval_log_diff as eld

    log = tmp_path / "log.jsonl"
    prev = tmp_path / "log.jsonl.prev"

    def rec(sha, fp, sf="/sf0.01"):
        return json.dumps(
            {
                "query": "q",
                "sf_dir": sf,
                "sha": sha,
                "fingerprint": fp,
                "cols": ["check_name", "val"],
                "rows": [{"raw": ["'c'", "1"], "norm": ["c", "1"]}],
            }
        )

    prev.write_text(rec("aaa", "fp_old") + "\n")
    log.write_text(rec("bbb", "fp_new") + "\n" + rec("bbb", "fp_new") + "\n")
    both = eld.load(log, "q", "")
    assert [r["sha"] for r in both] == ["aaa", "bbb", "bbb"]  # prev first
    only_b = eld.load(log, "q", "", sha="bbb")
    assert {r["fingerprint"] for r in only_b} == {"fp_new"}
    assert eld.load(log, "q", "sf0.001") == []


def test_eval_log_diff_compact_branch_names_unattributable_cases(
    tmp_path, capsys
):
    """ADVICE r14: the compact (col_digests) diff branch must (a) name
    the fingerprints-differ-but-all-digests-match case explicitly —
    reachable because digests hash each column SORTED independently, so
    a cross-column re-pairing of values moves the row fingerprint while
    every column digest stays equal — and (b) refuse per-column
    comparison across the r15 8→16-hex digest-width boundary instead of
    printing every column as differing."""
    import sys
    from pathlib import Path

    sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "tools")
    )
    import eval_log_diff as eld

    def rec(fp, digests):
        return {
            "query": "q",
            "sf_dir": "/sf0.01",
            "sha": "aaa",
            "fingerprint": fp,
            "cols": list(digests),
            "col_digests": digests,
        }

    # (a) same digests, different fingerprints — re-pairing / collision
    recs = [
        rec("fp_major", {"a": "11111111", "b": "22222222"}),
        rec("fp_major", {"a": "11111111", "b": "22222222"}),
        rec("fp_minor", {"a": "11111111", "b": "22222222"}),
    ]
    eld.census_and_diff(recs, "q", "/sf0.01")
    out = capsys.readouterr().out
    assert "cross-column re-pairing" in out, out

    # (b) mixed widths (pre-r15 8-hex vs 16-hex records)
    recs = [
        rec("fp_major", {"a": "1111111111111111", "b": "2222222222222222"}),
        rec("fp_major", {"a": "1111111111111111", "b": "2222222222222222"}),
        rec("fp_old", {"a": "11111111", "b": "22222222"}),
    ]
    eld.census_and_diff(recs, "q", "/sf0.01")
    out = capsys.readouterr().out
    assert "digest widths" in out and "column a" not in out, out

    # and the normal case still attributes to the named column
    recs = [
        rec("fp_major", {"a": "1111111111111111", "b": "2222222222222222"}),
        rec("fp_major", {"a": "1111111111111111", "b": "2222222222222222"}),
        rec("fp_min2", {"a": "1111111111111111", "b": "3333333333333333"}),
    ]
    eld.census_and_diff(recs, "q", "/sf0.01")
    out = capsys.readouterr().out
    assert "column b" in out and "column a" not in out, out
