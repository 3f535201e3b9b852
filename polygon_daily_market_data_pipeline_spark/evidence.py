"""Self-evidencing evaluation log for the warehouse audit queries.

Rounds 8 and 9 each ended with ONE driver-red warehouse query that no
other evaluation (judge x5, bench per-row at two scale factors, pytest
3x-repeat) could reproduce — and the failing evaluation itself left no
row-level record, so the divergent row stayed unknown both times. This
module closes that gap at the source: ``_run_union`` calls
:func:`log_eval` on EVERY evaluation — the driver's included — so the
next mismatch is diffable to a named row from the committed log without
any reproduction attempt.

What gets recorded per evaluation, per audit row:

* the raw values exactly as collected (``repr`` of the float ``val``
  keeps full precision — a rounding-boundary flake is visible as a
  last-ULP difference the 6dp normalization would mask), and
* the driver-normalized string (floats at 6dp — the same reduction
  ``tools/check_oracle._norm`` applies; the two implementations are
  pinned equal by ``tests/test_evidence.py``), and
* a row fingerprint (sha256 over the sorted normalized lines, the same
  construction as ``check_oracle.fingerprint``), printed to stdout as
  well so the driver's own output tail carries it.

Round 11 (VERDICT r10 #2/#3) adds two fields that bound the remaining
driver-only flake class conclusively:

* ``sha`` — the repo's git HEAD at module import, so fingerprint
  generations partition by code version instead of by row-set
  inference (``tools/eval_log_diff.py --sha``), and
* the ORACLE half: unless ``WAREHOUSE_ORACLE_EVAL=0``, every
  evaluation also runs the query's composed DuckDB oracle locally over
  the same sf_dir parquet and appends its rows + fingerprint beside
  the Spark ones (``oracle_fingerprint`` / ``oracle_match``). The next
  driver red then shows BOTH halves of what the repo computed at that
  moment: if repo-DuckDB matches repo-Spark and the driver still reds,
  the fault is conclusively in the driver harness's own
  DuckDB/hasher. bench.py sets the env to 0 for its TIMED runs only —
  its per-row dual artifact (tools/warehouse_rows.py) already records
  both sides there, and the suite timing must not carry the oracle's
  cost.

The sink is append-only JSONL at the repo root
(``WAREHOUSE_EVAL_LOG.jsonl``, committed each round); override with the
``WAREHOUSE_EVAL_LOG`` env var, disable with an empty value. Appends
are a single ``os.write`` on an ``O_APPEND`` fd under ``flock``, so
concurrent processes cannot interleave partial lines, and rotation is
serialized through a sidecar lock (ADVICE r10). Logging must never
break an evaluation: every failure mode degrades to stdout-only or
silence.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

_LOG_ENV = "WAREHOUSE_EVAL_LOG"
_ORACLE_ENV = "WAREHOUSE_ORACLE_EVAL"
_DEFAULT_LOG = Path(__file__).resolve().parent.parent / "WAREHOUSE_EVAL_LOG.jsonl"

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

_GIT_SHA: "str | None" = None


def git_sha() -> str:
    """The repo HEAD at first call, cached for the process (one
    subprocess — VERDICT r10 'What's wrong #3'). Degrades to
    'unknown'; never raises."""
    global _GIT_SHA
    if _GIT_SHA is None:
        try:
            import subprocess

            _GIT_SHA = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                cwd=Path(__file__).resolve().parent.parent,
                capture_output=True,
                text=True,
                timeout=10,
            ).stdout.strip() or "unknown"
        except Exception:  # noqa: BLE001
            _GIT_SHA = "unknown"
    return _GIT_SHA


def norm_value(v, spark_side: bool = True) -> str:
    """Exact mirror of ``tools/check_oracle._norm`` (the driver-style
    normalization). Kept in the package so registered queries never
    import from ``tools/``; ``tests/test_evidence.py`` pins the two
    implementations equal over a value battery."""
    import datetime
    import decimal
    import math

    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        if spark_side and v.tzinfo is None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        elif v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm_value(x, spark_side) for x in v) + "]"
    return str(v)


def fingerprint(cols, rows, spark_side: bool = True) -> str:
    """Order-insensitive row fingerprint — same construction as
    ``check_oracle.fingerprint`` (sort columns by name, normalize each
    cell, sort the joined lines, sha256, 16 hex chars)."""
    import hashlib

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_value(r[i], spark_side) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def _log_path() -> "Path | None":
    raw = os.environ.get(_LOG_ENV)
    if raw is not None:
        return Path(raw) if raw.strip() else None
    return _DEFAULT_LOG


def _oracle_half(sf_dir: str, oracle_sql: str, detail: bool = True) -> dict:
    """Run the composed DuckDB oracle locally over the sf_dir parquet
    (same view registration as tools/check_oracle.py) and return the
    loggable half-record (row payloads when ``detail``, per-column
    digests otherwise). Any failure degrades to an error field."""
    try:
        import duckdb

        t0 = time.monotonic()
        con = duckdb.connect()
        for t in _TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        rel = con.sql(oracle_sql)
        ocols = [d[0] for d in rel.description]
        orows = rel.fetchall()
        out = {
            "oracle_fingerprint": fingerprint(
                ocols, orows, spark_side=False
            ),
            "oracle_secs": round(time.monotonic() - t0, 3),
        }
        if detail:
            out["oracle_rows"] = [
                {
                    "raw": [repr(v) for v in r],
                    "norm": [norm_value(v, spark_side=False) for v in r],
                }
                for r in orows
            ]
        else:
            out["oracle_col_digests"] = col_digests(
                ocols, orows, spark_side=False
            )
        return out
    except Exception as exc:  # noqa: BLE001 — never break an evaluation
        return {"oracle_error": f"{type(exc).__name__}: {exc}"}


def col_digests(cols, rows, spark_side: bool = True) -> "dict[str, str]":
    """Per-column fingerprint: sha256 over that column's SORTED
    normalized values, 16 hex chars (widened from 8 in round 15 —
    ADVICE r14: at 32 bits a digest collision leaves a fingerprint
    divergence with zero attributable columns; 64 bits puts a
    collision beyond the flake-investigation horizon). The compact
    census for large result sets (``detail=False``): a later mismatch
    is attributable to a named COLUMN without storing 2k+ row payloads
    per evaluation. Note the per-column sort: a change that re-PAIRS
    values across rows keeps every column digest equal while the row
    fingerprint moves — ``tools/eval_log_diff.py`` names that case
    explicitly."""
    import hashlib

    out = {}
    for i, c in enumerate(cols):
        h = hashlib.sha256()
        for line in sorted(norm_value(r[i], spark_side) for r in rows):
            h.update(line.encode())
            h.update(b"\n")
        out[c] = h.hexdigest()[:16]
    return out


def log_eval(
    query: str,
    sf_dir: str,
    cols,
    rows,
    oracle_sql: "str | None" = None,
    detail: bool = True,
) -> str:
    """Record one evaluation of a warehouse query: append a JSONL line
    to the eval log and print the fingerprint to stdout. Returns the
    (Spark-side) fingerprint. When ``oracle_sql`` is given and
    ``WAREHOUSE_ORACLE_EVAL`` != 0, the DuckDB oracle runs locally too
    and its fingerprint rides the same record. ``detail=False`` (the
    round-14 census mode for row-heavy queries like
    ``daily_change_pct``, 2399 rows) records per-column digests
    instead of per-row payloads — column-attributable, bounded size.
    Never raises — an unwritable log degrades to the stdout line
    alone."""
    fp = fingerprint(cols, rows, spark_side=True)
    record = {
        "query": query,
        "sf_dir": sf_dir,
        "pid": os.getpid(),
        "sha": git_sha(),
        "ts": round(time.time(), 3),
        "monotonic": round(time.monotonic(), 3),
        "fingerprint": fp,
        "cols": list(cols),
        "n_rows": len(rows),
    }
    if detail:
        # raw repr keeps full float precision; norm is what the hash sees
        record["rows"] = [
            {
                "raw": [repr(v) for v in r],
                "norm": [norm_value(v, spark_side=True) for v in r],
            }
            for r in rows
        ]
    else:
        record["col_digests"] = col_digests(cols, rows, spark_side=True)
    tail = ""
    if oracle_sql is not None and os.environ.get(_ORACLE_ENV, "1") != "0":
        half = _oracle_half(sf_dir, oracle_sql, detail=detail)
        record.update(half)
        if "oracle_fingerprint" in record:
            record["oracle_match"] = (
                record["oracle_fingerprint"] == fp
            )
            tail = (
                f" oracle_fp={record['oracle_fingerprint']}"
                f" oracle_match={record['oracle_match']}"
            )
        else:
            tail = " oracle_fp=ERROR"
    print(
        f"WAREHOUSE_EVAL query={query} sf={sf_dir} pid={os.getpid()} "
        f"rows={len(rows)} fp={fp}{tail}",
        flush=True,
    )
    try:
        path = _log_path()
        if path is not None:
            _rotate_if_large(path)
            _append_line(path, json.dumps(record, separators=(",", ":")))
    except OSError:
        pass
    return fp


def _append_line(path: Path, line: str) -> None:
    """One whole JSONL line per append: a single ``os.write`` on an
    ``O_APPEND`` fd under ``flock``, so a record larger than the stdio
    buffer can never interleave with another process's append (ADVICE
    r10). flock is advisory but every writer is this function."""
    data = (line + "\n").encode("utf-8")
    fd = os.open(str(path), os.O_WRONLY | os.O_APPEND | os.O_CREAT, 0o644)
    try:
        try:
            import fcntl

            fcntl.flock(fd, fcntl.LOCK_EX)
        except Exception:  # noqa: BLE001 — fcntl-less platform: O_APPEND alone
            pass
        os.write(fd, data)
    finally:
        os.close(fd)


_ROTATE_BYTES = 4 * 1024 * 1024


def _rotate_if_large(path: Path) -> None:
    """Bound the committed log: past ~4 MB (thousands of evaluations)
    the current file becomes ``<name>.prev`` (replacing the previous
    generation) and a fresh one starts — the current and prior windows
    are always retained, which is what a flake investigation needs.
    Rotation is serialized through a sidecar lock file and the size is
    re-checked under the lock, so two processes crossing the threshold
    together rotate exactly once (ADVICE r10: the unserialized race
    could silently drop a whole generation)."""
    try:
        if not (path.exists() and path.stat().st_size >= _ROTATE_BYTES):
            return
        lock = path.with_suffix(path.suffix + ".lock")
        fd = os.open(str(lock), os.O_WRONLY | os.O_CREAT, 0o644)
        try:
            try:
                import fcntl

                fcntl.flock(fd, fcntl.LOCK_EX)
            except Exception:  # noqa: BLE001
                pass
            if path.exists() and path.stat().st_size >= _ROTATE_BYTES:
                path.replace(path.with_suffix(path.suffix + ".prev"))
        finally:
            os.close(fd)
    except OSError:
        pass
