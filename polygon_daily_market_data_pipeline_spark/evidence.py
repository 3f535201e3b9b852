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

The sink is append-only JSONL at the repo root
(``WAREHOUSE_EVAL_LOG.jsonl``, committed each round); override with the
``WAREHOUSE_EVAL_LOG`` env var, disable with an empty value. Logging
must never break an evaluation: every failure mode degrades to
stdout-only or silence.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

_LOG_ENV = "WAREHOUSE_EVAL_LOG"
_DEFAULT_LOG = Path(__file__).resolve().parent.parent / "WAREHOUSE_EVAL_LOG.jsonl"


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


def log_eval(query: str, sf_dir: str, cols, rows) -> str:
    """Record one evaluation of a warehouse query: append a JSONL line
    to the eval log and print the fingerprint to stdout. Returns the
    fingerprint. Never raises — an unwritable log degrades to the
    stdout line alone."""
    fp = fingerprint(cols, rows, spark_side=True)
    record = {
        "query": query,
        "sf_dir": sf_dir,
        "pid": os.getpid(),
        "ts": round(time.time(), 3),
        "monotonic": round(time.monotonic(), 3),
        "fingerprint": fp,
        "cols": list(cols),
        # raw repr keeps full float precision; norm is what the hash sees
        "rows": [
            {
                "raw": [repr(v) for v in r],
                "norm": [norm_value(v, spark_side=True) for v in r],
            }
            for r in rows
        ],
    }
    print(
        f"WAREHOUSE_EVAL query={query} sf={sf_dir} pid={os.getpid()} "
        f"rows={len(rows)} fp={fp}",
        flush=True,
    )
    try:
        path = _log_path()
        if path is not None:
            _rotate_if_large(path)
            with open(path, "a", encoding="utf-8") as f:
                f.write(json.dumps(record, separators=(",", ":")) + "\n")
    except OSError:
        pass
    return fp


_ROTATE_BYTES = 4 * 1024 * 1024


def _rotate_if_large(path: Path) -> None:
    """Bound the committed log: past ~4 MB (thousands of evaluations)
    the current file becomes ``<name>.prev`` (replacing the previous
    generation) and a fresh one starts — the current and prior windows
    are always retained, which is what a flake investigation needs."""
    try:
        if path.exists() and path.stat().st_size >= _ROTATE_BYTES:
            path.replace(path.with_suffix(path.suffix + ".prev"))
    except OSError:
        pass
