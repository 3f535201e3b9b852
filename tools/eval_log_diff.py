"""Localize a warehouse hash mismatch from the eval log in one command.

When a driver round records ``hash_match: false`` for a warehouse
query, the failing evaluation has already appended its rows to
``WAREHOUSE_EVAL_LOG.jsonl`` (every ``_run_union`` evaluation does).
This tool names the divergent row(s) without any reproduction attempt:

    python tools/eval_log_diff.py [query] [--log PATH] [--sf SUBSTR]
                                    [--sha SHA]

With no query argument it prints the fingerprint census for EVERY
query in the log (still honoring --sf/--sha) and diffs any divergent
one — so the case file's one-liner ``--sha <HEAD>`` works verbatim
(ADVICE r12 / VERDICT r12 "What's wrong #3").

Both rotation windows are read (``<log>`` and ``<log>.prev``) — after a
rotation the majority fingerprints or the divergent record itself may
live only in the prior generation. Records carry the git HEAD they were
produced at (round 11); the census prints it and ``--sha`` restricts
the diff to one code version, since fingerprints are only comparable
within one (a row-set change legitimately moves every fingerprint).

For the given query it groups the log's evaluations by fingerprint,
prints the fingerprint census (a flake shows up as a minority
fingerprint), and for each minority fingerprint diffs its rows against
the majority one — naming the check, the side values (raw, so last-ULP
differences are visible), and which of (n_rows, n_aux, val) moved.

Exit 0 = all evaluations agree; 2 = divergent fingerprints found
(diffs printed); 1 = no records for the query.
"""

from __future__ import annotations

import argparse
import json
from collections import Counter, defaultdict
from pathlib import Path

_DEFAULT_LOG = Path(__file__).resolve().parent.parent / "WAREHOUSE_EVAL_LOG.jsonl"


def load(
    log_path: Path, query: "str | None", sf_substr: str, sha: str = ""
) -> list[dict]:
    """Records for ``query`` (None = all queries), filtered by sf_dir
    substring and (optionally) the git HEAD they were produced at."""
    recs = []
    # .prev first so records stay in chronological order across the
    # rotation boundary (the rotation contract retains both windows
    # precisely for investigations like this one)
    prev = log_path.with_suffix(log_path.suffix + ".prev")
    for path in (prev, log_path):
        if not path.exists():
            continue
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                r = json.loads(line)
                if (
                    (query is None or r.get("query") == query)
                    and sf_substr in r.get("sf_dir", "")
                    and (not sha or r.get("sha", "") == sha)
                ):
                    recs.append(r)
    return recs


def rows_by_check(rec: dict) -> dict[str, dict]:
    # check_name is always the first column of the audit schema.
    # detail=False census records (round 14: daily_change_pct) carry
    # per-COLUMN digests instead of row payloads — attribute by column
    # name so the diff still names the divergent surface
    if "rows" not in rec:
        return {
            col: {"norm": [col, digest], "raw": [col, digest]}
            for col, digest in rec.get("col_digests", {}).items()
        }
    return {r["norm"][0]: r for r in rec["rows"]}


def census_and_diff(recs: list[dict], query: str, sf: str) -> int:
    """Print the fingerprint census for one query's records and diff
    any minority fingerprint against the majority. Returns 0 when all
    evaluations agree, 2 when divergence was found."""
    census = Counter(r["fingerprint"] for r in recs)
    print(f"{len(recs)} evaluations of {query} (sf~{sf!r}):")
    for fp, n in census.most_common():
        mine = [r for r in recs if r["fingerprint"] == fp]
        sfs = sorted({r["sf_dir"] for r in mine})
        shas = sorted({r.get("sha", "?") for r in mine})
        omatch = sorted(
            {str(r["oracle_match"]) for r in mine if "oracle_match" in r}
        )
        extra = f" oracle_match={','.join(omatch)}" if omatch else ""
        print(f"  {fp}  x{n}  {sfs} sha={','.join(shas)}{extra}")
    if len({r.get("sha", "?") for r in recs}) > 1:
        print(
            "  note: multiple code versions present — fingerprints are "
            "only comparable within one; re-run with --sha"
        )
    if len(census) == 1:
        print("  all evaluations agree — nothing to diff")
        return 0

    by_fp: dict[str, dict] = defaultdict(dict)
    for r in recs:
        by_fp.setdefault(r["fingerprint"], r)
    majority_fp = census.most_common(1)[0][0]
    maj = rows_by_check(by_fp[majority_fp])
    cols = by_fp[majority_fp]["cols"]
    for fp in census:
        if fp == majority_fp:
            continue
        if "rows" not in by_fp[majority_fp] or "rows" not in by_fp[fp]:
            # compact census records (detail=False): attribute the
            # divergence to named COLUMNS via their digests
            da = by_fp[majority_fp].get("col_digests", {})
            db = by_fp[fp].get("col_digests", {})
            print(f"\n--- {fp} vs majority {majority_fp} (col digests) ---")
            widths = {len(v) for v in (*da.values(), *db.values())}
            if len(widths) > 1:
                # col_digests widened 8 -> 16 hex in round 15: records
                # from different widths differ on EVERY column for free
                print(
                    "  records carry different digest widths (8-hex "
                    "pre-r15 vs 16-hex) — per-column comparison is "
                    "meaningless across that boundary; re-compare "
                    "within one code generation (--sha)"
                )
                continue
            n_diff = 0
            for col in sorted(set(da) | set(db)):
                if da.get(col) != db.get(col):
                    n_diff += 1
                    print(
                        f"  column {col}: majority={da.get(col)} "
                        f"minority={db.get(col)}"
                    )
            if n_diff == 0:
                # ADVICE r14: digests hash each column SORTED
                # independently, so this combination is reachable —
                # name it instead of printing an empty diff section
                print(
                    "  fingerprints differ but ALL column digests "
                    "match — cross-column re-pairing of values "
                    "(same multiset per column, different rows) "
                    "or a digest collision"
                )
            continue
        other = rows_by_check(by_fp[fp])
        print(f"\n--- {fp} vs majority {majority_fp} ---")
        for check in sorted(set(maj) | set(other)):
            a, b = maj.get(check), other.get(check)
            if a is None or b is None:
                print(f"  {check}: present only in "
                      f"{'majority' if b is None else 'minority'}")
                continue
            if a["norm"] == b["norm"]:
                continue
            for i, col in enumerate(cols):
                if a["norm"][i] != b["norm"][i]:
                    print(
                        f"  {check}.{col}: majority={a['raw'][i]} "
                        f"minority={b['raw'][i]} "
                        f"(norm {a['norm'][i]} vs {b['norm'][i]})"
                    )
    return 2


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "query", nargs="?", default=None,
        help="warehouse query name; omit for the full per-query census",
    )
    ap.add_argument("--log", default=str(_DEFAULT_LOG))
    ap.add_argument(
        "--sf", default="", help="substring filter on sf_dir (e.g. sf0.01)"
    )
    ap.add_argument(
        "--sha", default="",
        help="restrict to records produced at one git HEAD",
    )
    args = ap.parse_args()

    recs = load(Path(args.log), args.query, args.sf, args.sha)
    if not recs:
        print(
            f"no eval-log records for query={args.query!r} "
            f"sf~{args.sf!r} sha~{args.sha!r}"
        )
        return 1
    by_query: dict[str, list[dict]] = defaultdict(list)
    for r in recs:
        by_query[r.get("query", "?")].append(r)
    rc = 0
    for q in sorted(by_query):
        rc = max(rc, census_and_diff(by_query[q], q, args.sf))
    if rc == 0:
        print("all evaluations agree — nothing to diff")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
