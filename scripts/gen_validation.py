#!/usr/bin/env python
"""Emit VALIDATION.json — the machine-readable per-query validation
ledger (VERDICT_r11 item 3): for every catalog query, its oracle tier,
the last driver CORRECTNESS round/result, and the last bench
round/time. The backlog numbers quoted in README/COVERAGE derive from
this file; a judge can recompute "never driver-checked / never
benched" with one jq line:

    jq '[.queries[] | select(.last_driver_round == null)] | length' VALIDATION.json
    jq '[.queries[] | select(.last_bench_round == null)] | length' VALIDATION.json

Sources (all committed artifacts, no hand-typed numbers):
  CORRECTNESS_r*.json       — driver rounds, per-query match rows
  BENCH_r*.json             — per-round headline top-10 query times
  BENCH_DETAIL.json history — the full per-query detail each round
                              (git archaeology: every committed version,
                              round resolved by matching its headline
                              total to a BENCH_rN value, else by a
                              "round N" phrase in the commit subject)

Run from the repo root (scripts/gen_counts.py invokes it too):
    python scripts/gen_validation.py [--check]
--check exits non-zero if the committed VALIDATION.json drifted.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

OUT = ROOT / "VALIDATION.json"


def _driver_rows() -> dict[str, dict]:
    """name -> {last_driver_round, last_driver_result} from the
    CORRECTNESS_r*.json artifacts (later rounds win)."""
    out: dict[str, dict] = {}
    for path in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path.name).group(1))
        data = json.loads(path.read_text())
        for name, row in data.items():
            if row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                # honest rows-tier record: no oracle SQL, rows produced
                result = "rows"
            elif row.get("err"):
                result = "fail"
            elif row.get("hash_match"):
                result = "hash"
            elif row.get("rows_match"):
                result = "rows"
            else:
                result = "fail"
            prev = out.get(name)
            if prev is None or rnd >= prev["last_driver_round"]:
                out[name] = {
                    "last_driver_round": rnd,
                    "last_driver_result": result,
                }
    return out


def _bench_round_values() -> dict[int, float]:
    """round -> headline total, for matching DETAIL versions to rounds."""
    vals: dict[int, float] = {}
    for path in sorted(ROOT.glob("BENCH_r*.json")):
        rnd = int(re.search(r"r(\d+)", path.name).group(1))
        parsed = (json.loads(path.read_text()).get("parsed")) or {}
        if isinstance(parsed.get("value"), (int, float)):
            vals[rnd] = float(parsed["value"])
    return vals


def _bench_rows() -> dict[str, dict]:
    """name -> {last_bench_round, last_bench_sec} merged from the
    per-round BENCH_r*.json query maps and every committed version of
    BENCH_DETAIL.json (later rounds win)."""
    out: dict[str, dict] = {}

    def record(rnd: int, times: dict[str, float]) -> None:
        for name, sec in (times or {}).items():
            if not isinstance(sec, (int, float)):
                continue
            prev = out.get(name)
            if prev is None or rnd >= prev["last_bench_round"]:
                out[name] = {
                    "last_bench_round": rnd,
                    "last_bench_sec": round(float(sec), 3),
                }

    for path in sorted(ROOT.glob("BENCH_r*.json")):
        rnd = int(re.search(r"r(\d+)", path.name).group(1))
        parsed = (json.loads(path.read_text()).get("parsed")) or {}
        record(rnd, parsed.get("queries") or {})

    round_totals = _bench_round_values()
    try:
        log = subprocess.run(
            ["git", "log", "--format=%H\t%s", "--", "BENCH_DETAIL.json"],
            cwd=ROOT,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        # Most of the bench ledger lives only in BENCH_DETAIL.json's git
        # history; silently degrading here would rewrite VALIDATION.json
        # (and the README/COVERAGE phrases) with a drastically
        # understated benched count. Abort loudly instead.
        raise SystemExit(
            f"gen_validation: git history unavailable ({exc}) — the bench "
            "ledger requires the full repo history (not a shallow clone "
            "or exported tree); refusing to emit an understated ledger"
        )
    if not log.strip():
        raise SystemExit(
            "gen_validation: git log returned no BENCH_DETAIL.json commits "
            "— shallow or truncated history; refusing to emit an "
            "understated ledger"
        )
    for line in log.splitlines():
        if "\t" not in line:
            continue
        sha, subject = line.split("\t", 1)
        try:
            blob = subprocess.run(
                ["git", "show", f"{sha}:BENCH_DETAIL.json"],
                cwd=ROOT,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            detail = json.loads(blob)
        except (subprocess.CalledProcessError, json.JSONDecodeError):
            continue
        rnd = None
        value = detail.get("value")
        if isinstance(value, (int, float)):
            for r, v in round_totals.items():
                if abs(v - float(value)) < 0.005:
                    rnd = r
                    break
        if rnd is None:
            m = re.search(r"round[- ](\d+)", subject, re.IGNORECASE)
            if m:
                rnd = int(m.group(1))
        if rnd is None:
            continue
        merged: dict[str, float] = {}
        for key in ("headline", "rotating", "queries"):
            part = detail.get(key)
            if isinstance(part, dict):
                merged.update(part)
        record(rnd, merged)
    return out


def _shared_rows() -> dict[str, float]:
    """name -> shared-session seconds from BENCH_SHARED.json (the cheap
    long-tail timing tier bench.py writes under
    SPARK_GRAFT_BENCH_SHARED=1 — VERDICT_r12 item 6). Numbers carry
    shared-session neighbor noise; they are a coverage tier, never the
    round-over-round comparator."""
    path = ROOT / "BENCH_SHARED.json"
    if not path.exists():
        return {}
    data = json.loads(path.read_text())
    if data.get("sf") != 0.1:
        # the shared tier is DOCUMENTED as sf0.1; silently ingesting a
        # sweep run at another scale factor would record timing
        # coverage that doesn't exist at the documented tier
        print(
            f"gen_validation: ignoring BENCH_SHARED.json at sf="
            f"{data.get('sf')!r} (shared tier is sf0.1)",
            file=sys.stderr,
        )
        return {}
    return {
        name: round(float(sec), 3)
        for name, sec in (data.get("queries") or {}).items()
        if isinstance(sec, (int, float))
    }


def build() -> dict:
    from report_worker_spark.plans.catalog import ORACLE, QUERIES

    driver = _driver_rows()
    bench = _bench_rows()
    shared = _shared_rows()
    queries: dict[str, dict] = {}
    for name in QUERIES:
        row = {
            "tier": "hash" if name in ORACLE else "rows",
            "last_driver_round": None,
            "last_driver_result": None,
            "last_bench_round": None,
            "last_bench_sec": None,
            "shared_session_sec": shared.get(name),
        }
        row.update(driver.get(name, {}))
        row.update(bench.get(name, {}))
        queries[name] = row
    rows = queries.values()
    summary = {
        "total": len(queries),
        "hash_tier": sum(1 for r in rows if r["tier"] == "hash"),
        "rows_tier": sum(1 for r in rows if r["tier"] == "rows"),
        "driver_checked": sum(
            1 for r in rows if r["last_driver_round"] is not None
        ),
        "never_driver_checked": sum(
            1 for r in rows if r["last_driver_round"] is None
        ),
        "driver_green": sum(
            1 for r in rows if r["last_driver_result"] in ("hash", "rows")
        ),
        "benched": sum(1 for r in rows if r["last_bench_round"] is not None),
        "never_benched": sum(1 for r in rows if r["last_bench_round"] is None),
        "shared_timed": sum(
            1 for r in rows if r["shared_session_sec"] is not None
        ),
        "never_timed_any_tier": sum(
            1
            for r in rows
            if r["last_bench_round"] is None
            and r["shared_session_sec"] is None
        ),
    }
    return {"summary": summary, "queries": queries}


def _rewrite_docs(summary: dict, check_only: bool) -> bool:
    """Keep the backlog phrase in README/COVERAGE derived, never typed."""
    phrase = (
        f"**{summary['driver_checked']} of {summary['total']} queries have "
        f"a driver\nCORRECTNESS row ({summary['never_driver_checked']} never\n"
        f"driver-checked; {summary['never_benched']} never benched)**"
    )
    pat = re.compile(
        r"\*\*\d+ of \d+ queries have a driver\s+CORRECTNESS row "
        r"\(\d+ never\s+driver-checked; \d+ never benched\)\*\*"
    )
    clean = True
    for path in (ROOT / "README.md", ROOT / "COVERAGE.md"):
        text = orig = path.read_text()
        text, n = pat.subn(lambda _m: phrase, text)
        if n != 1:
            raise SystemExit(
                f"{path.name}: validation-ledger phrase matched {n} times "
                "(expected exactly 1) — the doc phrase moved"
            )
        if text != orig:
            clean = False
            if not check_only:
                path.write_text(text)
                print(f"updated {path.name} ledger phrase")
    return clean


def rewrite(check_only: bool = False) -> bool:
    data = build()
    text = json.dumps(data, indent=1, sort_keys=False) + "\n"
    current = OUT.read_text() if OUT.exists() else ""
    json_clean = text == current
    if not json_clean and not check_only:
        OUT.write_text(text)
        print(f"wrote VALIDATION.json: {data['summary']}")
    docs_clean = _rewrite_docs(data["summary"], check_only)
    if json_clean and docs_clean:
        print(f"VALIDATION.json in sync: {data['summary']}")
    return json_clean and docs_clean


if __name__ == "__main__":
    in_sync = rewrite(check_only="--check" in sys.argv)
    if "--check" in sys.argv and not in_sync:
        raise SystemExit("VALIDATION.json drifted — run scripts/gen_validation.py")
