"""Append one `bench_scaling.py --pair` result to BENCH/pair_prod.json.

Usage:
    python tools/bench_scaling.py --pair 2 60000 4 | tail -1 > /tmp/pair.json
    python tools/append_replication.py /tmp/pair.json "<note>" [date] [engine]

Appends the pair with kind="replication", recomputes the pooled
clean-round statistics over all in-protocol production-shape runs
(leg-time criterion shared with bench_scaling.py), prints them,
and re-renders BENCH/BASELINE.md from BENCH/summary.json so the pooled
number shown next to the MET/NOT-MET verdict stays consistent with the
JSON of record (ADVICE r4).

The date is an explicit argument (defaults to the session date recorded
in the note) because benchmark entries are measurement records — they
must carry the date the measurement ran, not the time this script ran.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> None:
    pair_path = Path(sys.argv[1])
    note = sys.argv[2] if len(sys.argv) > 2 else ""
    date = sys.argv[3] if len(sys.argv) > 3 else "2026-08-18"
    pair = json.loads(
        [l for l in pair_path.read_text().splitlines() if l.startswith("{")][-1]
    )
    prod = REPO / "BENCH" / "pair_prod.json"
    d = json.loads(prod.read_text())
    # protocol guard: pair_prod.json pools PRODUCTION-SHAPE rounds only
    # (seed_every=1 — every page seeded up front, few giant rounds).  A
    # pair whose legs ran the default discovery shape measures a workload
    # with ~3x the serial fraction; pooling it would corrupt the series
    # in either direction.  Older entries predate the seed_every stamp;
    # new ones must carry it.
    for leg in ("lo", "hi"):
        se = pair.get(leg, {}).get("seed_every")
        if se is not None and se != 1:
            sys.exit(
                f"REFUSED: {leg} leg ran seed_every={se}, not the "
                f"production shape (seed_every=1) pair_prod.json pools. "
                f"Record it under BENCH/rejected_runs.json instead."
            )
    # n_pages is recoverable from the child legs; require 60k-shape entries
    # to say so explicitly so pooling never silently mixes fixtures
    n_pages = pair["lo"]["n_pages"] if "n_pages" in pair.get("lo", {}) else 60000
    # engine generation stamp: replication rounds are only comparable
    # within one engine generation (the serial fraction is a property of
    # the code).  "r5" = the post-933e480 engine (fresh persisted,
    # unconditional warm-up, identity-window short-circuit); "r5b" = the
    # post-5598748 engine (candidates chain persisted — round −27% at
    # both levels); everything recorded before 933e480 is "r4".  The
    # exact commit rides along for provenance.  Optional 4th argv
    # overrides the stamp when appending a run measured on an older
    # checkout.
    engine = sys.argv[4] if len(sys.argv) > 4 else "r5b"
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, cwd=str(REPO),
    ).stdout.strip()
    d["pairs"].append(
        {"pair": pair, "n_pages": n_pages, "date": date,
         "kind": "replication", "note": note,
         "engine": engine, "engine_commit": commit}
    )
    prod.write_text(json.dumps(d, indent=1))

    # in-protocol = same data-driven leg-time criterion bench_scaling.py
    # pools on: lo leg fits one host-noise window (≤ 20 min), hi leg ≥ 4×
    # the ~30 s serial round floor (not latency-bound at this engine speed)
    def in_protocol(p: dict) -> bool:
        pr = p["pair"]
        return pr["lo"]["sec"] <= 1200.0 and pr["hi"]["sec"] >= 120.0

    pooled = [
        r["eff"]
        for p in d["pairs"]
        if in_protocol(p)
        for r in p["pair"].get("rounds", [])
        if r.get("clean")
    ]
    cur = [
        r["eff"]
        for p in d["pairs"]
        if in_protocol(p) and p.get("engine") == engine
        for r in p["pair"].get("rounds", [])
        if r.get("clean")
    ]
    med = statistics.median(pooled) if pooled else None
    print(f"appended; pooled clean rounds (in-protocol, all engines) "
          f"n={len(pooled)}: "
          f"{sorted(round(e, 3) for e in pooled)}")
    print(f"pooled median (all engines) = {med}")
    print(f"{engine}-engine clean rounds n={len(cur)}: "
          f"{sorted(round(e, 3) for e in cur)} -> median "
          f"{statistics.median(cur) if cur else None}")
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_scaling.py"),
         "--render-from", str(REPO / "BENCH" / "summary.json"),
         "240000", "60000"],
        check=True, cwd=str(REPO),
    )


if __name__ == "__main__":
    main()
