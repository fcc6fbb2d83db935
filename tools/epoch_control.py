"""Battery epoch-drift control (VERDICT r16 missing #5 / next-round #3).

Problem this answers with a number: BENCH_rN files from DIFFERENT
driver sessions are not comparable — the r15->r16 driver files showed
a uniform +23% on queries whose code was byte-unchanged, and it cost a
judge session to adjudicate "environment, not regression" from three
indirect signals. This tool makes the adjudication part of the battery:
at battery time it runs a FIXED 3-query control interleaved between the
previous round's final tree (a git worktree) and HEAD, under
tools/ab_bench.py's exact protocol (session warm-up, per-query untimed
warm-up, best-of-3 with pre-trial GC), alternating tree order across
rounds so neither tree systematically benefits from session warm-up.

The three control queries are the r16 drift witnesses — byte-unchanged
since round 15 yet 1.3-1.6x slower in the r16 driver file (sessionize,
incremental_merge, graph_neighbors). Their HEAD/prev per-query minima
ratio IS the measured epoch-drift bound for the battery: a future
BENCH_rN swing inside that bound self-adjudicates as session noise.

Usage (battery time, after the frozen-registry commit):
  python tools/epoch_control.py <prev_round_sha> docs/epoch_control_r17.json

Writes {"prev_sha", "control", "rounds", "minima", "ratio"} and prints
the markdown row for the battery note.
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from pathlib import Path

# r18 (VERDICT r17 #6): two sub-0.5 s witnesses join the original
# three mid-size ones so the control spans the size classes — the r17
# driver table's 20-query sub-second tail regressed on noise and the
# 3-witness control could not bound that band by size class.
CONTROL = [
    "sessionize",
    "incremental_merge",
    "graph_neighbors",
    "pricing_summary",
    "dedup_exact",
]
ROUNDS = 3
REPO = Path(__file__).resolve().parent.parent


def run(prev_sha: str, out_path: str) -> None:
    tmp = Path(tempfile.mkdtemp(prefix="epoch_prev_"))
    prev_tree = tmp / "prev"
    subprocess.run(
        ["git", "worktree", "add", "--detach", str(prev_tree), prev_sha],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        results: dict[str, list[dict[str, float]]] = {"prev": [], "head": []}
        for i in range(ROUNDS):
            # alternate which tree goes first within the batch so JVM /
            # page-cache warm-up amortizes symmetrically
            order = [("prev", prev_tree), ("head", REPO)]
            if i % 2:
                order.reverse()
            for label, tree in order:
                out_json = tmp / f"{label}_{i}.json"
                subprocess.run(
                    [sys.executable, str(REPO / "tools" / "ab_bench.py"),
                     str(tree), str(out_json), *CONTROL],
                    check=True,
                )
                results[label].append(json.loads(out_json.read_text())["queries"])
        minima = {
            label: {q: min(r[q] for r in runs) for q in CONTROL}
            for label, runs in results.items()
        }
        ratio = {
            q: round(minima["head"][q] / minima["prev"][q], 3) for q in CONTROL
        }
        agg = round(
            sum(minima["head"].values()) / sum(minima["prev"].values()), 3
        )
        payload = {
            "prev_sha": prev_sha,
            "control": CONTROL,
            "rounds": ROUNDS,
            "minima": minima,
            "ratio_per_query": ratio,
            "ratio_aggregate": agg,
        }
        Path(out_path).write_text(json.dumps(payload, indent=2))
        print(f"wrote {out_path}")
        print("| control query | prev min s | HEAD min s | HEAD/prev |")
        print("|---|---|---|---|")
        for q in CONTROL:
            print(f"| {q} | {minima['prev'][q]} | {minima['head'][q]} "
                  f"| {ratio[q]}x |")
        print(f"| **aggregate** | {round(sum(minima['prev'].values()), 3)} "
              f"| {round(sum(minima['head'].values()), 3)} | **{agg}x** |")
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", str(prev_tree)],
            cwd=REPO, check=False, capture_output=True,
        )


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit("usage: epoch_control.py <prev_round_sha> <out.json>")
    run(sys.argv[1], sys.argv[2])
