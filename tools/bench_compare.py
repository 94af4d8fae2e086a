"""Round-over-round bench regression report (VERDICT r3 ask #4).

Compares two BENCH_DETAIL.json files (the per-query timing dumps bench.py
writes next to its one-line summary) and prints a one-screen report:
totals over the common query set, the biggest movers both ways, and a
hard FLAG on any query slower by more than the 2x driver gate.

Usage:
    python tools/bench_compare.py OLD.json [NEW.json]
    python tools/bench_compare.py --rev <git-rev> [NEW.json]

With --rev the old file is read from git (``git show rev:BENCH_DETAIL.json``),
so comparing against the previous round is one command:

    python tools/bench_compare.py --rev e4d315c

NEW defaults to the working-tree BENCH_DETAIL.json. Exit code is 1 when any
common query regressed beyond the threshold (min absolute delta 0.5 s, so
sub-second noise on trivial queries never flags).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLD = 2.0  # the driver's perf gate: >2x per-query jump is a flag
MIN_ABS_DELTA_S = 0.5  # ignore ratio blowups on sub-second noise


def _load(path_or_rev: str, from_git: bool = False) -> dict:
    if from_git:
        blob = subprocess.run(
            ["git", "show", f"{path_or_rev}:BENCH_DETAIL.json"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(blob)
    with open(path_or_rev) as f:
        return json.load(f)


def compare(old: dict, new: dict) -> dict:
    """Pure comparison (also unit-tested): returns totals, movers, flags."""
    oq, nq = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(oq) & set(nq))
    rows = [(name, oq[name], nq[name]) for name in common]
    flags = [
        (name, o, n)
        for name, o, n in rows
        if n > o * THRESHOLD and n - o > MIN_ABS_DELTA_S
    ]
    movers = sorted(rows, key=lambda r: r[2] - r[1])
    return {
        "n_common": len(common),
        "n_only_old": len(set(oq) - set(nq)),
        "n_only_new": len(set(nq) - set(oq)),
        "total_old": sum(o for _, o, _ in rows),
        "total_new": sum(n for _, _, n in rows),
        "improved": movers[:8],
        "regressed": movers[-8:][::-1],
        "flags": flags,
    }


def render(r: dict, old_label: str, new_label: str) -> str:
    lines = [
        f"# BENCH_COMPARE: {old_label} -> {new_label}",
        "",
        f"Common queries: {r['n_common']} "
        f"(+{r['n_only_new']} new, -{r['n_only_old']} removed)",
        f"Total wall on common set: {r['total_old']:.1f} s -> "
        f"{r['total_new']:.1f} s "
        f"({r['total_new'] / max(r['total_old'], 1e-9):.2f}x)",
        "",
        "Top improvements (s old -> new):",
    ]
    for name, o, n in r["improved"]:
        if n < o:
            lines.append(f"  {name:42s} {o:7.2f} -> {n:7.2f}")
    lines.append("")
    lines.append("Top slowdowns (s old -> new):")
    for name, o, n in r["regressed"]:
        if n > o:
            lines.append(f"  {name:42s} {o:7.2f} -> {n:7.2f}")
    lines.append("")
    if r["flags"]:
        lines.append(
            f"FLAGGED (> {THRESHOLD}x and > {MIN_ABS_DELTA_S} s): "
            f"{len(r['flags'])}"
        )
        for name, o, n in r["flags"]:
            lines.append(f"  !! {name:39s} {o:7.2f} -> {n:7.2f} ({n/o:.1f}x)")
    else:
        lines.append(
            f"FLAGGED: none (no common query regressed > {THRESHOLD}x "
            f"beyond {MIN_ABS_DELTA_S} s)"
        )
    return "\n".join(lines)


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    if argv[0] == "--rev":
        old = _load(argv[1], from_git=True)
        old_label = f"git:{argv[1]}"
        rest = argv[2:]
    else:
        old = _load(argv[0])
        old_label = argv[0]
        rest = argv[1:]
    new_path = rest[0] if rest else os.path.join(REPO, "BENCH_DETAIL.json")
    new = _load(new_path)
    r = compare(old, new)
    print(render(r, old_label, new_path))
    return 1 if r["flags"] else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
