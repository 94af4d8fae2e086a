"""Regenerate the COVERAGE.md query-inventory appendix and the README
query-count sentence from the live registry (keeps tests/test_docs.py
green as queries land)."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    qs = sorted(entrymod.queries())
    osql = set(entrymod.oracle_sql())
    fams: dict[str, list[str]] = {}
    for n in qs:
        f = re.match(r"([a-z]+\d?)", n.split("_", 1)[0]).group(1)
        fams.setdefault(f, []).append(n)
    lines = [
        "",
        "## Appendix: full query inventory (auto-checked by tests/test_docs.py)",
        "",
        f"{len(qs)} registered; {len(osql)} with exact DuckDB oracles; "
        f"the {len(qs) - len(osql)} rows-only: "
        + ", ".join(f"`{n}`" for n in qs if n not in osql)
        + ".",
        "",
    ]
    for f in sorted(fams):
        names = " ".join(f"`{n}`" for n in fams[f])
        lines.append(f"- **{f}** ({len(fams[f])}): {names}")

    cov = os.path.join(ROOT, "COVERAGE.md")
    text = open(cov).read()
    marker = "\n## Appendix: full query inventory"
    if marker in text:
        text = text[: text.index(marker)]
    open(cov, "w").write(text.rstrip() + "\n" + "\n".join(lines) + "\n")

    rd = os.path.join(ROOT, "README.md")
    text = open(rd).read()
    text = re.sub(
        r"\d+ registered queries \(\d+ with exact DuckDB oracles\)",
        f"{len(qs)} registered queries ({len(osql)} with exact DuckDB oracles)",
        text,
    )
    open(rd, "w").write(text)
    print(f"docs updated: {len(qs)} queries, {len(osql)} oracles")


if __name__ == "__main__":
    main()
