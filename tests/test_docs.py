"""Documentation consistency: the counts and query names the docs claim
must match the registry — keeps README/COVERAGE from drifting as queries
land (the failure mode ADVICE r2 flagged)."""

from __future__ import annotations

import re
from pathlib import Path

import __spark_entry__ as entrymod

ROOT = Path(__file__).resolve().parents[1]


def test_readme_query_counts_match_registry():
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    text = (ROOT / "README.md").read_text()
    m = re.search(
        r"(\d+) registered queries \((\d+) with exact DuckDB oracles\)", text
    )
    assert m, "README count sentence missing"
    assert int(m.group(1)) == len(qs), (
        f"README says {m.group(1)} queries, registry has {len(qs)}"
    )
    assert int(m.group(2)) == len(osql), (
        f"README says {m.group(2)} oracles, registry has {len(osql)}"
    )


def test_coverage_query_names_exist():
    qs = set(entrymod.queries())
    text = (ROOT / "COVERAGE.md").read_text()
    named = set(re.findall(r"`([a-z][a-z0-9_]+)`", text))
    # backticked identifiers that LOOK like query names must be real ones
    prefixes = ("q1_", "rel_", "tpch_", "b", "a_", "c_", "d1_", "d2_",
                "d3_", "d4_", "d5_", "d6_", "d7_", "dmm_", "fmt_")
    looks_like_query = {
        n for n in named
        if n.startswith(prefixes) and re.match(r"^[a-z]\w*_\w+", n)
        and not n.startswith(("bigdatainvesttink", "bucketBy", "bench"))
    }
    ghosts = {
        n for n in looks_like_query - qs
        # allow non-query code identifiers referenced in prose
        if not any(ch in n for ch in (".",)) and n.count("_") >= 1
        and n not in {
            # fixture tables / range shorthand used in prose
            "book_levels", "tpch_q2", "tpch_q22",
            # r8 registry fold: folded names legitimately survive in the
            # pruning-history section (each points at its absorbing suite)
            "b25_depth_profile", "b29_roll_spread", "b40_underwater_spells",
            "b43_dow_effect", "b46_riskmetrics_vol", "b49_var_es",
            "b50_sortino", "b51_ulcer_index", "b56_ljung_box",
            "b57_donchian_breakouts",
        }
    }
    # every ghost is a doc typo or a renamed/removed query
    assert not ghosts - {
        # helper/function names legitimately mentioned in COVERAGE
        n for n in ghosts if n in text and f"`{n}`(" in text
    }, sorted(ghosts)[:20]


def test_every_query_is_documented_in_coverage():
    qs = set(entrymod.queries())
    text = (ROOT / "COVERAGE.md").read_text()
    missing = {n for n in qs if f"`{n}`" not in text}
    # streaming/pytest-surface rows may appear without backticks; keep the
    # gate strict but name the misses for a quick doc fix
    assert not missing, sorted(missing)


def test_bench_compare_flags_only_real_regressions():
    """The r-over-r regression gate: >2x jumps flag only past the noise
    floor; new/removed queries never flag; totals cover the common set."""
    from tools.bench_compare import MIN_ABS_DELTA_S, THRESHOLD, compare

    old = {"queries": {"a": 1.0, "b": 0.1, "c": 4.0, "gone": 1.0}}
    new = {"queries": {"a": 2.6, "b": 0.3, "c": 3.0, "added": 9.9}}
    r = compare(old, new)
    assert r["n_common"] == 3 and r["n_only_new"] == 1 and r["n_only_old"] == 1
    assert r["total_old"] == 5.1 and r["total_new"] == 5.9
    # "a" regressed 2.6x and +1.6s -> flagged; "b" is 3x but only +0.2s
    # (sub-noise-floor) -> not flagged; "added" is new -> never flagged
    assert [f[0] for f in r["flags"]] == ["a"]
    assert THRESHOLD == 2.0 and MIN_ABS_DELTA_S == 0.5


def test_driver_order_green_tail_stalest_first():
    """With the unchecked backlog at zero, the driver's 50/round budget
    must land on the STALEST green rows (VERDICT r8 ask #3): the green
    tail sorts ascending by newest settling-row round, with a git-derived
    source-moved tie-break inside a vintage."""
    from bigdatainvesttink_spark import registry

    # the recheck (_SCHEMA_CHANGED not yet re-greened) and _FIXED_FIRST
    # buckets deliberately jump the queue — exclude them so this test
    # pins only the unchecked-then-stalest rule (ADVICE r9)
    skip = set(registry._SCHEMA_CHANGED) | set(registry._FIXED_FIRST)
    order = [n for n in registry.all_queries() if n not in skip]
    # unchecked names (no settling row yet) go FIRST; after them the
    # green tail's vintages must be non-decreasing
    checked = [n for n in order if n in registry._LAST_CHECKED_ROUND]
    n_unchecked = len(order) - len(checked)
    assert order[n_unchecked:] == checked, (
        "unchecked names must all precede the green tail"
    )
    rounds = [registry._LAST_CHECKED_ROUND[n] for n in checked]
    assert rounds == sorted(rounds), "green tail is not stalest-first"
    # the map itself is parsed once at import (ADVICE r8): the module
    # attribute is the cache, not a per-call re-glob
    assert registry._load_green_since(999) == frozenset()
    assert registry._load_green_since(1) == frozenset(
        registry._LAST_CHECKED_ROUND
    )
