"""Every result-bearing query must return rows at sf0.01 — an oracle diff
passes silently on empty-vs-empty (how tpch_q10's original 1993 date filter
slipped through), so non-emptiness is its own gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"

# queries whose correct sf0.01 result may legitimately be small/empty
ALLOWED_EMPTY: set[str] = set()


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_nonempty_sf001(spark, name):
    if name in ALLOWED_EMPTY:
        pytest.skip("legitimately empty at this SF")
    df = entrymod.queries()[name](spark, SF)
    assert df.limit(1).count() == 1, f"{name} returned no rows at sf0.01"


def test_readme_query_counts_match_registry():
    # README advertises the registry size; derive-check it so it can't drift.
    import os
    import re

    from bigdatainvesttink_spark import registry

    readme = os.path.join(os.path.dirname(os.path.dirname(__file__)), "README.md")
    with open(readme) as f:
        text = f.read()
    m = re.search(
        r"(\d+) registered queries \((\d+) with exact DuckDB oracles\)", text
    )
    assert m, "README no longer states the registry counts"
    assert int(m.group(1)) == len(registry.all_queries())
    assert int(m.group(2)) == len(registry.all_oracles())
