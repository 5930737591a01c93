"""Doc-count anti-staleness gate (VERDICT r9 ask #2): README's
registry/headline claims are parsed and asserted against the actual
registry, so a new operator commit that forgets the doc sync fails the
suite instead of shipping stale numbers (this drifted three rounds
running: r7 163→, r8 170→, r9 173→175)."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _registry():
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    return entry.queries(), entry.oracle_sql()


def test_readme_registry_counts_match():
    readme = (REPO / "README.md").read_text()
    m = re.search(
        r"(\d+) registered queries \((\d+) DuckDB-hash-verified, (\d+) rows-only",
        readme,
    )
    assert m, "README registry-count sentence not found — keep the format parseable"
    claimed_total, claimed_oracle, claimed_rows_only = map(int, m.groups())

    queries, oracles = _registry()
    assert claimed_total == len(queries), (
        f"README claims {claimed_total} registered queries, registry has "
        f"{len(queries)} — update README.md"
    )
    assert claimed_oracle == len(oracles), (
        f"README claims {claimed_oracle} oracle-backed, registry has "
        f"{len(oracles)} — update README.md"
    )
    assert claimed_rows_only == len(queries) - len(oracles), (
        f"README claims {claimed_rows_only} rows-only, actual is "
        f"{len(queries) - len(oracles)} — update README.md"
    )


def test_readme_headline_count_matches_bench():
    readme = (REPO / "README.md").read_text()
    m = re.search(r"The (\d+)-query\s+headline suite", readme)
    assert m, "README headline-count sentence not found — keep the format parseable"

    import sys

    sys.path.insert(0, str(REPO))
    import bench

    assert int(m.group(1)) == len(bench.HEADLINE), (
        f"README claims a {m.group(1)}-query headline, bench.HEADLINE has "
        f"{len(bench.HEADLINE)} — update README.md"
    )


def test_headline_is_subset_of_registry():
    """Every bench headline entry must be a registered query (a typo'd
    name would make bench.py fail mid-sweep, after minutes of sunk
    measurement)."""
    import sys

    sys.path.insert(0, str(REPO))
    import bench

    queries, _ = _registry()
    missing = [h for h in bench.HEADLINE if h not in queries]
    assert not missing, f"bench.HEADLINE entries not in registry: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate headline entries"


def test_readme_headline_delta_sentence_matches():
    """The 'rN's record was X queries ... with Y headline queries added
    since' aside must satisfy X + Y == len(HEADLINE) — it shipped
    drifted in the same round that added this gate (code-review r10)."""
    readme = (REPO / "README.md").read_text()
    m = re.search(
        r"record was (\d+) queries.*?with\s+(\d+) headline queries added since",
        readme,
        re.S,
    )
    assert m, "README headline-delta sentence not found — keep it parseable"
    base, added = map(int, m.groups())

    import sys

    sys.path.insert(0, str(REPO))
    import bench

    assert base + added == len(bench.HEADLINE), (
        f"README says {base}+{added} headline queries; bench.HEADLINE has "
        f"{len(bench.HEADLINE)} — update README.md"
    )
