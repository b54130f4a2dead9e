"""Analysis-only smoke over the FULL query registry.

Round 4 lesson: an environment drift (PySpark 4.1.2 reading the
fixtures' ``timestamp[us] isAdjustedToUTC=false`` as TIMESTAMP_NTZ)
broke query *analysis* — ``unix_micros`` rejected the new type — and
the first signal was a red driver round. Building every registered
query and forcing ``df.schema`` catches any such drift locally in
under a minute: Catalyst resolves the whole plan (types, function
signatures, column references) without executing a single task.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tw_etl_spark.queries import all_queries

_SPECS = all_queries()


@pytest.mark.parametrize("name", list(_SPECS))
def test_query_analyzes(spark, name):
    df = _SPECS[name].spark(spark, SF_SMOKE)
    # Forcing .schema runs analysis (resolution + type-checking) only.
    assert len(df.schema.fields) > 0, name


def test_every_oracle_plans_in_duckdb():
    """The symmetric guard for the oracle side: EXPLAIN (bind + plan,
    no execution) every oracle SQL against the sf0.001 views, so a
    DuckDB upgrade that drops/renames a function is a red local test
    instead of a red driver round. Whole loop runs in ~2 s."""
    import duckdb

    from tw_etl_spark.catalog import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(SF_SMOKE, t)}')"
        )
    bad = []
    for name, spec in _SPECS.items():
        if spec.oracle is None:
            continue
        try:
            con.execute(f"EXPLAIN {spec.oracle}")
        except Exception as exc:
            bad.append((name, str(exc)[:200]))
    assert not bad, bad


def test_documented_counts_match_registry():
    """Single-source-of-truth guard (VERDICT r8 #7): the registry counts
    documented in COVERAGE.md and README.md must equal what
    ``all_queries()`` actually exposes. Docs carry the canonical phrase
    '<N> registered' / '<M> oracle-bearing'; this test fails whenever a
    registration lands without the docs being refreshed."""
    import re

    n_reg = len(_SPECS)
    n_orc = sum(1 for s in _SPECS.values() if s.oracle is not None)
    for path in ("COVERAGE.md", "README.md"):
        text = open(path).read()
        reg = re.search(r"(\d+) registered", text)
        orc = re.search(r"(\d+) oracle-bearing", text)
        assert reg and orc, f"{path}: canonical count phrases missing"
        assert int(reg.group(1)) == n_reg, (
            f"{path} says {reg.group(1)} registered; registry has {n_reg}"
        )
        assert int(orc.group(1)) == n_orc, (
            f"{path} says {orc.group(1)} oracle-bearing; registry has {n_orc}"
        )


def test_sweep_artifact_counts_match_docs():
    """VERDICT r12 #8: COVERAGE.md's strict-sweep sentence went stale
    ('148/148' while the artifact held 149). The canonical phrase
    'sf0.1 strict sweep: N/N green' must equal the artifact's actual
    result count, and the artifact's failure list must be empty."""
    import json
    import re

    art = json.load(open("tools/sweep_sf01_strict.json"))
    n = len(art["results"])
    assert art["failures"] == [], art["failures"]
    text = open("COVERAGE.md").read()
    m = re.search(r"sf0\.1 strict sweep: (\d+)/(\d+) green", text)
    assert m, "COVERAGE.md: canonical sweep count phrase missing"
    assert int(m.group(1)) == int(m.group(2)) == n, (
        f"COVERAGE.md says {m.group(0)!r}; artifact has {n} results"
    )


def test_never_driver_scored_list_is_pinned():
    """VERDICT r13 #8: rotation debt must be visible in-repo rather
    than recomputed by the judge each round. The canonical COVERAGE.md
    phrase 'never-driver-scored: <list|none>' must equal the actual
    set: oracle-bearing registry names that appear in NO
    CORRECTNESS_r*.json and are NOT in the current DRIVER_WINDOW
    (the driver scores the window this round, so window members are
    scheduled, not debt)."""
    import glob
    import json
    import re

    from tw_etl_spark.queries import DRIVER_WINDOW

    scored: set[str] = set()
    for f in glob.glob("CORRECTNESS_r*.json"):
        scored |= set(json.load(open(f)))
    never = sorted(
        n
        for n, s in _SPECS.items()
        if s.oracle is not None and n not in scored and n not in DRIVER_WINDOW
    )
    text = open("COVERAGE.md").read()
    m = re.search(r"never-driver-scored: ([^(\n]+)", text)
    assert m, "COVERAGE.md: canonical never-driver-scored phrase missing"
    documented = m.group(1).strip().rstrip(".")
    want = ", ".join(never) if never else "none"
    assert documented == want, (
        f"COVERAGE.md says never-driver-scored: {documented!r}; "
        f"registry says {want!r}"
    )
