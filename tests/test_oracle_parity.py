"""Driver-gate replica: every oracle-paired query must match DuckDB exactly
at sf0.01 (the driver's correctness scale factor)."""

from __future__ import annotations

import pytest

from mini_hive_server_spark import registry

from .conftest import SF_ORACLE
from .oracle_harness import compare

SPECS = registry.all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_ORACLE)
    problems = compare(name, df, spec.oracle, SF_ORACLE)
    assert not problems, "\n".join(problems)


def test_no_rows_only_queries():
    """Round-7 lesson (CORRECTNESS_r07): the driver does NOT support
    rows-only checks — an oracle-less registered query burns its window
    slot on a guaranteed `err: no_oracle`. Since round 8 every query is
    oracle-paired; this pins the invariant so a future oracle-less
    registration fails here instead of in the driver gate."""
    rows_only = sorted(n for n, s in SPECS.items() if not s.oracle)
    assert not rows_only, (
        f"oracle-less registered queries (the driver cannot check these): "
        f"{rows_only}"
    )
