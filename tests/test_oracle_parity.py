"""Driver-gate replica: every oracle-paired query must match DuckDB exactly
at sf0.01 (the driver's correctness scale factor)."""

from __future__ import annotations

import pytest

from mini_hive_server_spark import registry

from .conftest import SF_ORACLE
from .oracle_harness import compare

SPECS = registry.all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_ORACLE)
    problems = compare(name, df, spec.oracle, SF_ORACLE)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, name):
    """Queries without an oracle still must run and return a stable schema."""
    spec = SPECS[name]
    df = spec.fn(spark, SF_ORACLE)
    assert df.columns, f"{name}: no columns"
    assert df.count() >= 0
