"""Registry ordering contract: the driver's correctness gate checks the
first 50 registered queries, so the window must stay exactly the curated
list (never-driver-verified families + the two round-1 hash regressions)."""

from __future__ import annotations

from mini_hive_server_spark import registry


def test_driver_window_is_first_50():
    names = list(registry.all_specs())
    assert len(registry._DRIVER_WINDOW) == 50
    assert len(set(registry._DRIVER_WINDOW)) == 50
    assert tuple(names[:50]) == registry._DRIVER_WINDOW


def test_every_window_name_is_registered():
    specs = registry.all_specs()
    for name in registry._DRIVER_WINDOW:
        assert name in specs


def test_coverage_md_totals_match_registry():
    """COVERAGE.md's Totals block is the map the next round navigates by;
    it went stale twice (r3 said 143, r4 said 181 while the registry held
    204). Pin the stated total to len(all_specs()) so a stale-doc commit
    fails CI instead of reaching the judge."""
    import re
    from pathlib import Path

    text = (Path(__file__).resolve().parent.parent / "COVERAGE.md").read_text()
    m = re.search(
        r"\*\*(\d+) registered queries — (?:ALL )?(\d+) oracle-paired", text
    )
    assert m, "COVERAGE.md Totals block not found (format drifted?)"
    total = len(registry.all_specs())
    paired = sum(1 for s in registry.all_specs().values() if s.oracle)
    assert int(m.group(1)) == total, (
        f"COVERAGE.md says {m.group(1)} registered; registry holds {total}"
    )
    assert int(m.group(2)) == paired, (
        f"COVERAGE.md says {m.group(2)} oracle-paired; registry holds {paired}"
    )


def test_window_regressions_are_oracle_paired():
    # The two round-1 hash-mismatch queries must keep their (fixed) oracles.
    specs = registry.all_specs()
    assert specs["q12_late_lines"].oracle is not None
    assert specs["json_ingest_extract"].oracle is not None


def test_oracle_outputs_carry_no_widened_types():
    """Driver-hash safety net, DuckDB-only (no Spark, runs in seconds):
    every registered oracle's Arrow output schema must be free of
    decimal128/decimal256/hugeint columns. DuckDB silently widens integer
    sums to DECIMAL128 (and decimal-column sums stay decimal), while the
    Spark side emits int64/float64 — equal values, different typed hash at
    the driver's differential gate. This class shipped twice (round-1
    commit 3c26f38, round-3 red rows) before being closed structurally;
    an oracle that needs widening must CAST its output (BIGINT / DOUBLE)."""
    import pyarrow as pa

    from .conftest import SF_SMOKE
    from .oracle_harness import run_duckdb_oracle

    offenders = []
    for name, spec in registry.all_specs().items():
        if not spec.oracle:
            continue
        tbl = run_duckdb_oracle(spec.oracle, SF_SMOKE)
        for fld in tbl.schema:
            # is_decimal covers decimal128 + decimal256; DuckDB exports
            # HUGEINT through Arrow as decimal128(38,0), so it's caught too
            if pa.types.is_decimal(fld.type):
                offenders.append(f"{name}.{fld.name}: {fld.type}")
    assert not offenders, offenders


def test_every_query_checked_windowed_or_queued():
    """Coverage-debt ledger: every registered query must be (a) already
    driver-checked in a past round's CORRECTNESS JSON, (b) in the current
    driver window, or (c) explicitly listed in COVERAGE.md's
    next-rotation queue. A query that is none of the three is silent
    coverage debt —
    exactly the class VERDICT r4 flagged (27 queries had quietly
    accumulated without a driver row)."""
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    checked: set[str] = set()
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        checked |= set(json.load(open(f)).keys())
    window = set(registry._DRIVER_WINDOW)
    cov = (root / "COVERAGE.md").read_text()
    # capture to the first blank line (or EOF), NOT the first literal
    # '.' — a period inside the queue list (e.g. "sf0.01" in an
    # annotation) must not silently truncate the queued-name set
    m = re.search(r"Round-\d+ queue.*?:\*\*(.*?)(?:\n\n|\Z)", cov, re.S)
    assert m, "COVERAGE.md queue block not found"
    queued = set(re.findall(r"`([a-z_0-9]+)`", m.group(1)))
    orphans = [
        n
        for n in registry.all_specs()
        if n not in checked and n not in window and n not in queued
    ]
    assert not orphans, f"silent coverage debt (not checked/windowed/queued): {orphans}"
