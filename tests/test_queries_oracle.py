"""Driver-style parity: every queries() entry vs its oracle_sql() via DuckDB
(row count + schema + exact values), mirroring the CORRECTNESS gate."""

import pytest

from tests.parity import run_parity


@pytest.mark.usefixtures("ray_session")
def test_all_queries_match_oracle(sf_dir):
    # kg_* queries are excluded here: the KG pipeline is already verified
    # EXACTLY against the serial oracle in test_kg_pipeline (stronger than
    # the rows-only check this harness would apply), and rebuilding the KG
    # dominates suite runtime at the 4-CPU test session.
    import __ray_entry__ as entrymod

    names = {n for n in entrymod.queries() if not n.startswith("kg_")}
    results = run_parity(sf_dir, only=names)
    failures = {
        name: status
        for name, status in results.items()
        if not status[0].startswith("OK")
    }
    if failures:
        # surface immediately: teardown of a long Ray session can outlive
        # the harness timeout and swallow pytest's end-of-run traceback
        print(f"\nPARITY FAILURES: {failures}", flush=True)
    assert not failures, failures
