"""Driver-style parity: every queries() entry vs its oracle_sql() via DuckDB
(row count + schema + exact values), mirroring the CORRECTNESS gate."""

import pytest

from tests.parity import run_parity


@pytest.mark.usefixtures("ray_session")
def test_all_queries_match_oracle(sf_dir):
    results = run_parity(sf_dir)
    failures = {
        name: status
        for name, status in results.items()
        if not status[0].startswith("OK")
    }
    assert not failures, failures
