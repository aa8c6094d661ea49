"""DuckDB-oracle parity over the whole catalog (mirrors driver t2).

Runs at sf0.001 for speed; scripts/check_parity.py runs the same
suite at sf0.01 (the driver's gate scale).
"""

from __future__ import annotations

import pytest

from ae_data_integration_spark.catalog import load_all
from ae_data_integration_spark.oracle import check_query, duck_connection
from tests.conftest import SF_SMOKE

REGISTRY = load_all()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_parity(spark, duck, name):
    r = check_query(spark, duck, REGISTRY[name], SF_SMOKE)
    assert r.ok, f"{name}: {r.detail}"
