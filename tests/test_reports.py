from __future__ import annotations

import pytest

from .conftest import SF_SMALL
from .oracle import assert_parity

PARITY_QUERIES = [
    "report_sales_by_customer",
    "report_sales_by_supplier",
    "join3_projection",
    "incremental_scan_hwm",
]


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_parity(spark, name):
    assert_parity(spark, name, SF_SMALL)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"c_custkey", "c_name", "order_date", "total"}


def test_contract_shape():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)
