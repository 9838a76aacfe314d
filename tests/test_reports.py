from __future__ import annotations

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
