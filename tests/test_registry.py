"""Registry + driver-contract invariants."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_inventory_size(registry):
    oracle = [q for q in registry.values() if q.oracle]
    assert len(registry) >= 95, "SURVEY §2 declares 95 query ids"
    assert len(oracle) >= 83, "SURVEY §2 declares 83 oracle-tier ids"


def test_every_query_has_category_and_doc(registry):
    for q in registry.values():
        assert q.category in set("ABCDEFGHIJKL"), q.name
        assert q.doc, f"{q.name} missing doc"


def test_driver_contract_shape():
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(isinstance(s, str) and s.strip() for s in osql.values())


def test_entry_runs(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_all_queries_run_smoke(spark, registry):
    """Every registered callable executes at sf0.001 and yields a schema."""
    slow = {"stream_output_modes"}  # exercised in its own test below
    for name, q in sorted(registry.items()):
        if name in slow:
            continue
        df = q.fn(spark, SF_SMALL)
        assert df.columns, name
        assert df.count() >= 0, name
