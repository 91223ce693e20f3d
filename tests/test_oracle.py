"""Differential tests: every registered query, Spark vs DuckDB oracle.

Local mirror of the driver's t2 gate (sf0.001 here for speed; the driver
runs sf0.01). Queries with ``oracle=None`` get a rows+schema smoke check.
"""

from __future__ import annotations

import pytest

from aind_protein_data_transformation_spark.plans.canonical import compare_frames
from aind_protein_data_transformation_spark.queries import REGISTRY


def _all_names():
    return sorted(REGISTRY)


@pytest.mark.parametrize("name", _all_names())
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    spark_pd = sdf.toPandas()
    if spec.oracle is None:
        # rows-only check (non-SQL-expressible operator)
        assert spark_pd.shape[1] > 0, f"{name}: no columns"
        return
    oracle_pd = duck.execute(spec.oracle).fetchdf()
    ok, msg = compare_frames(spark_pd, oracle_pd)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 0


def test_contract_shapes():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())
