"""One differential test per registered operator (SURVEY.md §5.4).

Replicates the driver's check locally at sf0.001: every operator with an
oracle is hash-compared against DuckDB; rows-only operators must run and
return a well-formed (possibly empty) DataFrame with a stable schema.
"""

from __future__ import annotations

import pytest

from training_feed_kinesis_spark.registry import load_all

from .conftest import SF_DIR, assert_matches_oracle

_REGISTRY = load_all()


@pytest.mark.parametrize("key", sorted(_REGISTRY))
def test_operator(key, spark, duck):
    spec = _REGISTRY[key]
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is not None:
        assert_matches_oracle(df, duck, spec.oracle)
    else:
        rows = df.collect()
        assert rows is not None
        assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_contract_shape():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q), "oracle keys must be a subset of query keys"
    assert len(q) > 0
