"""NULL/malformed-payload injection: the latent-divergence class the
round-3/4 advisors kept finding (NULL rank order, cast-of-garbage, NULL
group keys) made systematic. A corrupted copy of ``events`` — 10% NULL
props, 10% non-numeric k, 10% empty JSON object — is written once, and
every props-consuming oracled operator is differentially re-checked on it.
Divergences that are invisible on the clean generated corpus (which has no
NULL k anywhere) fail here instead of in a future driver round.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

from training_feed_kinesis_spark.tables import TABLES

from .conftest import SF_DIR, assert_matches_oracle

# Every oracled registry key whose Spark side or oracle reads props.$.k —
# keep in sync by grepping get_json_object/json_extract_string over
# training_feed_kinesis_spark/operators/.
PROPS_CONSUMERS = [
    "fn_json",
    "fn_map_hof",
    "fn_variant",
    "stat_spearman",
    "dq_category_drift",
]


@pytest.fixture(scope="module")
def corrupted_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("nullsf")
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    duckdb.execute(
        f"""
        COPY (
          SELECT event_id, ts, user_id, event_type, value,
                 CASE WHEN event_id % 10 = 0 THEN NULL
                      WHEN event_id % 10 = 1 THEN '{{"k": "abc"}}'
                      WHEN event_id % 10 = 2 THEN '{{}}'
                      ELSE props END AS props
          FROM read_parquet('{SF_DIR}/events.parquet')
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    return str(d)


@pytest.fixture(scope="module")
def duck_corrupted(corrupted_sf):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{corrupted_sf}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def registry():
    from training_feed_kinesis_spark.registry import load_all

    return load_all()


@pytest.mark.parametrize("key", PROPS_CONSUMERS)
def test_props_consumer_survives_corruption(
    key, spark, registry, corrupted_sf, duck_corrupted
):
    spec = registry[key]
    assert spec.oracle is not None, key
    assert_matches_oracle(
        spec.fn(spark, corrupted_sf), duck_corrupted, spec.oracle
    )
