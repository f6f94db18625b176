"""Driver-t2 mirror: every catalog query vs its DuckDB oracle at
sf0.001 (the driver runs the same protocol at sf0.01)."""

from __future__ import annotations

import pytest

from trisk_datawrangle_spark.catalog import ORACLES, QUERIES
from tests.oracle_harness import run_one


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    ok, msg = run_one(name, spark, duck, sf_dir, QUERIES, ORACLES)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"segment", "priority", "year", "value", "tmsr", "smsp"} == set(
        df.columns
    )


def test_every_query_has_oracle_or_reason():
    no_oracle = set(QUERIES) - set(ORACLES)
    # only hash-based / approximate ops may skip the oracle
    assert no_oracle <= {
        "d3_minhash_lsh",
        "d4_simhash",
        "s2_lsh_bucket_topk",
        "c2_curate_near_dedup",  # LSH stage is hash-seeded
        "m3_multimodal_features",  # stub features are sha-derived
        "e6_hll_distinct_rollup",  # HLL estimates are engine-specific
    }
