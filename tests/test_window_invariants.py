"""Driver-window eligibility guards -- the two red-row classes the driver
has hit so far can never recur if these hold:

  r1/r4 `err: no_oracle`      -> every CORRECTNESS_WINDOW entry must carry
                                 oracle SQL (rows-only queries burn a slot
                                 as a red row by construction);
  r2/r4 `unhashable: 'list'`  -> every window query must return a FLAT
                                 schema (the driver's pandas canonicalizer
                                 cannot sort array/map/struct cells).

Schema flatness is read from the ANALYZED plan (df.schema) -- no job is
launched for the check itself, though a handful of registered fns do run
Spark work at DataFrame-construction time (persist+count caches, k-means /
PQ training iterations), so the parametrized sweep still costs a couple of
minutes of real execution. PENDING_WINDOW names get the same flatness
check so a nested shape is caught the round it is written, not the round
it rotates into the window.
"""

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from streamprocessing_with_kafka_spark.plans.registry import (
    CORRECTNESS_WINDOW,
    PENDING_WINDOW,
    registry,
)

_REG = registry()


def test_window_is_50_unique_registered():
    assert len(CORRECTNESS_WINDOW) == 50
    assert len(set(CORRECTNESS_WINDOW)) == 50
    assert all(n in _REG for n in CORRECTNESS_WINDOW)


@pytest.mark.parametrize("name", CORRECTNESS_WINDOW)
def test_window_entry_has_oracle(name):
    assert _REG[name].sql is not None, (
        f"{name} is rows-only (sql=None) but occupies a driver window slot "
        f"-- the driver reports it as a red `no_oracle` row by construction"
    )


@pytest.mark.parametrize("name", sorted(set(CORRECTNESS_WINDOW) | set(PENDING_WINDOW)))
def test_window_entry_schema_is_flat(name, spark, sf_dir):
    df = _REG[name].fn(spark, sf_dir)
    nested = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not nested, (
        f"{name} returns nested column(s) {nested} -- the driver's pandas "
        f"canonicalizer cannot sort these (r2 mm_feature_extract / r4 "
        f"text_hashed_tfidf failure); register a flat projection"
    )
