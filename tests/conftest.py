from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from cdc_practice_spark.session import get_spark

    spark = get_spark("tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _release_operator_caches():
    """The tracked_persist contract (plans/cache.py): whoever
    materializes an operator's result releases its internal caches.
    Tests materialize, so release after every test — otherwise cached
    subtrees from one test get substituted by Spark's CacheManager into
    a LATER test's plans (observed: a maintenance test's persisted
    delta frame changed a plan test's Exchange count)."""
    yield
    from cdc_practice_spark.plans.cache import release_tracked

    release_tracked()
