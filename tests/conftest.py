import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from bloom_filter_spark.session import get_spark
    s = get_spark("bfs-tests", master="local[4]", shuffle_partitions=8,
                  driver_memory="8g")
    yield s


@pytest.fixture(scope="session")
def sf_small():
    """Materialized sf0.001 fixture dir (tokens + probe tables)."""
    from bloom_filter_spark.sources import ensure_fixtures
    return ensure_fixtures("sf0.001")
