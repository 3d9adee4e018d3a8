import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from syzgydb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="syzgydb-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def registry_dfs(spark, sf_dir):
    """Every queries() entry bound ONCE per session: three blanket
    gates (cartesian sweep, scalability sweep, result-shape sweep)
    each iterate the full registry, and binding a lifecycle query
    executes real store builds — paying that three times was ~90 s of
    pure repetition in the full run (r8 verdict task 8). The gates
    only inspect plans/schemas, never execute or mutate, so sharing
    the DataFrames is safe."""
    import __spark_entry__ as E

    return {name: fn(spark, sf_dir) for name, fn in E.queries().items()}
