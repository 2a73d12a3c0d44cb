from __future__ import annotations

import pytest

from mini_hive_server_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # No teardown on purpose: get_spark shares one getOrCreate JVM for the
    # whole suite; stopping it here would kill later session-scoped users.
    return get_spark(app_name="mhs-tests", shuffle_partitions=8)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
