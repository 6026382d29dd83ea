from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ed_fi_x_tpdm_data_ingestion_poc_spark.session import EngineConfig, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(EngineConfig(app_name="engine-tests", shuffle_partitions=8))
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
