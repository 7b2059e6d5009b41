from __future__ import annotations

import os

import pytest

from agent_data_wrangler_spark.session import get_spark

SF_DIR = os.environ.get("ADW_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="adw-tests", master="local[4]", extra_conf={
        "spark.sql.shuffle.partitions": "4",
        "spark.ui.enabled": "false",
    })
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
