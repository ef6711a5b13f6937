from __future__ import annotations

import pytest

from rdflib_r2r_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    sp = get_spark(app_name="rdflib_r2r_spark_tests")
    yield sp


SF_DIR = "/root/testdata/sf0.001"
