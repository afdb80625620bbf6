from __future__ import annotations

import shutil
import tempfile

import pytest

from debezium_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("debezium_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmp_root():
    d = tempfile.mkdtemp(prefix="dbzspark_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
