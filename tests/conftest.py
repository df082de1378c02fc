import shutil
import tempfile

import pytest

from scrapy_products_tracker_spark.session import get_spark
from scrapy_products_tracker_spark.synth import T1_SMOKE, generate_world, write_world


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def t1_world():
    return generate_world(T1_SMOKE)


@pytest.fixture(scope="session")
def t1_paths(t1_world):
    tmp = tempfile.mkdtemp(prefix="t1world_")
    paths = write_world(t1_world, tmp)
    yield paths
    shutil.rmtree(tmp, ignore_errors=True)


@pytest.fixture()
def tmpdir_path():
    tmp = tempfile.mkdtemp(prefix="sptspark_")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)
