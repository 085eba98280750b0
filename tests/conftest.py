import shutil
import tempfile

import pytest

from disco_crawl_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("disco-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_warehouse():
    d = tempfile.mkdtemp(prefix="disco_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
