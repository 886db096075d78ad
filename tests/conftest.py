import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pq_engine.spark.session import get_spark

    s = get_spark(cores=8, app="pq_engine_tests")
    yield s
    s.stop()
