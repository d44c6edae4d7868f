import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_spark(parallelism: int = 4):
    from yatsm_spark.conf import get_spark

    return get_spark(app_name="yatsm-spark-tests", master=f"local[{parallelism}]")


@pytest.fixture(scope="session")
def spark():
    s = _make_spark(4)
    yield s
    s.stop()
