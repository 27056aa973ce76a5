import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from posmspark.session import get_spark

    s = get_spark("posmspark-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s
