import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from information_extraction_t5_spark.session import get_spark

    s = get_spark("tests", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
