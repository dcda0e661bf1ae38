import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


@pytest.fixture(scope="session")
def spark():
    from i_landsat8_swlst_spark.session import get_spark

    s = get_spark(app="tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
