import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The suite always exercises the LIVE ANN training plans: every plan
# audit and capacity test must pin the real build, not a cache scan.
# tests/test_ann_cache.py re-enables the persisted-index path
# explicitly and diffs both branches row-for-row.
os.environ["SPARK_GRAFT_ANN_CACHE"] = "0"
# Same rule for the budget gate's cached decision record: the suite
# always drains the live topology (tests/test_gate_cache.py turns the
# cache on explicitly and diffs both branches row-for-row).
os.environ["SPARK_GRAFT_GATE_CACHE"] = "0"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from durablestreams_spark.session import get_spark

    s = get_spark("durablestreams_tests", shuffle_partitions=8)
    yield s


@pytest.fixture()
def catalog(tmp_path):
    from durablestreams_spark import StreamCatalog

    return StreamCatalog(str(tmp_path / "streams"))


def sf_dir(sf: str = "0.001") -> str:
    return f"/root/testdata/sf{sf}"
