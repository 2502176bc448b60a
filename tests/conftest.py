import pytest

from reach_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="reach-spark-tests", cores=4,
                  shuffle_partitions=8)
    yield s
