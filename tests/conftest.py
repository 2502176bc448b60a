import tempfile

import pytest

from reach_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # warehouse in a tmpdir so saveAsTable tests never write into the repo
    wh = tempfile.mkdtemp(prefix="reach_spark_wh_")
    s = get_spark(app_name="reach-spark-tests", cores=4,
                  shuffle_partitions=8,
                  extra_conf={"spark.sql.warehouse.dir": wh})
    yield s


@pytest.fixture(autouse=True)
def _release_caches(request):
    """Clear session cache blocks after every test. Pipeline calls persist
    intermediates (the production default — without a persist, every
    downstream branch re-runs the extraction UDF + KB joins CONCURRENTLY,
    measured 7-15x slower on multi-branch consumers); tests must not let
    those blocks, or a failed test's leftovers, accumulate across the
    session. Runs only when the test actually used the spark fixture."""
    yield
    if "spark" in request.fixturenames:
        request.getfixturevalue("spark").catalog.clearCache()
