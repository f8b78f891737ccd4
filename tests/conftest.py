from __future__ import annotations

import pytest

from python_crawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pcs-tests", parallelism=4, shuffle_partitions=8)
    yield s
    s.stop()
