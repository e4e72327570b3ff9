from __future__ import annotations

import pytest

from reviews_quality_check_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="rqc-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
