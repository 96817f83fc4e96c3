from __future__ import annotations

import pytest

from ndap_data_validator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ndap-validator-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
