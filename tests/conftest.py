from __future__ import annotations

import tempfile

import pytest

from ndap_data_validator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    wh = tempfile.mkdtemp(prefix="ndap_test_wh_")
    s = get_spark(
        app_name="ndap-validator-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
    s.stop()
