from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from openie_spark.session import build_session

    s = build_session(
        app_name="openie-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s
    s.stop()
