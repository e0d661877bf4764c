from __future__ import annotations

import pytest

from dig_entity_resolution_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="er-tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()
