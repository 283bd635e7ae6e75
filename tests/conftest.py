from __future__ import annotations

import pytest

from binlog_es_go_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("tests", parallelism=4, shuffle_partitions=8)
    yield s
    s.stop()
