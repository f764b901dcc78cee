"""Shared fixtures."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from docling_core_spark.session import get_spark

    sp = get_spark(app_name="tests", master="local[4]",
                   shuffle_partitions=8)
    yield sp
    sp.stop()
