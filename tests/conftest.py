"""Shared fixtures: one SparkSession per test session, synth fixtures on demand.

Tests run on a small local master (local[4]) with few shuffle partitions so
the suite stays fast; scale behavior is exercised separately in bench.py.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from web_crawler_spark import synth  # noqa: E402
from web_crawler_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="wcs-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_small():
    """Synthetic fixture dir for sf0.001 (1k pages)."""
    return synth.ensure_synth("0.001")


def synth_tbl(spark, sf: str, name: str):
    synth.ensure_synth(sf)
    return spark.read.parquet(synth.synth_path(sf, name))
