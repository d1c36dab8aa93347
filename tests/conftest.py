from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from propulsion_spark import get_spark

    s = get_spark("propulsion-tests", cpus="8", shuffle_partitions=8)
    yield s
    s.stop()
