from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from hiveka_spark.session import get_spark

    s = get_spark("hiveka-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    from hiveka_spark.testing import duck_connect

    return duck_connect(SF_SMOKE)
