import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from georiva_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("georiva-tests", extra_conf={
        # tiny fixtures: avoid 32-task scheduling overhead per stage
        "spark.sql.shuffle.partitions": "4",
    })
    yield s
