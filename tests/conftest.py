import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linear_kdtree_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="lkt_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


# F3 worked example (FIXTURES.md): 8 points, canonical mean-split build
F3_POINTS = [
    (0, 61.0, 17.0),
    (1, 12.0, 88.0),
    (2, 37.0, 42.0),
    (3, 93.0, 5.0),
    (4, 25.0, 64.0),
    (5, 78.0, 33.0),
    (6, 50.0, 71.0),
    (7, 8.0, 29.0),
]

# key -> (code, sort_key at 3 path bits)
F3_EXPECTED = {
    7: (7, 0),
    2: (3, 1),
    1: (5, 2),
    4: (1, 3),
    0: (6, 4),
    3: (2, 5),
    6: (4, 6),
    5: (0, 7),
}

# heap node_id -> (depth, axis, value)
F3_SPLITS = {
    0: (0, 0, 45.5),
    1: (1, 1, 55.75),
    2: (1, 1, 31.5),
    3: (2, 0, 22.5),
    4: (2, 0, 18.5),
    5: (2, 0, 77.0),
    6: (2, 0, 64.0),
}
