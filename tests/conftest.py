import os

import pytest

# sandbox knob: shuffle/spill on tmpfs (burst-throttled block device here);
# the library session default stays on disk — see session.py
os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")

from splade_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="splade_spark_tests",
                  shuffle_partitions=4)
    yield s
    s.stop()
