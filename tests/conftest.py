import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from iiot_data_engineering_lab_assignment_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def events(spark):
    from iiot_data_engineering_lab_assignment_spark.sources.readers import load_table

    return load_table(spark, SF_DIR, "events").cache()


@pytest.fixture(scope="session")
def documents(spark):
    from iiot_data_engineering_lab_assignment_spark.sources.readers import load_table

    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="session")
def embeddings(spark):
    from iiot_data_engineering_lab_assignment_spark.sources.readers import load_table

    return load_table(spark, SF_DIR, "embeddings").cache()
