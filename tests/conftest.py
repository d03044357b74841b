import os
import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from crusty_core_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # lean for tests
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="crusty_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def pages_df(spark, rows):
    """pages rows (datagen dicts) → Spark DataFrame."""
    import pandas as pd

    from crusty_core_spark.sources.datagen import PAGES_DDL

    pdf = pd.DataFrame(rows)
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"], utc=True).dt.tz_localize(None)
    cols = [c.strip().split(" ")[0] for c in PAGES_DDL.split(",")]
    return spark.createDataFrame(pdf[cols], schema=PAGES_DDL)
