import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from rca_pdf_extraction_pipeline_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # fast test startup
    spark = get_spark(app_name="rca-tests", shuffle_partitions=8)
    yield spark
    spark.stop()
