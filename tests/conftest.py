from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cstore_fdw_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    import tempfile
    spark = get_spark(app_name="cstore_fdw_spark-tests",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
                      extra_confs={"spark.sql.warehouse.dir":
                                   tempfile.mkdtemp(prefix="spark_wh_")})
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture()
def catalog(spark, tmp_path):
    from cstore_fdw_spark.catalog import CStoreCatalog
    return CStoreCatalog(spark, warehouse=str(tmp_path / "warehouse"))
