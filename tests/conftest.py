from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from etl_excel_csv_sql_spark.session import get_spark

    spark = get_spark(
        "pytest",
        conf={
            # small fixtures → tiny shuffles; keep task overhead down
            "spark.sql.shuffle.partitions": "4",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture()
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
