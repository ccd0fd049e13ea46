"""Global-ordinal operator: equivalence to row_number over the global
order, multi-partition correctness, and edge cases."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from polygon_algotrading_env_spark.operators.ids import with_global_ordinals


def _check_equiv(df, cols, **kw):
    got = {
        r["k"]: r["ordinal"]
        for r in with_global_ordinals(df, cols, **kw)
        .withColumn("k", F.concat_ws("|", *cols))
        .collect()
    }
    want = {
        r["k"]: r["ordinal"]
        for r in df.withColumn(
            "ordinal", F.row_number().over(Window.orderBy(*cols))
        )
        .withColumn("k", F.concat_ws("|", *cols))
        .collect()
    }
    assert got == want


def test_matches_global_row_number(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * 37 % 1000).alias("a"), F.col("id").alias("b")
    )
    _check_equiv(df, ["a", "b"], num_partitions=8)


def test_single_partition_and_start(spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], "v int")
    rows = {
        r["v"]: r["ordinal"]
        for r in with_global_ordinals(df, ["v"], start=100).collect()
    }
    assert rows == {1: 100, 2: 101, 3: 102}


def test_empty_input(spark):
    df = spark.createDataFrame([], "v int")
    assert with_global_ordinals(df, ["v"]).count() == 0


def test_requires_order_cols(spark):
    with pytest.raises(ValueError):
        with_global_ordinals(spark.range(3), [])


@pytest.mark.parametrize("n", [1, 7, 10, 12, 13, 20, 101])
def test_ntile_closed_form_matches_window_ntile(spark, n):
    """The ordinal→bucket formula used by order_price_deciles must equal
    ntile(10) for EVERY cardinality — ntile front-loads the remainder
    buckets (first r buckets get q+1 rows), which the naive even-spread
    formula gets wrong whenever n % 10 != 0."""
    df = spark.range(1, n + 1).select(F.col("id").alias("ordinal"))
    got = df.selectExpr(
        "ordinal",
        f"""CAST(IF(ordinal <= ({n} % 10) * ({n} DIV 10 + 1),
                    (ordinal - 1) DIV ({n} DIV 10 + 1) + 1,
                    ({n} % 10) + (ordinal - 1 - ({n} % 10) * ({n} DIV 10 + 1))
                        DIV ({n} DIV 10) + 1)
                AS INT) AS decile""",
    )
    want = df.withColumn(
        "decile", F.ntile(10).over(Window.orderBy("ordinal"))
    )
    assert {(r["ordinal"], r["decile"]) for r in got.collect()} == {
        (r["ordinal"], r["decile"]) for r in want.collect()
    }
