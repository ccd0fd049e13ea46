"""Bucketed-table co-located joins: the shuffle disappears from the plan.

This is the load-bearing scale property for fact↔fact joins (SURVEY.md §7
stage 2 note; ARCHITECTURE.md shuffle economics): both sides pre-hashed on
the join key at write time → Catalyst proves co-partitioning and plans the
join with zero Exchange operators.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from polygon_algotrading_env_spark.plans.inspect import plan_stats
from polygon_algotrading_env_spark.sources.writers import write_bucketed_table


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    trades = spark.createDataFrame(
        [(i % 50, float(i), i) for i in range(2000)],
        "acct_id long, amount double, seq long",
    )
    accounts = spark.createDataFrame(
        [(i, f"acct-{i}") for i in range(50)], "acct_id long, name string"
    )
    write_bucketed_table(trades, "t_trades_b", ["acct_id"], n_buckets=8)
    write_bucketed_table(accounts, "t_accounts_b", ["acct_id"], n_buckets=8)
    yield "t_trades_b", "t_accounts_b"
    spark.sql("DROP TABLE IF EXISTS t_trades_b")
    spark.sql("DROP TABLE IF EXISTS t_accounts_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    t, a = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = spark.table(t).join(spark.table(a), "acct_id")
        st = plan_stats(joined)
        assert st.shuffle_exchanges == 0  # co-located: no exchange at all
        assert joined.count() == 2000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    t, _ = bucketed_tables
    agg = spark.table(t).groupBy("acct_id").agg(F.sum("amount").alias("s"))
    st = plan_stats(agg)
    assert st.shuffle_exchanges == 0  # aggregation rides the bucket hashing
    assert agg.count() == 50
