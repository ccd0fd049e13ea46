"""Table fingerprints: multiset sensitivity and invariances."""

import pyspark.sql.functions as F

from polygon_algotrading_env_spark.operators.checksum import table_fingerprint


def _fp(df):
    r = table_fingerprint(df, df.columns).collect()[0]
    return (r["n_rows"], r["xor_fp"], r["sum_fp"])


def test_order_and_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(100)], "id int, s string"
    )
    assert _fp(df) == _fp(df.orderBy(F.desc("id")).repartition(7))


def test_detects_changed_missing_and_duplicated_rows(spark):
    base = spark.createDataFrame(
        [(i, f"s{i}") for i in range(10)], "id int, s string"
    )
    changed = base.withColumn(
        "s", F.when(F.col("id") == 3, "mutated").otherwise(F.col("s"))
    )
    assert _fp(base) != _fp(changed)
    assert _fp(base) != _fp(base.where("id <> 3"))
    # duplicate PAIR: xor cancels, sum/count still catch it
    dup2 = base.unionAll(base.where("id = 3")).unionAll(base.where("id = 3"))
    b, d = _fp(base), _fp(dup2)
    assert b != d and b[1] == d[1]


def test_null_vs_empty_and_boundary_shift(spark):
    a = spark.createDataFrame([(1, None)], "id int, s string")
    b = spark.createDataFrame([(1, "")], "id int, s string")
    assert _fp(a) != _fp(b)
    c = spark.createDataFrame([("ab", "c")], "x string, y string")
    d = spark.createDataFrame([("a", "bc")], "x string, y string")
    assert _fp(c) != _fp(d)


def test_empty_relation_fingerprint(spark):
    e = spark.createDataFrame([], "id int, s string")
    assert _fp(e) == (0, 0, 0)


def test_snapshot_diff_multiset_exact(spark):
    import pytest

    from polygon_algotrading_env_spark.operators.checksum import snapshot_diff

    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (2, "y"), (3, "z")], "id int, s string"
    )
    b = spark.createDataFrame(
        [(1, "x"), (2, "y"), (4, "w")], "id int, s string"
    )
    got = {
        (r["id"], r["s"]): (r["n_left"], r["n_right"])
        for r in snapshot_diff(a, b).collect()
    }
    assert got == {(2, "y"): (2, 1), (3, "z"): (1, 0), (4, "w"): (0, 1)}
    assert snapshot_diff(a, a).count() == 0
    with pytest.raises(ValueError):
        snapshot_diff(a, b.drop("s"))
    with pytest.raises(ValueError, match="duplicate"):
        snapshot_diff(a, b, cols=["id", "id"])


def test_snapshot_diff_between_table_versions(spark, tmp_path):
    from polygon_algotrading_env_spark.operators.checksum import snapshot_diff
    from polygon_algotrading_env_spark.sources.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"))
    t.write(spark.createDataFrame([(3, "c")], "id long, s string"), mode="append")
    d = snapshot_diff(t.read(version=0), t.read(version=1))
    assert {(r["id"], r["n_left"], r["n_right"]) for r in d.collect()} == {
        (3, 0, 1)
    }
