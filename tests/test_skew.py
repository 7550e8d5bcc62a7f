"""Salting utilities are algebraically exact: salted forms must equal their
unsalted equivalents on skewed data (one hot key dominating)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from binance_data_framework_spark.operators.skew import salted_join, salted_topk


def _skewed(spark):
    # 900 rows of the hot key, 100 spread over 20 cold keys
    rows = [("hot", i, float(i % 37)) for i in range(900)] + [
        (f"cold{i % 20}", 1000 + i, float(i)) for i in range(100)
    ]
    return spark.createDataFrame(rows, "k string, id long, v double")


def test_salted_join_matches_plain_inner(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [("hot", 1.5), ("cold3", 2.0), ("cold7", 3.0)], "k string, w double"
    )
    plain = left.join(right, on="k").select("k", "id", "v", "w")
    salted = salted_join(left, right, on="k", n_salts=8).select("k", "id", "v", "w")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    left = _skewed(spark)
    right = spark.createDataFrame([("cold3", 2.0)], "k string, w double")
    plain = left.join(right, on="k", how="left").select("k", "id", "w")
    salted = salted_join(left, right, on="k", n_salts=4, how="left").select(
        "k", "id", "w"
    )
    assert sorted(
        map(tuple, plain.fillna({"w": -1}).collect())
    ) == sorted(map(tuple, salted.fillna({"w": -1}).collect()))


def test_salted_topk_matches_window_topk(spark):
    df = _skewed(spark)
    w = Window.partitionBy("k").orderBy(F.desc("v"), "id")
    plain = (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select("k", "id", "v", "rank")
    )
    salted = salted_topk(df, "k", "v", k=5, n_salts=8, tiebreak_cols=["id"]).select(
        "k", "id", "v", "rank"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
