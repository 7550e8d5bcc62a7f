"""As-of join: align a left event stream with the latest-prior right value.

Natural multi-series extension of the reference's single-series model
(SURVEY.md §2b `asof_align`). Spark has no ASOF JOIN operator; the naive
formulations are either a range join (O(n*m) pairs) or a union + global-order
window (single-partition shuffle — a non-starter at 100 TB).

Scalable two-level design (time-bucketed):
 1. bucket both sides by a coarse time bucket (default 1 day);
 2. per bucket, aggregate the right side's last (ts, value) — output is
    n_buckets rows — then forward-fill across the bucket timeline with a
    strictly-prior window frame: the "carry" each bucket inherits from the
    past. The ordered window runs over buckets (days), not rows;
 3. equi-join left rows to right rows on the bucket key (co-partitioned
    shuffle, no cross product beyond one bucket's width) and take the latest
    right ts <= left ts with max_by;
 4. left rows with no same-bucket prior match fall back to the carry.

With `by` keys (per-symbol as-of) every step is additionally keyed —
partition-parallel across series; without them the only serial structure is
the tiny bucket timeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    by: tuple[str, ...] = (),
    bucket: str = "1 day",
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right-side value(s) from the row with the
    greatest right.ts <= left.ts (nearest-prior semantics; left rows with no
    prior right row get nulls). `by` adds equi-key columns present on both
    sides. Output: all left columns + one `<c><suffix>` per value column."""
    by = list(by)
    bcol = F.window(F.col(ts_col), bucket)["start"]

    l = left.withColumn("_b", bcol).withColumn(
        "_lid", F.monotonically_increasing_id()
    )
    r = right.select(
        *by, F.col(ts_col).alias("_rts"), *[F.col(c).alias(f"_r_{c}") for c in value_cols]
    ).withColumn("_b", F.window(F.col("_rts"), bucket)["start"])

    # step 2: per-bucket last right value, then strictly-prior carry-forward
    per_bucket = r.groupBy(*by, "_b").agg(
        *[F.max_by(f"_r_{c}", F.col("_rts")).alias(f"_last_{c}") for c in value_cols]
    )
    all_buckets = (
        l.select(*by, "_b").unionByName(per_bucket.select(*by, "_b")).distinct()
    )
    w_prior = (
        (Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1)))
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = all_buckets.join(per_bucket, on=[*by, "_b"], how="left").select(
        *by,
        "_b",
        *[
            F.last(f"_last_{c}", ignorenulls=True).over(w_prior).alias(f"_prev_{c}")
            for c in value_cols
        ],
    )

    # step 3: same-bucket nearest-prior match per left row
    matches = (
        l.select(*by, "_b", "_lid", ts_col)
        .join(r, on=[*by, "_b"], how="inner")
        .where(F.col("_rts") <= F.col(ts_col))
        .groupBy("_lid")
        .agg(
            *[
                F.max_by(f"_r_{c}", F.col("_rts")).alias(f"_m_{c}")
                for c in value_cols
            ]
        )
    )

    # step 4: match wins, else carry from prior buckets
    out = (
        l.join(matches, on="_lid", how="left")
        .join(carry, on=[*by, "_b"], how="left")
        .select(
            *left.columns,
            *[
                F.coalesce(F.col(f"_m_{c}"), F.col(f"_prev_{c}")).alias(
                    f"{c}{suffix}"
                )
                for c in value_cols
            ],
        )
    )
    return out
