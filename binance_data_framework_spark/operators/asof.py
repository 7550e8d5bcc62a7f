"""Time-alignment joins: as-of (latest-prior) and range (interval) joins.

Natural multi-series extension of the reference's single-series model
(SURVEY.md §2b `asof_align`). Spark has no ASOF JOIN operator; the naive
formulations are either a range join (O(n*m) pairs) or a union + global-order
window (single-partition shuffle — a non-starter at 100 TB).

Scalable two-level design (time-bucketed union-window):
 1. bucket both sides by a coarse time bucket (default 1 day) and UNION them
    with a source tag (right rows sort before left rows at equal ts, giving
    inclusive `right.ts <= left.ts` semantics);
 2. one window pass per bucket — partitioned by (by, bucket), ordered by
    (ts, tag) — forward-fills the latest right value onto each left row.
    Linear in bucket size (the join+group formulation is O(L*R) pairs per
    bucket — quadratic when both sides are dense);
 3. the per-bucket "carry" (value inherited from prior buckets, for left rows
    that precede every right row in their bucket) comes from a tiny
    bucket-timeline aggregate — n_buckets rows, window over buckets not rows —
    left-joined back (AQE broadcasts it).

With `by` keys (per-symbol as-of) every step is additionally keyed —
partition-parallel across series; without them the per-bucket window is still
parallel across buckets and the only serial structure is the tiny bucket
timeline.
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
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    lextra = [c for c in left.columns if c not in by]

    r = right.select(
        *by,
        F.col(ts_col).alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ).withColumn("_b", F.window(F.col("_rts"), bucket)["start"])

    lu = left.select(
        *by,
        F.window(F.col(ts_col), bucket)["start"].alias("_b"),
        F.col(ts_col).alias("_ats"),
        F.lit(1).alias("_src"),
        *[F.col(c).alias(f"_l_{c}") for c in lextra],
        *[F.lit(None).cast(rtypes[c]).alias(f"_r_{c}") for c in value_cols],
    )
    ru = r.select(
        *by,
        "_b",
        F.col("_rts").alias("_ats"),
        F.lit(0).alias("_src"),
        *[F.lit(None).cast(ltypes[c]).alias(f"_l_{c}") for c in lextra],
        *[F.col(f"_r_{c}") for c in value_cols],
    )
    u = lu.unionByName(ru)

    # step 2: per-(by, bucket) forward fill; right rows win ties via _src
    w_fill = (
        Window.partitionBy(*by, "_b")
        .orderBy("_ats", "_src")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *by,
        "_b",
        "_src",
        *[F.col(f"_l_{c}") for c in lextra],
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w_fill).alias(f"_m_{c}")
            for c in value_cols
        ],
    ).where(F.col("_src") == 1)

    # step 3: strictly-prior carry over the bucket timeline. ONE aggregation
    # over the union yields both the complete bucket set (left or right rows)
    # and each bucket's last right value — max_by's ordering key is nulled for
    # left rows, so they contribute the bucket but never a value.
    per_bucket = u.groupBy(*by, "_b").agg(
        *[
            F.max_by(
                f"_r_{c}", F.when(F.col("_src") == 0, F.col("_ats"))
            ).alias(f"_last_{c}")
            for c in value_cols
        ]
    )
    w_prior = (
        (Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1)))
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = per_bucket.select(
        *by,
        "_b",
        *[
            F.last(f"_last_{c}", ignorenulls=True).over(w_prior).alias(f"_prev_{c}")
            for c in value_cols
        ],
    )

    # step 4: same-bucket fill wins, else carry from prior buckets
    return filled.join(carry, on=[*by, "_b"], how="left").select(
        *[
            (F.col(c) if c in by else F.col(f"_l_{c}").alias(c))
            for c in left.columns
        ],
        *[
            F.coalesce(F.col(f"_m_{c}"), F.col(f"_prev_{c}")).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    window_sec: int,
    ts_col: str = "ts",
    by: tuple[str, ...] = (),
    value_cols: tuple[str, ...] = ("value",),
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs with |right.ts − left.ts| <= window_sec (both
    endpoints inclusive), optionally per ``by`` equi-keys — the interval
    companion to `asof_join` (correlate every event with its neighborhood,
    not just the latest-prior row).

    Spark plans a raw inequality join as BroadcastNestedLoop/cartesian —
    O(L×R) pair evaluations. Scale shape: quantize both sides into
    width-``window_sec`` time buckets; a qualifying pair's bucket ids can
    differ by at most 1, so the LEFT side explodes to its 3 adjacent bucket
    ids and the join becomes an EQUI-join on (by…, bucket) —
    shuffle-partitioned on real keys, pair work bounded by per-bucket
    density, never |L|×|R|. Each qualifying pair meets on exactly ONE
    bucket id (the right row's), so no dedup pass is needed; the residual
    |Δts| <= w predicate runs post-join inside codegen. This is the
    quantize-to-equi-key trick behind vendor range-join optimizations,
    expressed with public DataFrame ops.

    Output: all left columns + ``ts<suffix>`` + one ``<c><suffix>`` per
    value column; inner semantics (unpartnered left rows drop)."""
    by = list(by)
    w_us = int(window_sec) * 1_000_000

    lb = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(w_us))
    l = left.withColumn("_b", F.explode(F.array(lb - 1, lb, lb + 1)))
    rts = f"{ts_col}{suffix}"
    r = right.select(
        *by,
        F.col(ts_col).alias(rts),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn("_b", F.floor(F.unix_micros(F.col(rts)) / F.lit(w_us)))
    delta = F.unix_micros(F.col(rts)) - F.unix_micros(F.col(ts_col))
    return (
        l.join(r, on=["_b", *by])
        .where(F.abs(delta) <= F.lit(w_us))
        .select(*left.columns, rts, *[f"{c}{suffix}" for c in value_cols])
    )
