"""Skew mitigation: salting for hot keys.

At 100 TB a handful of heavy keys (a boilerplate document's hash, a
dominant symbol, a viral probe) can pin one reducer while the rest of the
cluster idles. AQE's skew-join splitting covers sort-merge joins
automatically (enabled in session.py); these helpers cover the two cases AQE
does not re-plan:

- `salted_join`: replicate-right equi-join for a skewed LEFT side whose
  right side is too big to broadcast. Left rows scatter across
  `n_salts` sub-keys (round-robin on the task-local row index —
  replay-deterministic, no RNG, and exact-duplicate hot rows still
  spread); right rows replicate n_salts ways; the join key becomes
  (key, salt) so a hot key's rows spread over n_salts reducers.
- `salted_topk`: two-phase top-k for skewed grouping keys. A plain
  `row_number().over(partitionBy(key))` funnels every row of a hot key
  through one task; phase 1 takes top-k within (key, salt) — parallel —
  and phase 2 re-ranks the surviving n_salts*k rows per key, which is
  small by construction.

Both are algebraically exact (tested against their unsalted forms); they
trade one extra narrow stage for bounded reducer fan-in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _salt(n_salts: int) -> Column:
    """Per-row salt in [0, n_salts): round-robin over the task-local row
    index. Deterministic under task replay (monotonically_increasing_id is
    a pure function of (partition id, row position), both stable on retry
    of the same input split — unlike rand()), touches no payload bytes
    (hashing whole rows crashed on MapType columns and paid per-row
    hashing of large text/binary), and — the point of salting — spreads
    EXACT-DUPLICATE hot rows across salts, where a row-content hash sent
    every copy of a boilerplate document to the same reducer."""
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys scattered over `n_salts`
    reducers and the right side replicated to match. Output equals
    `left.join(right, on, how)` for 'inner' and 'left' joins — the only
    supported modes: with the right side exploded n_salts ways, an outer
    right/full join would surface every unmatched right row n_salts times."""
    on = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r} "
            "(the replicated right side would duplicate unmatched rows)"
        )
    l = left.withColumn("_salt", _salt(n_salts))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, on=[*on, "_salt"], how=how).drop("_salt")


def salted_topk(
    df: DataFrame,
    key_cols: list[str] | str,
    order_col: str,
    k: int,
    n_salts: int = 8,
    ascending: bool = False,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Exact top-k rows per key, skew-proof: phase 1 ranks within
    (key, salt) — a hot key's rows split across n_salts tasks — phase 2
    re-ranks the <= n_salts*k survivors per key. Adds a `rank` column."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [
        F.col(order_col).asc() if ascending else F.col(order_col).desc(),
        *[F.col(c) for c in (tiebreak_cols or [])],
    ]
    salted = df.withColumn("_salt", _salt(n_salts))
    w1 = Window.partitionBy(*key_cols, "_salt").orderBy(*order)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_salt", "_r1")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
    )
