"""Property-based tests (hypothesis) for the two semantics most likely to be
silently wrong under shuffle (SURVEY §7 "what's hard" #1): time-ordered
first/last in resample buckets, and nearest-prior as-of matching across
bucket boundaries. Each property is checked against an independent pandas
brute-force model on randomized inputs."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from binance_data_framework_spark.operators.asof import asof_join
from binance_data_framework_spark.operators.ohlcv import resample_ohlcv

T0 = datetime(2024, 1, 1)

# (minute-offset, price) ticks with unique timestamps per example
_ticks = st.dictionaries(
    st.integers(min_value=0, max_value=60 * 48),  # two days of minutes
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    min_size=1,
    max_size=60,
).map(lambda d: sorted(d.items()))


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_ticks)
def test_resample_matches_pandas(spark, data):
    rows = [("S", T0 + timedelta(minutes=m), float(p)) for m, p in data]
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, price double")
    got = {
        r["bucket"]: (r["open"], r["high"], r["low"], r["close"], r["n_ticks"])
        for r in resample_ohlcv(df, "1h").collect()
    }

    pdf = pd.DataFrame(rows, columns=["symbol", "ts", "price"]).set_index("ts")
    ref = pdf["price"].resample("1h").agg(["first", "max", "min", "last", "count"]).dropna()
    assert len(got) == len(ref)
    for bucket, row in ref.iterrows():
        o, h, l, c, n = got[bucket.to_pydatetime()]
        assert (o, h, l, c) == (row["first"], row["max"], row["min"], row["last"])
        assert n == int(row["count"])


_times = st.lists(
    st.integers(min_value=0, max_value=60 * 72), min_size=1, max_size=40, unique=True
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=_times, right=_times)
def test_asof_matches_bruteforce(spark, left, right):
    lrows = [(i, T0 + timedelta(minutes=m)) for i, m in enumerate(sorted(left))]
    rrows = [(T0 + timedelta(minutes=m), float(m)) for m in sorted(right)]
    ldf = spark.createDataFrame(lrows, "event_id long, ts timestamp")
    rdf = spark.createDataFrame(rrows, "ts timestamp, value double")
    got = {
        r["event_id"]: r["value_asof"]
        for r in asof_join(ldf, rdf, value_cols=("value",)).collect()
    }
    assert len(got) == len(lrows)
    for i, lts in lrows:
        prior = [v for rts, v in rrows if rts <= lts]
        expect = prior[-1] if prior else None
        assert got[i] == expect, f"event {i} at {lts}: got {got[i]}, want {expect}"
