"""Property-based checks (hypothesis): the native-expression cleaning
functions must agree with a plain-Python model of the reference's pandas
semantics on arbitrary inputs — not just the fixture values."""

from __future__ import annotations

import re
from decimal import Decimal, InvalidOperation

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from dataengineering_londonhousingmap_spark.functions.cleaning import (
    extract_int,
    split_miles,
    to_num,
)

_PRICE = st.text(
    alphabet="£0123456789,. abcPOA", min_size=0, max_size=16
)


def _py_to_num(s: str) -> float | None:
    """Reference model: Decimal(re.sub(r'[^\\d.]', '', price)) — pipeline
    .py:142-144; None where the reference raises/skips."""
    stripped = re.sub(r"[^\d.]", "", s)
    try:
        return float(Decimal(stripped))
    except InvalidOperation:
        return None


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_PRICE, min_size=1, max_size=8))
def test_to_num_matches_reference_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = [r.n for r in df.select(to_num(F.col("s")).alias("n")).collect()]
    want = [_py_to_num(v) for v in values]
    for g, w in zip(got, want):
        if w is None or g is None:
            # engine returns NULL where the model fails to parse; the model
            # may parse pathological dot-strings ('..') differently — both
            # sides must agree something is unparseable
            assert (g is None) == (w is None) or (w is not None and g is not None)
        else:
            assert abs(g - w) < 1e-9, (g, w, values)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.text(alphabet="0123456789abc ", max_size=12), min_size=1, max_size=8))
def test_extract_int_default_semantics(spark, values):
    """First \\d+ match, else the default — pipeline .py:388-395."""
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = [r.n for r in df.select(extract_int(F.col("s"), 7).alias("n")).collect()]
    for g, v in zip(got, values):
        m = re.search(r"\d+", v)
        assert g == (int(m.group()) if m else 7)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.floats(min_value=0, max_value=99, allow_nan=False).map(lambda f: round(f, 2)),
    st.text(alphabet="abcXYZ ", min_size=1, max_size=10).map(str.strip),
)
def test_split_miles_roundtrip(spark, dist, station):
    df = spark.createDataFrame([(f"{dist} miles {station}",)], "s string")
    d, s = split_miles(F.col("s"))
    row = df.select(d.alias("d"), s.alias("st")).collect()[0]
    assert abs(row.d - dist) < 1e-9
    assert row.st == station
