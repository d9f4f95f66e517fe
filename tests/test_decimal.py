"""Decimal fixed-point parity — every row of the reference's
DecimalTest.java ported, plus the wide-number tag formatting
(TagValues.java:52-75) and the Column twin."""

import math

import pytest
from pyspark.sql import functions as F

from geodesk_spark import decimal_fp as D

# (input, strict, expected_double, expected_string) — DecimalTest.java:30-82
PARSE_ROWS = [
    (".5", False, 0.5, "0.5"),
    (".5", True, float("nan"), "invalid"),
    ("", False, float("nan"), "invalid"),
    ("", True, float("nan"), "invalid"),
    ("0", False, 0.0, "0"),
    ("0", True, 0.0, "0"),
    ("007", False, 7.0, "7"),
    ("007", True, float("nan"), "invalid"),
    ("08135", False, 8135.0, "8135"),
    ("08135", True, float("nan"), "invalid"),
    ("3.5 t", False, 3.5, "3.5"),
    ("3.5 t", True, float("nan"), "invalid"),
    ("50", False, 50.0, "50"),
    ("50", True, 50.0, "50"),
    ("01", False, 1.0, "1"),
    ("01", True, float("nan"), "invalid"),
    ("0.0", False, 0.0, "0.0"),
    ("0.0", True, 0.0, "0.0"),
    ("0.00", False, 0.0, "0.00"),
    ("0.00", True, 0.0, "0.00"),
    ("0.500", False, 0.5, "0.500"),
    ("0.500", True, 0.5, "0.500"),
    ("00.500", False, 0.5, "0.500"),
    ("00.500", True, float("nan"), "invalid"),
    ("0.", False, 0.0, "0"),
    ("0.", True, float("nan"), "invalid"),
    (".25", False, 0.25, "0.25"),
    (".25", True, float("nan"), "invalid"),
    ("-0.0000", False, 0.0, "0.0000"),
    ("-0.0000", True, float("nan"), "invalid"),
    ("4.25.", False, 4.25, "4.25"),
    ("4.25.", True, float("nan"), "invalid"),
    ("1000000000000000000000000000", False, float("nan"), "invalid"),
    ("1000000000000000000000000000", True, float("nan"), "invalid"),
]

# (mantissa, scale, expected) — DecimalTest.testToString
TOSTRING_ROWS = [
    (1, 2, "0.01"),
    (-3, 3, "-0.003"),
    (0, 4, "0.0000"),
    (33000, 3, "33.000"),
    (21, 1, "2.1"),
    (-5522, 2, "-55.22"),
    (-10425799000, 7, "-1042.5799000"),
    (107, 0, "107"),
    (-4455, 0, "-4455"),
    (0, 0, "0"),
    (345678901234567890, 0, "345678901234567890"),
    (-345678901234567890, 0, "-345678901234567890"),
]


@pytest.mark.parametrize("s,strict,dval,sval", PARSE_ROWS)
def test_parse_rows(s, strict, dval, sval):
    d = D.parse(s, strict)
    got = D.to_double(d)
    if math.isnan(dval):
        assert math.isnan(got)
    else:
        assert got == pytest.approx(dval, abs=1e-7)
    assert D.to_string(d) == sval


@pytest.mark.parametrize("m,sc,want", TOSTRING_ROWS)
def test_to_string_rows(m, sc, want):
    assert D.to_string(D.of(m, sc)) == want


def test_normalized():
    assert D.to_string(D.normalized(D.parse("0.500"))) == "0.5"
    assert D.to_string(D.normalized(D.parse("12.000"))) == "12"
    assert D.to_string(D.normalized(D.parse("12.300"))) == "12.3"
    assert D.normalized(D.INVALID) == D.INVALID


def test_to_long_truncates_toward_zero():
    assert D.to_long(D.parse("-5.9")) == -5  # Java / truncation, not floor
    assert D.to_long(D.parse("5.9")) == 5


def test_wide_numbers():
    """TagValues.java:52-75: value = (m>>>2 + MIN_NUMBER) / 10^(m&3),
    stringified with exactly `scale` decimals."""
    n = D.wide_number_from(405, 1)  # 40.5
    assert D.wide_number_to_double(n) == 40.5
    assert D.wide_number_to_string(n) == "40.5"
    n = D.wide_number_from(-256, 0)
    assert D.wide_number_to_string(n) == "-256"
    n = D.wide_number_from(99999999, 3)
    assert D.wide_number_to_string(n) == "99999.999"
    n = D.wide_number_from(1000, 3)  # trailing zeroes preserved
    assert D.wide_number_to_string(n) == "1.000"
    n = D.wide_number_from(-10, 2)
    assert D.wide_number_to_string(n) == "-0.10"


def test_decimal_string_col(spark):
    rows = [(m, sc) for m, sc, _ in TOSTRING_ROWS]
    df = spark.createDataFrame(rows, "mantissa long, scale int")
    got = df.select(
        D.decimal_string_col(F.col("mantissa"), F.col("scale")).alias("s")
    ).collect()
    assert [r.s for r in got] == [want for _, _, want in TOSTRING_ROWS]
