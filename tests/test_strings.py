"""F1/F3/F4/F5/F12 string functions — goldens mirroring the reference's
semantics (word reset on ANY non-alpha, unlike initcap)."""

import pytest

from morituri_spark.functions import strings as S


@pytest.mark.parametrize(
    "inp,want",
    [
        ("hello world", "Hello World"),
        ("HELLO WORLD", "Hello World"),
        ("e20-a", "E20-A"),          # non-alpha resets word state
        ("main STREET", "Main Street"),
        ("o'brien road", "O'Brien Road"),
        ("a1b2c3", "A1B2C3"),
        ("", ""),
        ("  x ", "  X "),
    ],
)
def test_camel_case(inp, want):
    assert S.to_camel_case_with_spaces(inp) == want


def test_camel_case_udf(spark):
    import pandas as pd

    vals = ["e20-a", "main STREET", "koebenhavn K", None]
    df = spark.createDataFrame(pd.DataFrame({"s": vals}))
    got = [r[0] for r in df.select(S.camel_case_udf("s")).collect()]
    assert got == ["E20-A", "Main Street", "Koebenhavn K", None]


def test_lang_code():
    assert S.parse_lang_code("ENG") == "en"
    assert S.parse_lang_code("dan") == "da"
    with pytest.raises(ValueError):
        S.parse_lang_code("XXX")


def test_admin_lvl():
    assert S.navteq_2_osm_admin_lvl("1") == "2"
    assert S.navteq_2_osm_admin_lvl("7") == "14"
    with pytest.raises(ValueError):
        S.navteq_2_osm_admin_lvl("8")
    with pytest.raises(ValueError):
        S.navteq_2_osm_admin_lvl("x")


def test_string_is_unsigned_integer():
    assert S.string_is_unsigned_integer("0123")
    assert not S.string_is_unsigned_integer("")
    assert not S.string_is_unsigned_integer("12a")
    assert not S.string_is_unsigned_integer("-1")
