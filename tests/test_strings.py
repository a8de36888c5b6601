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


def test_lang_code_full_table():
    """The shipped table is the complete LoC file (all 184 alpha-2 rows),
    keyed by the bibliographic alpha-3 code only — exactly the reference's
    insert (tag_parser:446-449)."""
    assert len(S.ISO_639_2_TO_1) == 184
    assert S.ISO_639_2_TO_1["jpn"] == "ja"
    assert S.ISO_639_2_TO_1["zul"] == "zu"
    assert S.ISO_639_2_TO_1["ger"] == "de"
    assert S.ISO_639_2_TO_1["aar"] == "aa"  # first line: BOM must be stripped
    # terminological codes are NOT keys (reference parses field 0 only)
    assert "deu" not in S.ISO_639_2_TO_1
    # alpha-3-only languages (no alpha-2) are skipped
    assert "ace" not in S.ISO_639_2_TO_1


def test_lang_code_expr(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pd.DataFrame({"c": ["ENG", "fre", "JPN", None]}))
    got = [r[0] for r in df.select(S.lang_code_expr(F.col("c"))).collect()]
    assert got == ["en", "fr", "ja", None]
    # strict mode raises on a miss, mirroring tag_parser:454-460
    bad = spark.createDataFrame(pd.DataFrame({"c": ["deu"]}))
    with pytest.raises(Exception, match="Language code 'deu' not found"):
        bad.select(S.lang_code_expr(F.col("c"))).collect()
    # lenient mode nulls it for callers that quarantine
    got = [r[0] for r in bad.select(S.lang_code_expr(F.col("c"), strict=False)).collect()]
    assert got == [None]


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
