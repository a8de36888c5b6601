"""String scalar functions (F1, F4, F5, F12 in SURVEY.md §2.7).

``to_camel_case_with_spaces`` ports the semantics of
/root/reference/plugins/navteq/navteq2osm_tag_parser.hpp:127-169: a new word
starts after ANY non-alphabetic character (so "E20-a" → "E20-A"), which is
why Spark's ``initcap`` (whitespace words only) is not bit-compatible.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# ISO-639-2 → ISO-639-1 subset used by fixtures; the reference parses the
# full Library-of-Congress table at runtime (tag_parser:428-452). A real
# deploy loads the published table into this dict / a broadcast DataFrame.
ISO_639_2_TO_1 = {
    "eng": "en", "ger": "de", "deu": "de", "fre": "fr", "fra": "fr",
    "dan": "da", "spa": "es", "ita": "it", "dut": "nl", "nld": "nl",
    "swe": "sv", "nor": "no", "por": "pt", "fin": "fi", "pol": "pl",
    "cze": "cs", "ces": "cs", "rus": "ru", "gre": "el", "ell": "el",
}


def to_camel_case_with_spaces(s: str) -> str:
    out = []
    new_word = True
    for ch in s:
        if ch.isalpha():
            out.append(ch.upper() if new_word else ch.lower())
            new_word = False
        else:
            out.append(ch)
            new_word = True
    return "".join(out)


@F.pandas_udf(StringType())
def camel_case_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if v is None else to_camel_case_with_spaces(v))


def parse_lang_code(lang_code: str) -> str:
    """tag_parser:454-460 — lowercase, table lookup, error on miss."""
    lc = lang_code.lower()
    if lc not in ISO_639_2_TO_1:
        raise ValueError(f"Language code '{lc}' not found")
    return ISO_639_2_TO_1[lc]


@F.pandas_udf(StringType())
def lang_code_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if v is None else ISO_639_2_TO_1.get(v.lower()))


def parse_house_number_schema_col(col):
    """tag_parser:473-479 — E→even, O→odd, else ''."""
    return F.when(col == "E", "even").when(col == "O", "odd").otherwise(F.lit(""))


def string_is_unsigned_integer(s: str) -> bool:
    """util.hpp:148-156 — nonempty, all digits."""
    return bool(re.fullmatch(r"[0-9]+", s or ""))


def navteq_2_osm_admin_lvl(navteq_admin_lvl: str) -> str:
    """tag_parser:462-471 — validate uint in [1,7], return str(2*lvl)."""
    if not string_is_unsigned_integer(navteq_admin_lvl):
        raise ValueError("admin level contains invalid character")
    lvl = int(navteq_admin_lvl)
    if not 1 <= lvl <= 7:
        raise ValueError(f"invalid admin level. admin level '{lvl}' is out of range.")
    return str(2 * lvl)


def admin_lvl_col(col):
    """Catalyst form (valid inputs assumed filtered upstream)."""
    return (col.cast("int") * 2).cast("string")
