"""String scalar functions (F1, F4, F5, F12 in SURVEY.md §2.7).

``to_camel_case_with_spaces`` ports the semantics of
/root/reference/plugins/navteq/navteq2osm_tag_parser.hpp:127-169: a new word
starts after ANY non-alphabetic character (so "E20-a" → "E20-A"), which is
why Spark's ``initcap`` (whitespace words only) is not bit-compatible.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import StringType

def _load_iso_639_table() -> dict[str, str]:
    """Parse the public Library-of-Congress ISO-639-2 pipe-delimited table
    (http://www.loc.gov/standards/iso639-2/ISO-639-2_utf-8.txt), exactly as
    the reference does at runtime (tag_parser:428-452): field 0 is the
    bibliographic alpha-3 code, field 2 the alpha-2 code; rows without an
    alpha-2 code are skipped. Deviations: utf-8-sig so the file's leading
    BOM doesn't corrupt the first key ('aar') the way the reference's raw
    getline does, and importlib.resources so the load also works when the
    package is imported from the --py-files zip on executors."""
    from importlib import resources

    text = (
        resources.files("morituri_spark")
        .joinpath("data/ISO-639-2_utf-8.txt")
        .read_bytes()
        .decode("utf-8-sig")
    )
    mapping: dict[str, str] = {}
    for line in text.splitlines():
        parts = line.split("|")
        if len(parts) >= 3 and parts[2]:
            mapping[parts[0]] = parts[2]
    return mapping


# Full ISO-639-2(B) → ISO-639-1 map (~400 entries), loaded once per process.
ISO_639_2_TO_1 = _load_iso_639_table()


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


def lang_code_expr(col: Column, strict: bool = True) -> Column:
    """Catalyst form of parse_lang_code: lowercase → constant-map lookup.
    ``strict=True`` mirrors the reference's raise-on-miss
    (tag_parser:454-460) via ``raise_error`` — the job fails with the same
    message instead of silently nulling data. ``strict=False`` returns NULL
    on a miss for callers that count/quarantine unknowns themselves. The
    ~400-literal CreateMap is foldable, so Catalyst collapses it to one map
    constant — no Python in this path."""
    m = F.create_map(*[F.lit(x) for kv in ISO_639_2_TO_1.items() for x in kv])
    lc = F.lower(col)
    mapped = F.element_at(m, lc)
    if not strict:
        return mapped
    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(mapped.isNotNull(), mapped)
        .otherwise(
            F.raise_error(
                F.concat(F.lit("Language code '"), lc, F.lit("' not found"))
            ).cast("string")
        )
    )


@F.pandas_udf(StringType())
def lang_code_udf(s: pd.Series) -> pd.Series:
    """Lenient Arrow form (NULL on miss) — kept for batch callers; prefer
    lang_code_expr."""
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
