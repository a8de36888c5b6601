"""Guard: no row-at-a-time Python UDFs anywhere in the engine
(BASELINE.json input_hint hard requirement; SURVEY.md §7 risk register)."""

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "morituri_spark"

# F.udf( / udf( calls that are not pandas_udf
ROW_UDF = re.compile(r"(?<!pandas_)\budf\s*\(")


def test_no_row_wise_udfs():
    offenders = []
    for py in PKG.rglob("*.py"):
        text = py.read_text()
        for i, line in enumerate(text.splitlines(), 1):
            if ROW_UDF.search(line) and "pandas_udf" not in line:
                offenders.append(f"{py.relative_to(PKG.parent)}:{i}: {line.strip()}")
    assert not offenders, "row-wise Python UDFs found:\n" + "\n".join(offenders)


def test_no_rdd_usage():
    """DataFrame-first rule: no .rdd / sparkContext.parallelize in operators
    (the only sanctioned uses are broadcast() and addPyFile in session).
    Metadata-only probes (e.g. getNumPartitions to defend against a
    limit()-collapsed input — geo/knn.py) carry an explicit
    ``# rdd-meta-ok`` marker: they inspect the plan, never compute rows
    through the RDD API, which is what this guard exists to prevent."""
    offenders = []
    allowed = {"session.py"}
    for py in PKG.rglob("*.py"):
        if py.name in allowed:
            continue
        text = py.read_text()
        for i, line in enumerate(text.splitlines(), 1):
            if "# rdd-meta-ok" in line:
                assert "getNumPartitions" in line, (
                    f"{py.name}:{i}: rdd-meta-ok only covers partition-count probes"
                )
                continue
            if re.search(r"\.rdd\b|parallelize\(", line):
                offenders.append(f"{py.relative_to(PKG.parent)}:{i}: {line.strip()}")
    assert not offenders, "RDD usage found:\n" + "\n".join(offenders)
