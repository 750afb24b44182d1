"""Inline base64 payload source (SURVEY A6).

Online jobs carry their file content in the job record itself
(``base64.b64decode(job['input_file'])`` feeding the CSV/TXT parsers,
cubicerpetl/cubicerpetl.py:205-214). Here the decoded payload becomes a
one-file DataFrame of ordered lines, so the downstream codec path is
byte-for-byte the same as the file-based one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_inline_payload(
    spark: SparkSession, payload_b64: str, encoding: str = "UTF-8"
) -> DataFrame:
    """base64 text payload → (file='<inline>', _line_no, value) lines,
    the same shape sources.lines.read_lines produces."""
    df = spark.createDataFrame([(payload_b64,)], "b64 string")
    text = F.decode(F.unbase64(F.col("b64")), encoding)
    lines = F.split(F.regexp_replace(text, r"(\r?\n)+$", ""), r"\r?\n")
    return df.select(
        F.lit("<inline>").alias("file"),
        F.posexplode(lines).alias("_line_no", "value"),
    )
