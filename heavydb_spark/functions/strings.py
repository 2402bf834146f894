"""String-function gaps vs the reference (StringOps/StringOps.cpp, 1512 LoC).

Spark built-ins cover LOWER..REGEXP_REPLACE/LEVENSHTEIN 1:1 (SURVEY.md
§2.8). Genuine gaps implemented here:

- JAROWINKLER_SIMILARITY (StringOps.cpp jaro-winkler kernel) — Arrow-batched
  pandas UDF (the sanctioned slow path; a row-at-a-time Python UDF would be
  10-100x slower).
- URL_ENCODE / URL_DECODE — pandas UDF over urllib.
- TRY_STRING_CAST — Spark try_cast covers it (dialect-level).

All are registered for SQL use; DataFrame users import the wrappers.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType


def _jaro(s: str, t: str) -> float:
    if s == t:
        return 1.0
    ls, lt = len(s), len(t)
    if ls == 0 or lt == 0:
        return 0.0
    window = max(ls, lt) // 2 - 1
    sm = [False] * ls
    tm = [False] * lt
    matches = 0
    for i in range(ls):
        lo, hi = max(0, i - window), min(i + window + 1, lt)
        for j in range(lo, hi):
            if not tm[j] and s[i] == t[j]:
                sm[i] = tm[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(ls):
        if sm[i]:
            while not tm[k]:
                k += 1
            if s[i] != t[k]:
                transpositions += 1
            k += 1
    transpositions //= 2
    return (
        matches / ls + matches / lt + (matches - transpositions) / matches
    ) / 3.0


def _jaro_winkler(s: str, t: str, scaling: float = 0.1) -> float:
    j = _jaro(s, t)
    prefix = 0
    for a, b in zip(s[:4], t[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * scaling * (1.0 - j)


@pandas_udf(DoubleType())
def jaro_winkler_similarity(s: pd.Series, t: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if a is None or b is None else _jaro_winkler(a, b)
            for a, b in zip(s, t)
        ],
        dtype="float64",
    )


@pandas_udf(StringType())
def url_encode(s: pd.Series) -> pd.Series:
    from urllib.parse import quote

    return s.map(lambda v: None if v is None else quote(v, safe=""))


@pandas_udf(StringType())
def url_decode(s: pd.Series) -> pd.Series:
    from urllib.parse import unquote

    return s.map(lambda v: None if v is None else unquote(v))


def register_string_functions(spark: SparkSession) -> None:
    spark.udf.register("jarowinkler_similarity", jaro_winkler_similarity)
    spark.udf.register("url_encode", url_encode)
    spark.udf.register("url_decode", url_decode)


# DataFrame-side conveniences (JVM-native where possible) -----------------

def base64_encode(col):  # HeavyDB BASE64_ENCODE (sqldefs.h:121)
    return F.base64(col.cast("binary"))


def base64_decode(col):
    return F.unbase64(col).cast("string")
