"""Deterministic surrogate keys and concat keys.

The reference mints ``uuid.uuid3(NAMESPACE_DNS, title+url+pubTime)`` with
dashes stripped (kafka_s.py:460-468) and a second-level key from
``yqid+companyName+eventCode`` (kafka_s.py:322,621), plus ``##``-joined
category keys (kafka_s.py:304-310). The engine-native contract is
``md5(concat_ws(...))`` — same determinism and collision class, engine
side (codegen) and DuckDB-oracle checkable. An exact-uuid3 UDF is provided
for bit-for-bit compat with the reference's keys where ever needed.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

KEY_SEP = "||"
CONCAT_SEP = "##"


def surrogate_key(*cols: Column) -> Column:
    """md5 over ||-joined string forms; null components become ''.

    coalesce-to-'' mirrors the reference's empty-string-as-null convention
    (SURVEY.md §1.3) and keeps the key total (never null).
    """
    parts = [F.coalesce(c.cast("string"), F.lit("")) for c in cols]
    return F.md5(F.concat_ws(KEY_SEP, *parts))


def concat_key(*cols: Column) -> Column:
    """``str(a) + '##' + str(b)`` (kafka_s.py:304,307,310)."""
    return F.concat_ws(CONCAT_SEP, *[c.cast("string") for c in cols])


@F.udf(returnType=StringType(), useArrow=False)
def uuid3_key(s):
    """Exact reference key: uuid3(NAMESPACE_DNS, s) with dashes stripped
    (kafka_s.py:465-468). Python UDF — off the hot path by design; use
    :func:`surrogate_key` in plans.
    """
    if s is None:
        return None
    return str(uuid.uuid3(uuid.NAMESPACE_DNS, s)).replace("-", "")
