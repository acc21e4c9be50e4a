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


#: RFC 4122 DNS namespace bytes (uuid.NAMESPACE_DNS)
_NS_DNS = uuid.NAMESPACE_DNS.bytes


def uuid3_key(s: Column | str) -> Column:
    """Exact reference key: uuid3(NAMESPACE_DNS, s) with dashes stripped
    (kafka_s.py:465-468) — as PURE Column expressions, no Python UDF.

    RFC 4122 v3 is md5(namespace_bytes ‖ name_bytes) with the version
    nibble forced to 3 and the variant's top bits to 10: on the 32-char
    hex string that is hex[12] := '3' and hex[16] := (hex[16] & 0x3) | 0x8.
    Verified bit-for-bit against uuid.uuid3 in tests; stays in codegen so
    it is hot-path safe (unlike the reference's per-record Python)."""
    col = F.col(s) if isinstance(s, str) else s
    h = F.md5(F.concat(F.lit(bytearray(_NS_DNS)), F.encode(col, "utf-8")))
    variant_digit = F.element_at(
        F.array(F.lit("8"), F.lit("9"), F.lit("a"), F.lit("b")),
        (F.conv(F.substring(h, 17, 1), 16, 10).cast("int") % 4) + 1,
    )
    return F.concat(
        F.substring(h, 1, 12),
        F.lit("3"),
        F.substring(h, 14, 3),
        variant_digit,
        F.substring(h, 18, 15),
    )
