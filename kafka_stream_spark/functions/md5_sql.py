"""MD5 compiled to SQL: exact uuid3 keys under the differential gate.

The reference's surrogate keys are ``uuid.uuid3(NAMESPACE_DNS, s)`` with
dashes stripped (kafka_s.py:460-468). The Spark side computes that
bit-for-bit as Column expressions (keys.uuid3_key: Spark's md5 accepts
BINARY, so the 16 namespace bytes concat directly). DuckDB 1.0's
``md5()`` is VARCHAR-only and NAMESPACE_DNS contains bytes that are not
valid UTF-8 (0x80, 0x00, ...), so the oracle cannot call the built-in —
which is why q_uuid3_key sat rows-only through round 2.

This module closes that gap by COMPILING MD5 ITSELF to SQL (RFC 1321 is
public): for a name bounded to ≤ 39 ASCII bytes, namespace ‖ name ‖
0x80-pad ‖ 64-bit bit-length fits ONE 512-bit block, so the digest is a
fixed dataflow — 16 message words, 64 unrolled rounds of 32-bit modular
arithmetic (BIGINT + mask), final state addition — emitted as a chain of
64 tiny CTEs. DuckDB folds each round into the next projection; for the
~100-row key audits this oracle backs, planning cost is irrelevant and
the differential gate gets REAL bit-level coverage of the key scheme.

Nothing here executes on the Spark side — this is oracle-generation
machinery only.
"""

from __future__ import annotations

import math
import uuid

MASK = 0xFFFFFFFF

#: Per-round left-rotate amounts (RFC 1321 §3.4).
_S = (
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4
    + [6, 10, 15, 21] * 4
)
#: K[i] = floor(abs(sin(i+1)) * 2^32) (RFC 1321 §3.4).
_K = [int(abs(math.sin(i + 1)) * (1 << 32)) & MASK for i in range(64)]

_A0, _B0, _C0, _D0 = 0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476

_NS = list(uuid.NAMESPACE_DNS.bytes)

MAX_NAME_BYTES = 64 - 16 - 1 - 8  # one block minus namespace, 0x80 pad, length


def _byte_expr(j: int) -> str:
    """SQL for message byte ``j`` of the single padded block."""
    if j < 16:
        return str(_NS[j])
    if j >= 56:
        # little-endian 64-bit bit length; (16+L)*8 ≤ 440 needs 2 bytes
        if j == 56:
            return "((16 + L) * 8) % 256"
        if j == 57:
            return "((16 + L) * 8) // 256"
        return "0"
    k = j - 16
    return (
        f"CASE WHEN {k} < L THEN unicode(substr(nm, {k + 1}, 1)) "
        f"WHEN {k} = L THEN 128 ELSE 0 END"
    )


def _rot(expr: str, s: int) -> str:
    return f"((({expr}) << {s}) | (({expr}) >> {32 - s})) & {MASK}"


def md5_hex_sql(src_cte: str, keep_cols: list[str]) -> str:
    """WITH-chain computing ``md5hex`` (32 lowercase hex chars) of
    namespace_DNS ‖ nm for every row of ``src_cte``.

    ``src_cte`` is the BODY of a CTE named ``src`` that must yield the
    ``keep_cols`` plus ``nm`` — an ASCII string; bytes beyond
    MAX_NAME_BYTES are silently truncated to preserve the single-block
    invariant (callers choose names that never hit it).
    """
    keep = ", ".join(keep_cols)
    parts = [
        f"src AS ({src_cte})",
        f"prep AS (SELECT {keep}, substr(nm, 1, {MAX_NAME_BYTES}) AS nm, "
        f"length(substr(nm, 1, {MAX_NAME_BYTES})) AS L FROM src)",
    ]
    # all arithmetic in BIGINT — INT32 literals overflow at 2^31
    words = ", ".join(
        f"CAST({_byte_expr(4 * k)} AS BIGINT) + "
        f"256 * CAST({_byte_expr(4 * k + 1)} AS BIGINT) + "
        f"65536 * CAST({_byte_expr(4 * k + 2)} AS BIGINT) + "
        f"16777216 * CAST({_byte_expr(4 * k + 3)} AS BIGINT) AS m{k}"
        for k in range(16)
    )
    ms = ", ".join(f"m{k}" for k in range(16))
    parts.append(
        f"r0 AS (SELECT {keep}, {words}, {_A0}::BIGINT AS a0, "
        f"{_B0}::BIGINT AS b0, {_C0}::BIGINT AS c0, {_D0}::BIGINT AS d0 "
        f"FROM prep)"
    )
    for i in range(64):
        p = i  # previous round suffix
        a, b, c, d = f"a{p}", f"b{p}", f"c{p}", f"d{p}"
        if i < 16:
            f_expr = f"(({b} & {c}) | (xor({b}, {MASK}) & {d}))"
            g = i
        elif i < 32:
            f_expr = f"(({d} & {b}) | (xor({d}, {MASK}) & {c}))"
            g = (5 * i + 1) % 16
        elif i < 48:
            f_expr = f"xor(xor({b}, {c}), {d})"
            g = (3 * i + 5) % 16
        else:
            f_expr = f"xor({c}, ({b} | xor({d}, {MASK})))"
            g = (7 * i) % 16
        tmp = f"(({a} + {f_expr} + {_K[i]} + m{g}) & {MASK})"
        nb = f"(({b} + {_rot(tmp, _S[i])}) & {MASK})"
        n = i + 1
        parts.append(
            f"r{n} AS (SELECT {keep}, {ms}, {d} AS a{n}, {nb} AS b{n}, "
            f"{b} AS c{n}, {c} AS d{n} FROM r{p})"
        )
    hex_bytes = " || ".join(
        f"lpad(lower(hex(((({w} + {init}) & {MASK}) >> {8 * byte}) & 255)), 2, '0')"
        for w, init in (("a64", _A0), ("b64", _B0), ("c64", _C0), ("d64", _D0))
        for byte in range(4)
    )
    parts.append(f"dig AS (SELECT {keep}, {hex_bytes} AS md5hex FROM r64)")
    return "WITH " + ",\n".join(parts)


def uuid3_hex_sql(src_cte: str, keep_cols: list[str], alias: str) -> str:
    """Full SELECT producing uuid3(NAMESPACE_DNS, nm) as dash-stripped
    32-char hex named ``alias`` — RFC 4122 v3 surgery on the digest:
    hex char 13 := '3' (version), hex char 17 := variant digit
    (top bits 10 → one of 8/9/a/b, keeping the low 2 bits)."""
    keep = ", ".join(keep_cols)
    variant = (
        "substr('89ab', ((strpos('0123456789abcdef', substr(md5hex, 17, 1))"
        " - 1) % 4) + 1, 1)"
    )
    return (
        md5_hex_sql(src_cte, keep_cols)
        + f"\nSELECT {keep}, substr(md5hex, 1, 12) || '3' || "
        f"substr(md5hex, 14, 3) || {variant} || substr(md5hex, 18, 15) "
        f"AS {alias} FROM dig"
    )
