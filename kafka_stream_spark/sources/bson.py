"""Exact BSON wire decode for CDC envelopes (core surface S2).

The reference consumes Mongo-oplog envelopes as raw BSON off Kafka and
decodes record-at-a-time on the driver (`BSON.decode(each.value)`,
kafka_s.py:157). Its envelopes only ever exercise a small, stable slice
of the BSON spec: top-level document, embedded documents (``o`` /
``o.$set``), UTF-8 strings, UTC datetimes, int32/int64, double, bool,
and null (kafka_s.py:171-197 reads st_name/st_code/title/publish_date/
url out of the ``o`` doc). This module hand-rolls exactly that subset —
no external bson dependency — and runs it INSIDE the executors as an
Arrow-batched ``mapInPandas`` over a ``binary`` payload column, so a
100 TB backlog of envelopes decodes with full cluster parallelism
instead of a single-threaded driver loop.

Layout implemented (BSON 1.1 spec, public): a document is
``int32 total_len | elements... | 0x00``; each element is
``type_byte | cstring name | value`` with value encodings:

========  ======================================  ==========
type      value bytes                             Python
========  ======================================  ==========
``0x01``  8-byte IEEE754 little-endian            float
``0x02``  int32 len | utf8 bytes | 0x00           str
``0x03``  document                                dict
``0x08``  1 byte 0/1                              bool
``0x09``  int64 ms since epoch (UTC)              datetime
``0x0A``  (none)                                  None
``0x10``  int32 little-endian                     int
``0x12``  int64 little-endian                     int
========  ======================================  ==========

The encoder exists for tests and for the deterministic envelope
generator — the decoder is the product surface.
"""

from __future__ import annotations

import datetime as dt
import struct
from collections.abc import Iterator

_EPOCH = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)


# ---------------------------------------------------------------------------
# codec (pure Python, executor-side)
# ---------------------------------------------------------------------------


def encode_doc(doc: dict) -> bytes:
    """Encode a dict into BSON bytes (subset above; test/generator side)."""
    body = b"".join(_encode_element(k, v) for k, v in doc.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _encode_element(name: str, v) -> bytes:
    n = name.encode("utf-8") + b"\x00"
    if isinstance(v, bool):  # before int — bool is an int subclass
        return b"\x08" + n + (b"\x01" if v else b"\x00")
    if isinstance(v, float):
        return b"\x01" + n + struct.pack("<d", v)
    if isinstance(v, str):
        u = v.encode("utf-8") + b"\x00"
        return b"\x02" + n + struct.pack("<i", len(u)) + u
    if isinstance(v, dict):
        return b"\x03" + n + encode_doc(v)
    if isinstance(v, dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=dt.timezone.utc)
        ms = int((v - _EPOCH).total_seconds() * 1000)
        return b"\x09" + n + struct.pack("<q", ms)
    if v is None:
        return b"\x0a" + n
    if isinstance(v, int):
        if -(1 << 31) <= v < (1 << 31):
            return b"\x10" + n + struct.pack("<i", v)
        return b"\x12" + n + struct.pack("<q", v)
    raise TypeError(f"unsupported BSON value type: {type(v).__name__}")


def decode_doc(buf: bytes, offset: int = 0) -> tuple[dict, int]:
    """Decode one document starting at ``offset``; returns (dict, end)."""
    (total,) = struct.unpack_from("<i", buf, offset)
    end = offset + total
    if buf[end - 1] != 0:
        raise ValueError("BSON document missing trailing NUL")
    pos = offset + 4
    out: dict = {}
    while pos < end - 1:
        t = buf[pos]
        pos += 1
        nul = buf.index(b"\x00", pos)
        name = buf[pos:nul].decode("utf-8")
        pos = nul + 1
        if t == 0x01:
            (out[name],) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif t == 0x02:
            (slen,) = struct.unpack_from("<i", buf, pos)
            out[name] = buf[pos + 4 : pos + 4 + slen - 1].decode("utf-8")
            pos += 4 + slen
        elif t == 0x03:
            out[name], pos = decode_doc(buf, pos)
        elif t == 0x08:
            out[name] = buf[pos] == 1
            pos += 1
        elif t == 0x09:
            (ms,) = struct.unpack_from("<q", buf, pos)
            out[name] = _EPOCH + dt.timedelta(milliseconds=ms)
            pos += 8
        elif t == 0x0A:
            out[name] = None
        elif t == 0x10:
            (out[name],) = struct.unpack_from("<i", buf, pos)
            pos += 4
        elif t == 0x12:
            (out[name],) = struct.unpack_from("<q", buf, pos)
            pos += 8
        else:
            raise ValueError(f"unsupported BSON type byte 0x{t:02x}")
    return out, end


def decode(buf: bytes) -> dict:
    """Decode a complete BSON byte string into a dict."""
    doc, end = decode_doc(buf, 0)
    if end != len(buf):
        raise ValueError("trailing bytes after BSON document")
    return doc


# ---------------------------------------------------------------------------
# Spark plumbing: binary envelope column → typed CDC rows
# ---------------------------------------------------------------------------

#: Output schema of the envelope decode — the reference's consumed fields
#: (kafka_s.py:178-183) plus the op discriminator its `if kafka_json.get("o")`
#: / `kafka_set.get("$set")` branching implies (kafka_s.py:166-170).
CDC_SCHEMA = (
    "op STRING, st_name STRING, st_code STRING, title STRING, "
    "publish_date TIMESTAMP, url STRING"
)


def decode_envelopes(df, payload_col: str = "value"):
    """binary BSON envelopes → typed CDC DataFrame (CDC_SCHEMA).

    * insert envelope: ``{"o": {fields...}}``            → op = 'i'
    * update envelope: ``{"o": {"$set": {fields...}}}``  → op = 'u'
      (the reference drops these — kafka_s.py:168-169 `pass`; we surface
      them typed so the insert-only gate is an explicit filter)
    * anything else (e.g. delete, malformed)             → op = 'd',
      fields null — quarantine-able downstream, never a thrown row.

    Arrow-batched mapInPandas: each executor thread decodes its batch of
    envelopes in one Python hop; nothing touches the driver.
    """
    import pandas as pd

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for raw in pdf[payload_col]:
                try:
                    env = decode(bytes(raw))
                except (ValueError, IndexError, struct.error):
                    rows.append(("d", None, None, None, None, None))
                    continue
                o = env.get("o")
                if not isinstance(o, dict):
                    rows.append(("d", None, None, None, None, None))
                    continue
                if isinstance(o.get("$set"), dict):
                    op, fields = "u", o["$set"]
                else:
                    op, fields = "i", o
                pub = fields.get("publish_date")
                if isinstance(pub, dt.datetime) and pub.tzinfo is not None:
                    pub = pub.astimezone(dt.timezone.utc).replace(tzinfo=None)
                rows.append(
                    (
                        op,
                        fields.get("st_name"),
                        fields.get("st_code"),
                        fields.get("title"),
                        pub,
                        fields.get("url"),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "op",
                    "st_name",
                    "st_code",
                    "title",
                    "publish_date",
                    "url",
                ],
            )

    return df.mapInPandas(_decode, schema=CDC_SCHEMA)
