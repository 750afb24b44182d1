"""DBF (dBase) reader (SURVEY A5) — import-gated custom source.

Spark has no DBF datasource; the reference opens ``dbf.Table`` driver-
side (cubicerpetl/cubicerpetl.py:271-286, 826-832). Neither the ``dbf``
nor ``dbfread`` package is available in this container, so the parse is
gated: files are distributed as whole payloads via the binaryFile
source (so N files → N parallel tasks — the DBF container format is not
splittable), and each payload is decoded in a ``mapInPandas`` stage by
a minimal built-in dBase III/IV header+record parser that covers C/N/L/D
field types. Exotic field types raise with a clear message.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _parse_dbf_bytes(buf: bytes) -> tuple[list[tuple[str, str]], list[list]]:
    """Minimal dBase III/IV parser → (fields [(name, type)], records).
    Deleted records (b'*' flag) are skipped, matching the dbf package."""
    if len(buf) < 32:
        raise ValueError("not a DBF file: truncated header")
    n_records = struct.unpack("<I", buf[4:8])[0]
    header_len, record_len = struct.unpack("<HH", buf[8:12])
    fields: list[tuple[str, str, int, int]] = []
    off = 32
    while off < header_len - 1 and buf[off] != 0x0D:
        desc = buf[off : off + 32]
        name = desc[:11].split(b"\x00")[0].decode("ascii", "replace").lower()
        ftype = chr(desc[11])
        flen = desc[16]
        fdec = desc[17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    records: list[list] = []
    pos = header_len
    for _ in range(n_records):
        rec = buf[pos : pos + record_len]
        pos += record_len
        if len(rec) < record_len or rec[:1] == b"*":
            continue
        row: list = []
        fo = 1
        for name, ftype, flen, fdec in fields:
            raw = rec[fo : fo + flen]
            fo += flen
            txt = raw.decode("latin-1").strip()
            if ftype == "C":
                row.append(txt or None)
            elif ftype == "N" or ftype == "F":
                if not txt:
                    row.append(None)
                elif fdec or "." in txt:
                    row.append(float(txt))
                else:
                    row.append(int(txt))
            elif ftype == "L":
                row.append(None if txt in ("", "?") else txt.upper() in ("T", "Y"))
            elif ftype == "D":
                row.append(f"{txt[:4]}-{txt[4:6]}-{txt[6:8]}" if len(txt) == 8 else None)
            else:
                raise NotImplementedError(
                    f"DBF field type {ftype!r} not supported by the built-in parser"
                )
        records.append(row)
    return [(f[0], f[1]) for f in fields], records


_SPARK_TYPE = {"C": "string", "N": "double", "F": "double", "L": "boolean", "D": "string"}


def read_dbf(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Read .dbf file(s) → DataFrame. ``schema`` (DDL string) is required
    for multi-file reads planned lazily; for a single local file it is
    inferred driver-side from the header (one small read).
    """
    if schema is None:
        import glob

        matches = sorted(glob.glob(path)) or [path]
        with open(matches[0].replace("file:", ""), "rb") as fh:
            head = fh.read(32 * 1024)
        fields, _ = _parse_dbf_bytes(head + b"\x1a")
        schema = ", ".join(f"`{n}` {_SPARK_TYPE[t]}" for n, t in fields)
        # integer-valued N fields stay double in the inferred schema —
        # pass an explicit schema to pin longs
    binary = spark.read.format("binaryFile").load(path)
    names = [f.strip().split(" ")[0].strip("`") for f in schema.split(",")]

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for _, row in pdf.iterrows():
                fields, records = _parse_dbf_bytes(bytes(row["content"]))
                fnames = [n for n, _ in fields]
                out = pd.DataFrame(records, columns=fnames)
                yield out[[n for n in names if n in fnames]]

    return binary.select("content").mapInPandas(decode, schema=schema)
