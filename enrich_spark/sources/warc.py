"""WARC (Web ARChive) record reader — the CommonCrawl source format.

ISO 28500 WARC is the standard container for crawl data: a file is a
concatenation of records, each ``WARC/1.x`` version line + header
lines + CRLF CRLF + a payload of exactly ``Content-Length`` bytes +
CRLF CRLF. A crawl-scale pipeline ingests millions of these files;
this module turns them into a DataFrame of records.

Scale design:

- One WARC file is one row (e.g. from ``spark.read.format
  ("binaryFile")``); :func:`parse_warc` explodes it via Arrow-batched
  ``mapInPandas`` — the parser is sequential *within* a file by
  format necessity (Content-Length must be honored; splitting on the
  ``WARC/1.0`` marker is WRONG because payloads can contain it), but
  files parallelize perfectly across the cluster. CommonCrawl ships
  ~1 GiB files, so per-task memory is bounded by construction; the
  ``max_payload_bytes`` guard truncates pathological records instead
  of OOMing a task.
- Header parsing is tolerant: unknown headers are kept (count
  reported), a record with no Content-Length falls back to scanning
  for the next version line (flagged via ``parse_error``), and
  payload bytes that aren't valid UTF-8 are decoded with
  replacement so the column stays a string.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

RECORD_SCHEMA = T.StructType([
    T.StructField("file_id", T.LongType()),
    T.StructField("rec_idx", T.IntegerType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("content_length", T.LongType()),
    T.StructField("payload", T.StringType()),
    T.StructField("payload_len", T.LongType()),
    T.StructField("n_headers", T.IntegerType()),
    T.StructField("parse_error", T.StringType()),
])

_CRLF = b"\r\n"
_MARKER = b"WARC/"


def parse_warc_bytes(
    data: bytes, max_payload_bytes: int = 64 << 20
) -> list[dict]:
    """Parse one WARC file's bytes into record dicts (pure function —
    unit-testable without Spark; the mapInPandas kernel calls this)."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # seek the next version line at a record boundary
        if not data.startswith(_MARKER, pos):
            nxt = data.find(_CRLF + _MARKER, pos)
            if nxt < 0:
                break
            pos = nxt + 2
        eol = data.find(_CRLF, pos)
        if eol < 0:
            break
        version = data[pos:eol].decode("ascii", "replace")
        pos = eol + 2
        headers: dict[str, str] = {}
        err = None
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                err = "truncated headers"
                pos = n
                break
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break  # blank line: payload starts
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace"))
        clen_s = headers.get("content-length")
        if clen_s is not None and clen_s.isdigit() and err is None:
            clen = int(clen_s)
            payload = data[pos:pos + min(clen, max_payload_bytes)]
            if clen > max_payload_bytes:
                err = f"payload truncated at {max_payload_bytes}"
            pos += clen
            # consume the record-terminating CRLF CRLF
            if data.startswith(_CRLF + _CRLF, pos):
                pos += 4
        elif err is None:
            # tolerant fallback: scan to the next record boundary
            err = "missing content-length"
            nxt = data.find(_CRLF + _CRLF + _MARKER, pos)
            payload = data[pos:] if nxt < 0 else data[pos:nxt]
            pos = n if nxt < 0 else nxt + 4
        else:
            payload = b""
        out.append({
            "rec_idx": len(out),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_length": (
                int(clen_s) if clen_s is not None and clen_s.isdigit()
                else None),
            "payload": payload.decode("utf-8", "replace"),
            "payload_len": len(payload),
            "n_headers": len(headers),
            "parse_error": err,
            "_version": version,
        })
    return out


def parse_warc(
    df: DataFrame,
    content_col: str = "content",
    file_id_col: str = "file_id",
    max_payload_bytes: int = 64 << 20,
) -> DataFrame:
    """Explode a DataFrame of WARC files into records.

    ``df`` rows: (file_id, content: binary). Output: RECORD_SCHEMA.
    One Arrow batch in, record rows out — no driver involvement, no
    shuffle; downstream filters on warc_type/target_uri prune before
    any wide operation.
    """
    import pandas as pd  # noqa: F401 (mapInPandas contract)

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for fid, blob in zip(pdf[file_id_col], pdf[content_col]):
                for rec in parse_warc_bytes(bytes(blob), max_payload_bytes):
                    rec = dict(rec)
                    rec.pop("_version")
                    rec["file_id"] = int(fid)
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in RECORD_SCHEMA.fields])

    return df.mapInPandas(kernel, RECORD_SCHEMA)


def read_warc(spark, path: str, max_payload_bytes: int = 64 << 20) -> DataFrame:
    """Read ``*.warc`` files under ``path`` into a record DataFrame.

    Uses the binaryFile source (one row per file, parallelized by
    Spark's file listing); file_id is the xxhash of the path so record
    provenance survives repartitioning.
    """
    from pyspark.sql import functions as F

    files = (
        spark.read.format("binaryFile").load(path)
        .select(F.xxhash64("path").alias("file_id"), "content")
    )
    return parse_warc(files, max_payload_bytes=max_payload_bytes)
