"""Payload decompression / de-batching (SURVEY §2.1).

Mirrors core/PayloadProvider.scala:96-110 + core/Decompressor.scala:108-198:
an incoming stream message is either a single collector payload, or a
gzip/zstd-compressed archive of many payloads in Snowplow's batching
protocol:

    <compressed stream> = [version:1 byte = 1][format:1 byte = 1]
                          ([len:4 bytes big-endian][payload bytes])*

Sniffing is by magic bytes (gzip ``1f 8b``, zstd ``28 b5 2f fd``); messages
that aren't compressed pass through as single payloads. Unsupported header
versions and corrupt streams yield CPFormatViolation-style errors; records
larger than ``max_bytes_single_payload`` yield RecordTooBig errors while
the rest of the archive is still drained (Decompressor.getNextRecord:48-59).

Spark shape: one UDF BINARY → ARRAY<STRUCT<payload BINARY, error STRING>>
followed by a native ``explode`` — the 1→N fan-out happens on executors,
so a 1000-payload archive never materializes on the driver and archives
decompress in parallel across the cluster. zstd decodes through
``zstandard`` when installed, else pyarrow's built-in zstd codec
(streaming CompressedInputStream — pyarrow is already an engine
dependency for Arrow-batched UDFs), so the real-codec path runs in
this container; gzip is stdlib.
"""

from __future__ import annotations

import gzip
import pandas as pd  # module-level: pandas_udf type hints are strings
#                      under `from __future__ import annotations` and must
#                      resolve against MODULE globals
import io
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

GZIP_MAGIC = b"\x1f\x8b"
ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"

RESULT_TYPE = T.ArrayType(
    T.StructType([
        T.StructField("payload", T.BinaryType()),
        T.StructField("error", T.StringType()),
    ])
)


def _open_stream(data: bytes):
    if data[:2] == GZIP_MAGIC:
        return gzip.GzipFile(fileobj=io.BytesIO(data))
    if data[:4] == ZSTD_MAGIC:
        try:
            import zstandard  # type: ignore

            return zstandard.ZstdDecompressor().stream_reader(
                io.BytesIO(data))
        except ImportError:
            pass
        try:
            # pyarrow ships a real zstd codec (and is already an engine
            # dependency for Arrow-batched UDFs): its
            # CompressedInputStream is a file-like streaming reader, so
            # the drain never materializes the whole archive
            import pyarrow as pa

            if pa.Codec.is_available("zstd"):
                return pa.CompressedInputStream(
                    pa.BufferReader(data), "zstd")
        except ImportError:
            pass
        return None  # surfaced as an error record by the caller
    return False  # not compressed


def _drain(stream, max_single: int):
    """Yield (payload, error) pairs per the batching protocol."""
    header = stream.read(2)
    if len(header) < 2 or header[0] != 1 or header[1] != 1:
        v1 = header[0] if len(header) > 0 else -1
        v2 = header[1] if len(header) > 1 else -1
        yield (None, f"Unsupported versions in compressed record header: {v1}, {v2}")
        return
    while True:
        size_bytes = stream.read(4)
        if len(size_bytes) == 0:
            return  # EndOfRecords
        if len(size_bytes) < 4:
            yield (None, "corrupt input: truncated record size")
            return
        (size,) = struct.unpack(">i", size_bytes)
        if size < 0:
            yield (None, f"corrupt input: negative record size {size}")
            return
        if size > max_single:
            # skip but keep draining (RecordTooBig, Decompressor.scala:50-54)
            skipped = stream.read(size)
            yield (None, f"record too big after decompression: {size} bytes")
            if len(skipped) < size:
                return
            continue
        payload = stream.read(size)
        if len(payload) < size:
            yield (None, "corrupt input: truncated record")
            return
        yield (payload, None)


def debatch_bytes(data, max_bytes_single_payload: int = 1 << 20):
    """One message → list of (payload, error) records. Kernel of the
    de-batch UDF, module-level so the protocol logic (including the
    zstd drain path) is testable without an executor round trip."""
    if data is None:
        return [(None, "null message bytes")]
    raw = bytes(data)
    stream = _open_stream(raw)
    if stream is False:
        return [(raw, None)]  # plain single payload
    if stream is None:
        return [(None, "zstd-compressed message but no zstd decoder available")]
    try:
        return list(_drain(stream, max_bytes_single_payload))
    except (OSError, EOFError, struct.error, ValueError) as e:
        # OSError covers gzip + pyarrow's ArrowIOError; ValueError
        # covers pyarrow's ArrowInvalid on corrupt zstd frames
        return [(None, f"corrupt compressed input: {e}")]


def make_debatch_udf(max_bytes_single_payload: int = 1 << 20):
    """Arrow-batched de-batch UDF (r13: was row-at-a-time ``F.udf`` —
    the one BatchEvalPython left on a production ingest path; the
    pandas form amortizes JVM↔Python serialization exactly like the
    thrift decoder's, loaders/thrift.py)."""
    @F.pandas_udf(RESULT_TYPE)
    def debatch(data: pd.Series) -> pd.Series:
        return pd.Series(
            [debatch_bytes(v, max_bytes_single_payload) for v in data])

    return debatch


def explode_messages(
    df: DataFrame,
    bytes_col: str = "value",
    max_bytes_single_payload: int = 1 << 20,
) -> DataFrame:
    """Stream messages → one row per collector payload.

    Output: the input columns minus `bytes_col`, plus
    ``value BINARY`` (the payload) and ``decompress_error STRING``.
    """
    debatch = make_debatch_udf(max_bytes_single_payload)
    exploded = df.withColumn(
        "_rec", F.explode(debatch(F.col(bytes_col)))
    ).drop(bytes_col)
    return exploded.select(
        "*",
        F.col("_rec.payload").alias("value"),
        F.col("_rec.error").alias("decompress_error"),
    ).drop("_rec")


# --- test/generator side ----------------------------------------------------


def encode_batch(payloads: list[bytes], codec: str = "gzip") -> bytes:
    """Build a compressed archive in the batching protocol (fixture side)."""
    body = bytearray([1, 1])
    for p in payloads:
        body += struct.pack(">i", len(p)) + p
    if codec == "gzip":
        return gzip.compress(bytes(body))
    if codec == "zstd":
        try:
            import zstandard  # type: ignore

            return zstandard.ZstdCompressor().compress(bytes(body))
        except ImportError:
            import pyarrow as pa

            return pa.Codec("zstd").compress(bytes(body), asbytes=True)
    raise ValueError(codec)
