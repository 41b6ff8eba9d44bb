"""WARC record reader specs (sources/warc.py).

Reference format: ISO 28500 / the WARC/1.0 spec as used by
CommonCrawl. The adversarial cases are the ones a naive
split-on-marker parser gets wrong: payloads containing the version
marker, payloads containing CRLF CRLF, missing Content-Length.
"""

from __future__ import annotations

from enrich_spark.sources import warc


def _record(payload: bytes, uri: str = "http://example.com/x",
            rtype: str = "response", clen: int | None = -1) -> bytes:
    clen = len(payload) if clen == -1 else clen
    head = b"WARC/1.0\r\n"
    head += b"WARC-Type: " + rtype.encode() + b"\r\n"
    head += b"WARC-Target-URI: " + uri.encode() + b"\r\n"
    head += b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
    if clen is not None:
        head += b"Content-Length: " + str(clen).encode() + b"\r\n"
    return head + b"\r\n" + payload + b"\r\n\r\n"


def test_parse_simple_records():
    data = _record(b"hello world") + _record(b"second", uri="http://e.com/2")
    recs = warc.parse_warc_bytes(data)
    assert [r["payload"] for r in recs] == ["hello world", "second"]
    assert recs[0]["target_uri"] == "http://example.com/x"
    assert recs[1]["rec_idx"] == 1
    assert all(r["parse_error"] is None for r in recs)
    assert recs[0]["n_headers"] == 4


def test_payload_containing_marker_and_crlfcrlf():
    # Content-Length MUST be honored: the decoy version line and the
    # blank lines inside the payload are payload bytes, not boundaries
    evil = b"x\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nstill payload"
    data = _record(evil) + _record(b"next")
    recs = warc.parse_warc_bytes(data)
    assert len(recs) == 2
    assert recs[0]["payload"] == evil.decode()
    assert recs[0]["content_length"] == len(evil)
    assert recs[1]["payload"] == "next"


def test_missing_content_length_falls_back():
    data = _record(b"no length here", clen=None) + _record(b"after")
    recs = warc.parse_warc_bytes(data)
    assert len(recs) == 2
    assert recs[0]["parse_error"] == "missing content-length"
    assert recs[0]["payload"] == "no length here"
    assert recs[1]["payload"] == "after"
    assert recs[1]["parse_error"] is None


def test_payload_cap_truncates_not_ooms():
    data = _record(b"A" * 1000)
    recs = warc.parse_warc_bytes(data, max_payload_bytes=10)
    assert recs[0]["payload_len"] == 10
    assert "truncated" in recs[0]["parse_error"]


def test_non_utf8_payload_replaced():
    data = _record(b"\xff\xfe ok")
    recs = warc.parse_warc_bytes(data)
    assert "ok" in recs[0]["payload"] and recs[0]["payload_len"] == 5


def test_leading_garbage_skipped():
    data = b"GARBAGE-NOT-WARC\r\n" + _record(b"found")
    recs = warc.parse_warc_bytes(data)
    assert len(recs) == 1 and recs[0]["payload"] == "found"


def test_parse_warc_dataframe(spark):
    import pandas as pd

    files = [
        (1, _record(b"doc one") + _record(b"doc two", uri="http://e.com/2")),
        (2, _record(b"other file")),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(files, columns=["file_id", "content"]))
    out = warc.parse_warc(df).collect()
    got = sorted((r.file_id, r.rec_idx, r.payload) for r in out)
    assert got == [(1, 0, "doc one"), (1, 1, "doc two"),
                   (2, 0, "other file")]
    assert all(r.warc_type == "response" for r in out)


def test_read_warc_binaryfile(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_record(b"from disk"))
    out = warc.read_warc(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].payload == "from disk"
