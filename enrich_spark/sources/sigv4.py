"""AWS Signature Version 4 request signing — stdlib-only (hmac,
hashlib, urllib), implemented from the public signing specification
(AWS General Reference, "Signature Version 4 signing process";
RFC 3986 for the canonical percent-encoding).

This closes the one gap the wire clients (sources/kinesis.py) had
against real AWS endpoints: a custom/dev endpoint is unsigned, but the
same JSON API against aws.amazonaws.com requires every request signed.
``KinesisHttpClient`` accepts optional credentials and signs when they
are present; unsigned dev-endpoint behavior is unchanged.

Algorithm (the four documented steps):

1. Canonical request::

       HTTPMethod \n CanonicalURI \n CanonicalQueryString \n
       CanonicalHeaders \n SignedHeaders \n HexEncode(SHA256(Payload))

   - URI: dot segments removed + consecutive slashes collapsed
     (RFC 3986 §5.2.4, required by AWS for non-S3 services), then one
     percent-encoding pass (unreserved ``A-Za-z0-9-._~`` and '/') —
     the documented encode-twice rule for already-encoded paths
   - query: pairs taken as sent (already wire-encoded), sorted by
     (key, value), joined with '&' ('=' kept for empty values)
   - headers: lowercased names, values trimmed + inner whitespace
     collapsed, sorted, each ``name:value\n``
2. String to sign: ``AWS4-HMAC-SHA256 \n <amz-date> \n <scope> \n
   HexEncode(SHA256(canonical request))`` with scope
   ``<date>/<region>/<service>/aws4_request``.
3. Signing key: ``HMAC(HMAC(HMAC(HMAC("AWS4"+secret, date), region),
   service), "aws4_request")``.
4. ``Authorization: AWS4-HMAC-SHA256 Credential=<akid>/<scope>,
   SignedHeaders=<...>, Signature=<hex hmac of step 2>``.

Verified two ways in tests/test_sigv4.py: the AWS documentation's
published example vector, and a cross-check against botocore's signer
over a grid of methods/paths/queries/bodies.
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import urllib.parse
from dataclasses import dataclass

_ALGORITHM = "AWS4-HMAC-SHA256"
_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")


@dataclass(frozen=True)
class AwsCredentials:
    access_key: str
    secret_key: str
    session_token: str | None = None


def _canonical_uri(path: str) -> str:
    """RFC 3986 §5.2.4 dot-segment removal + consecutive-slash collapse
    (AWS requires both for non-S3 services), then ONE percent-encoding
    pass over the raw path — an already-encoded '%XX' gets its '%'
    re-encoded, which is the documented encode-twice rule for non-S3
    services."""
    if not path:
        return "/"
    out: list[str] = []
    for seg in path.split("/"):
        if not seg or seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
        else:
            out.append(seg)
    first = "/" if path.startswith("/") else ""
    last = "/" if path.endswith("/") and out else ""
    norm = first + "/".join(out) + last
    return urllib.parse.quote(norm or "/", safe="/~")


def _canonical_query(query: str) -> str:
    """Key/value pairs are taken AS SENT (the URL's query is already
    percent-encoded on the wire), sorted by (encoded key, encoded
    value) — re-encoding here would sign a different string than the
    server receives."""
    if not query:
        return ""
    pairs = []
    for part in query.split("&"):
        k, _, v = part.partition("=")
        pairs.append((k, v))
    return "&".join(f"{k}={v}" for k, v in sorted(pairs))


def _canonical_headers(headers: dict[str, str]) -> tuple[str, str]:
    norm = {}
    for name, value in headers.items():
        norm[name.strip().lower()] = " ".join(str(value).split())
    signed = ";".join(sorted(norm))
    canon = "".join(f"{k}:{norm[k]}\n" for k in sorted(norm))
    return canon, signed


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode("utf-8"), hashlib.sha256).digest()


def signing_key(secret_key: str, date: str, region: str,
                service: str) -> bytes:
    """Step 3: the derived signing key (cacheable per (date, region,
    service) — the HMAC chain never exposes the long-term secret)."""
    k = _hmac(b"AWS4" + secret_key.encode("utf-8"), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def sign_request(
    method: str,
    url: str,
    headers: dict[str, str],
    payload: bytes,
    credentials: AwsCredentials,
    region: str,
    service: str,
    timestamp: datetime.datetime | None = None,
) -> dict[str, str]:
    """→ a NEW headers dict with Host, X-Amz-Date, Authorization (and
    X-Amz-Security-Token for temporary credentials) added. The input
    dict is not mutated."""
    parsed = urllib.parse.urlsplit(url)
    if timestamp is None:
        timestamp = datetime.datetime.now(datetime.timezone.utc)
    amz_date = timestamp.strftime("%Y%m%dT%H%M%SZ")
    date = amz_date[:8]

    out = dict(headers)
    out.setdefault("Host", parsed.netloc)
    out["X-Amz-Date"] = amz_date
    if credentials.session_token:
        out["X-Amz-Security-Token"] = credentials.session_token

    payload_hash = hashlib.sha256(payload or b"").hexdigest()
    canon_headers, signed_headers = _canonical_headers(out)
    canonical_request = "\n".join([
        method.upper(),
        _canonical_uri(parsed.path),
        _canonical_query(parsed.query),
        canon_headers,
        signed_headers,
        payload_hash,
    ])

    scope = f"{date}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join([
        _ALGORITHM,
        amz_date,
        scope,
        hashlib.sha256(canonical_request.encode("utf-8")).hexdigest(),
    ])

    key = signing_key(credentials.secret_key, date, region, service)
    signature = hmac.new(key, string_to_sign.encode("utf-8"),
                         hashlib.sha256).hexdigest()
    out["Authorization"] = (
        f"{_ALGORITHM} "
        f"Credential={credentials.access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, "
        f"Signature={signature}")
    return out
