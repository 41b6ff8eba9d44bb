"""Enrichment-asset download + hot-swap refresh.

Mirrors the reference's blob-asset machinery (SURVEY §2.1 + §4):
periodic re-download of enrichment databases — MaxMind ``.mmdb``, IAB
files, referer DB, ua-parser rules, event-spec JSON — with hot-swap
semantics (core/AssetRefresher.scala:40-313,
ManagedEnrichmentRegistry.scala:43-122, asset clients
modules/cloudutils/{aws,gcp,azure,core}).

Spark-first translation: assets are DRIVER-side files. A lookup
enrichment compiles them into the plan as a broadcast table or a
UDF-closure path, and a Spark plan is immutable — so "hot swap" is not
an in-place mutation (the reference mutates a registry snapshot behind a
Ref) but a REBUILD of the enrichment plan between micro-batches:
``StreamConfig.assets`` is checked at each ``foreachBatch`` boundary and,
when an asset's content hash changes, ``StreamConfig.rebuild`` recompiles
the config/plan from the new files. In-flight batches finish on the old
snapshot — the same per-enrichment snapshot isolation the reference
guarantees.

Fetchers are registered per URI scheme: ``file://`` and ``http(s)://``
ship here (stdlib); ``s3://`` / ``gs://`` / ``azure://`` are one
``register_fetcher`` call away when the cloud SDKs are present — the
container has none, and nothing proprietary is assumed.
"""

from __future__ import annotations

import hashlib
import os
import time
import urllib.parse
import urllib.request
from dataclasses import dataclass, field

_FETCHERS: dict = {}


def register_fetcher(scheme: str, fn) -> None:
    """fn(uri: str) -> bytes. Overrides are allowed (tests, auth wrappers)."""
    _FETCHERS[scheme] = fn


def _fetch_file(uri: str) -> bytes:
    path = urllib.parse.urlparse(uri).path
    with open(path, "rb") as f:
        return f.read()


def _fetch_http(uri: str) -> bytes:
    with urllib.request.urlopen(uri, timeout=30) as r:  # noqa: S310 — scheme-checked
        return r.read()


def make_s3_fetcher(client=None):
    """s3://bucket/key via boto3 (public AWS SDK; S3BlobClient.scala
    equivalent). `client` injectable for tests; without it boto3 must be
    installed — a clear error otherwise, nothing is assumed present."""

    def fetch(uri: str) -> bytes:
        u = urllib.parse.urlparse(uri)
        c = client
        if c is None:
            try:
                import boto3  # noqa: PLC0415 — optional dependency
            except ImportError as e:
                raise RuntimeError(
                    "s3:// asset URIs need boto3 installed (or pass an "
                    "injected client via make_s3_fetcher)"
                ) from e
            c = boto3.client("s3")
        return c.get_object(Bucket=u.netloc, Key=u.path.lstrip("/"))["Body"].read()

    return fetch


def make_gs_fetcher(client=None):
    """gs://bucket/object via google-cloud-storage (GcsBlobClient.scala
    equivalent)."""

    def fetch(uri: str) -> bytes:
        u = urllib.parse.urlparse(uri)
        c = client
        if c is None:
            try:
                from google.cloud import storage  # noqa: PLC0415
            except ImportError as e:
                raise RuntimeError(
                    "gs:// asset URIs need google-cloud-storage installed "
                    "(or pass an injected client via make_gs_fetcher)"
                ) from e
            c = storage.Client()
        return c.bucket(u.netloc).blob(u.path.lstrip("/")).download_as_bytes()

    return fetch


def make_azure_fetcher(service=None):
    """azure://container/path via azure-storage-blob
    (AzureBlobClient.scala equivalent); connection string from
    AZURE_STORAGE_CONNECTION_STRING when no service is injected."""

    def fetch(uri: str) -> bytes:
        u = urllib.parse.urlparse(uri)
        svc = service
        if svc is None:
            try:
                from azure.storage.blob import BlobServiceClient  # noqa: PLC0415
            except ImportError as e:
                raise RuntimeError(
                    "azure:// asset URIs need azure-storage-blob installed "
                    "(or pass an injected service via make_azure_fetcher)"
                ) from e
            conn = os.environ.get("AZURE_STORAGE_CONNECTION_STRING")
            if not conn:
                raise RuntimeError("AZURE_STORAGE_CONNECTION_STRING is not set")
            svc = BlobServiceClient.from_connection_string(conn)
        return (
            svc.get_blob_client(container=u.netloc, blob=u.path.lstrip("/"))
            .download_blob().readall()
        )

    return fetch


register_fetcher("file", _fetch_file)
register_fetcher("http", _fetch_http)
register_fetcher("https", _fetch_http)
register_fetcher("s3", make_s3_fetcher())
register_fetcher("gs", make_gs_fetcher())
register_fetcher("azure", make_azure_fetcher())

DEFAULT_REFRESH_PERIOD_S = 7 * 86400  # reference default: assets refresh every 7 days


@dataclass
class AssetSpec:
    name: str                      # key used by enrichment configs
    uri: str                       # file:// http(s):// or registered scheme
    refresh_period_s: float = DEFAULT_REFRESH_PERIOD_S


@dataclass
class _AssetState:
    local_path: str
    sha256: str
    last_check: float


class AssetManager:
    """Driver-side asset cache with periodic content-hash refresh.

    ``paths()`` hands local file paths to enrichment configs at
    plan-build time. ``maybe_refresh()`` re-fetches every asset whose
    refresh period has elapsed and returns the names whose CONTENT
    changed (hash-compared — a re-download of identical bytes is not a
    swap, matching the reference's hash-gated hotswap). Writes are
    atomic (tmp + os.replace) so a concurrently-building plan never sees
    a torn file.
    """

    def __init__(self, specs: list[AssetSpec], cache_dir: str, clock=time.time):
        self._specs = {s.name: s for s in specs}
        self._dir = cache_dir
        self._clock = clock
        self._state: dict[str, _AssetState] = {}
        os.makedirs(cache_dir, exist_ok=True)
        for s in specs:
            self._download(s)

    def paths(self) -> dict[str, str]:
        return {name: st.local_path for name, st in self._state.items()}

    def _download(self, spec: AssetSpec) -> bool:
        scheme = urllib.parse.urlparse(spec.uri).scheme or "file"
        fetcher = _FETCHERS.get(scheme)
        if fetcher is None:
            raise ValueError(f"no asset fetcher registered for scheme [{scheme}]")
        data = fetcher(spec.uri)
        digest = hashlib.sha256(data).hexdigest()
        prev = self._state.get(spec.name)
        now = self._clock()
        if prev is not None and prev.sha256 == digest:
            prev.last_check = now
            return False
        local = os.path.join(self._dir, spec.name)
        tmp = local + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, local)
        self._state[spec.name] = _AssetState(local, digest, now)
        return True

    def maybe_refresh(self) -> list[str]:
        """Re-fetch due assets; return names whose content changed."""
        changed = []
        now = self._clock()
        for name, spec in self._specs.items():
            st = self._state.get(name)
            if st is not None and now - st.last_check < spec.refresh_period_s:
                continue
            if self._download(spec):
                changed.append(name)
        return changed
