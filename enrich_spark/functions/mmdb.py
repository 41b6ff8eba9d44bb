"""Pure-Python MaxMind DB (.mmdb) format codec — reader, range
enumerator, and a minimal writer for test fixtures.

Implements the public MaxMind DB file format specification
(https://maxmind.github.io/MaxMind-DB/): a binary search tree over IP
prefixes + a typed data section + a metadata map. The reference engine
consumes these files through the maxmind java/scala clients
(common/.../registry/IpLookupsEnrichment.scala:131-151); this container
ships no maxminddb lib, so the engine carries its own decoder.

Two consumption modes, matching the two Spark strategies in
operators/geo.py:

* ``Reader.lookup(ip)`` — point lookup, used by the mapInPandas
  per-executor-singleton path (``ip_lookups_mmdb``).
* ``Reader.iter_ranges()`` — walk the search tree and emit contiguous
  ``(ip_start, ip_end, record)`` intervals. This feeds the
  mmdb → range-table converter (tools/mmdb_to_range_table.py): at 100 TB
  the range table is broadcast and the join is a native /16-bucketized
  BroadcastHashJoin with ZERO Python on the hot path, which beats a
  per-row (even Arrow-batched) Python lookup by an order of magnitude.
"""

from __future__ import annotations

import bisect
import ipaddress
import struct

METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
DATA_SEPARATOR_SIZE = 16

# --- type codes (spec §"Output Data Section") -------------------------------
T_PTR, T_STR, T_DOUBLE, T_BYTES, T_U16, T_U32, T_MAP = 1, 2, 3, 4, 5, 6, 7
T_I32, T_U64, T_U128, T_ARRAY, T_BOOL, T_FLOAT = 8, 9, 10, 11, 14, 15


class MmdbError(ValueError):
    pass


# ---------------------------------------------------------------------------
# decoding


class _Decoder:
    def __init__(self, buf: bytes, base: int):
        self.buf = buf
        self.base = base  # absolute offset of the data section

    def decode(self, offset: int):
        """Decode the value at data-section-relative ``offset``.
        Returns (value, next_offset)."""
        buf = self.buf
        pos = self.base + offset
        ctrl = buf[pos]
        pos += 1
        dtype = ctrl >> 5
        if dtype == 0:  # extended type
            dtype = 7 + buf[pos]
            pos += 1
        if dtype == T_PTR:
            ss = (ctrl >> 3) & 0x3
            vvv = ctrl & 0x7
            if ss == 0:
                ptr = (vvv << 8) | buf[pos]
                pos += 1
            elif ss == 1:
                ptr = ((vvv << 16) | (buf[pos] << 8) | buf[pos + 1]) + 2048
                pos += 2
            elif ss == 2:
                ptr = ((vvv << 24) | (buf[pos] << 16) | (buf[pos + 1] << 8)
                       | buf[pos + 2]) + 526336
                pos += 3
            else:
                ptr = int.from_bytes(buf[pos:pos + 4], "big")
                pos += 4
            value, _ = self.decode(ptr)
            return value, pos - self.base

        size = ctrl & 0x1F
        if size == 29:
            size = 29 + buf[pos]
            pos += 1
        elif size == 30:
            size = 285 + int.from_bytes(buf[pos:pos + 2], "big")
            pos += 2
        elif size == 31:
            size = 65821 + int.from_bytes(buf[pos:pos + 3], "big")
            pos += 3

        if dtype == T_STR:
            return buf[pos:pos + size].decode("utf-8"), pos + size - self.base
        if dtype == T_DOUBLE:
            return struct.unpack(">d", buf[pos:pos + 8])[0], pos + 8 - self.base
        if dtype == T_BYTES:
            return buf[pos:pos + size], pos + size - self.base
        if dtype in (T_U16, T_U32, T_U64, T_U128):
            return int.from_bytes(buf[pos:pos + size], "big"), pos + size - self.base
        if dtype == T_I32:
            return int.from_bytes(buf[pos:pos + size], "big", signed=True), pos + size - self.base
        if dtype == T_MAP:
            out = {}
            off = pos - self.base
            for _ in range(size):
                key, off = self.decode(off)
                val, off = self.decode(off)
                out[key] = val
            return out, off
        if dtype == T_ARRAY:
            items = []
            off = pos - self.base
            for _ in range(size):
                val, off = self.decode(off)
                items.append(val)
            return items, off
        if dtype == T_BOOL:
            return bool(size), pos - self.base
        if dtype == T_FLOAT:
            return struct.unpack(">f", buf[pos:pos + 4])[0], pos + 4 - self.base
        raise MmdbError(f"unknown mmdb data type {dtype}")


class Reader:
    """Memory-resident mmdb reader (geo DBs are tens of MB — the same
    assumption the reference's broadcast of the DB file makes)."""

    def __init__(self, data: bytes):
        self.buf = data
        idx = data.rfind(METADATA_MARKER)
        if idx < 0:
            raise MmdbError("no MaxMind.com metadata marker")
        meta, _ = _Decoder(data, idx + len(METADATA_MARKER)).decode(0)
        self.metadata = meta
        self.node_count = meta["node_count"]
        self.record_size = meta["record_size"]
        self.ip_version = meta.get("ip_version", 6)
        self.node_bytes = self.record_size * 2 // 8
        self.tree_size = self.node_count * self.node_bytes
        self._decoder = _Decoder(data, self.tree_size + DATA_SEPARATOR_SIZE)
        self._ipv4_root = None

    @classmethod
    def open(cls, path: str) -> "Reader":
        with open(path, "rb") as f:
            return cls(f.read())

    # -- tree ---------------------------------------------------------------

    def _record(self, node: int, side: int) -> int:
        buf = self.buf
        base = node * self.node_bytes
        rs = self.record_size
        if rs == 24:
            o = base + side * 3
            return int.from_bytes(buf[o:o + 3], "big")
        if rs == 28:
            mid = buf[base + 3]
            if side == 0:
                return ((mid & 0xF0) << 20) | int.from_bytes(buf[base:base + 3], "big")
            return ((mid & 0x0F) << 24) | int.from_bytes(buf[base + 4:base + 7], "big")
        if rs == 32:
            o = base + side * 4
            return int.from_bytes(buf[o:o + 4], "big")
        raise MmdbError(f"unsupported record size {self.record_size}")

    def _find_ipv4_root(self) -> int:
        """In an ip_version=6 tree, IPv4 lives under 96 leading zero bits."""
        if self._ipv4_root is None:
            node = 0
            if self.ip_version == 6:
                for _ in range(96):
                    if node >= self.node_count:
                        break
                    node = self._record(node, 0)
            self._ipv4_root = node
        return self._ipv4_root

    def _data_at(self, record: int):
        return self._decoder.decode(record - self.node_count - DATA_SEPARATOR_SIZE)[0]

    def lookup(self, ip: str):
        """Resolve one IP (v4 or v6 string) → decoded record dict or None."""
        try:
            addr = ipaddress.ip_address(ip)
        except ValueError:
            return None
        if addr.version == 4:
            node = self._find_ipv4_root()
            bits, nbits = int(addr), 32
        else:
            if self.ip_version == 4:
                return None
            node = 0
            bits, nbits = int(addr), 128
        for i in range(nbits - 1, -1, -1):
            if node >= self.node_count:
                break
            node = self._record(node, (bits >> i) & 1)
        if node == self.node_count:
            return None
        if node > self.node_count:
            return self._data_at(node)
        return None

    def iter_ranges(self, ipv4_only: bool = True):
        """DFS the search tree, yielding (ip_start, ip_end, record_dict)
        with uint32 bounds (ipv4_only) or uint128 bounds. Adjacent blocks
        that resolve to the same data offset merge into one range."""
        if ipv4_only:
            root, nbits = self._find_ipv4_root(), 32
        else:
            root, nbits = 0, 128 if self.ip_version == 6 else 32
        if root >= self.node_count:
            return
        pending = None  # (start, end, data_record)
        stack = [(root, 0, 0)]  # node, prefix, depth
        while stack:
            node, prefix, depth = stack.pop()
            for side in (1, 0):  # push right first → visit left first
                rec = self._record(node, side)
                child_prefix = (prefix << 1) | side
                if rec == self.node_count:
                    continue  # empty subtree
                if rec < self.node_count:
                    stack.append((rec, child_prefix, depth + 1))
                else:
                    lo = child_prefix << (nbits - depth - 1)
                    hi = lo + (1 << (nbits - depth - 1)) - 1
                    if pending is not None and pending[2] == rec and pending[1] + 1 == lo:
                        pending = (pending[0], hi, rec)
                    else:
                        if pending is not None:
                            yield pending[0], pending[1], self._data_at(pending[2])
                        pending = (lo, hi, rec)
        if pending is not None:
            yield pending[0], pending[1], self._data_at(pending[2])


# ---------------------------------------------------------------------------
# record → flat columns (GeoIP2 City/ISP/ASN data model)


def geo_columns(rec: dict | None) -> dict:
    """Flatten a GeoIP2 City(+ISP traits) record into the 12 enrichment
    columns (IpLookupsEnrichment.scala:131-151 output contract).

    ISP / Domain / Connection-Type databases store their fields at the
    record top level (no ``traits`` wrapper) — accept both shapes so one
    flattener serves every DB model the reference's ipLookups config can
    reference (geo / isp / domain / connectionType files)."""
    rec = rec or {}
    country = rec.get("country") or rec.get("registered_country") or {}
    subs = rec.get("subdivisions") or [{}]
    city = rec.get("city") or {}
    postal = rec.get("postal") or {}
    loc = rec.get("location") or {}
    traits = rec.get("traits") or {}

    def t(key):
        return traits.get(key, rec.get(key))

    return {
        "geo_country": country.get("iso_code"),
        "geo_region": subs[0].get("iso_code"),
        "geo_city": (city.get("names") or {}).get("en"),
        "geo_zipcode": postal.get("code"),
        "geo_latitude": loc.get("latitude"),
        "geo_longitude": loc.get("longitude"),
        "geo_region_name": (subs[0].get("names") or {}).get("en"),
        "geo_timezone": loc.get("time_zone"),
        "ip_isp": t("isp"),
        "ip_organization": t("organization"),
        "ip_domain": t("domain"),
        "ip_netspeed": t("connection_type"),
    }


def asn_columns(rec: dict | None) -> dict:
    """Flatten a GeoLite2-ASN record (asn_lookups variant)."""
    rec = rec or {}
    return {
        "asn": rec.get("autonomous_system_number"),
        "asn_org": rec.get("autonomous_system_organization"),
    }


def merge_range_rows(row_lists: list[list[dict]]) -> list[dict]:
    """Boundary-sweep merge of several range tables (e.g. a City DB + an
    ISP DB + a Domain DB) into one table whose intervals carry the union
    of columns — the single broadcast table the Spark join wants.

    Null-valued keys never overwrite non-null ones, mirroring how the
    reference performs one lookup per configured DB and ORs the columns
    together (IpLookupsEnrichment.extractIpInformation)."""
    indexes = [RangeIndex(rows) for rows in row_lists if rows]
    bounds: set[int] = set()
    for rows in row_lists:
        for r in rows:
            bounds.add(r["ip_start"])
            bounds.add(r["ip_end"] + 1)
    points = sorted(bounds)
    out: list[dict] = []
    for i in range(len(points) - 1):
        lo, hi = points[i], points[i + 1] - 1
        merged: dict = {}
        hit = False
        for idx in indexes:
            row = idx.lookup(lo)
            if row is not None:
                hit = True
                for k, v in row.items():
                    if k in ("ip_start", "ip_end"):
                        continue
                    if v is not None or k not in merged:
                        merged[k] = v if v is not None else merged.get(k)
        if not hit:
            continue
        if out and out[-1]["ip_end"] + 1 == lo and {
            k: v for k, v in out[-1].items() if k not in ("ip_start", "ip_end")
        } == merged:
            out[-1]["ip_end"] = hi
        else:
            row = {"ip_start": lo, "ip_end": hi}
            row.update(merged)
            out.append(row)
    return out


# ---------------------------------------------------------------------------
# minimal writer (test fixtures / converter round-trip checks)


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return bytes([(T_BOOL << 5) | (1 if v else 0)])
    if isinstance(v, str):
        raw = v.encode("utf-8")
        return _ctrl(T_STR, len(raw)) + raw
    if isinstance(v, float):
        return _ctrl(T_DOUBLE, 8) + struct.pack(">d", v)
    if isinstance(v, int):
        if v < 0:
            raw = v.to_bytes(4, "big", signed=True)
            return bytes([0x00 | 4, T_I32 - 7]) + raw  # extended type, size 4
        raw = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
        if v < 1 << 16:
            return _ctrl(T_U16, len(raw)) + raw
        if v < 1 << 32:
            return _ctrl(T_U32, len(raw)) + raw
        return bytes([len(raw), T_U64 - 7]) + raw
    if isinstance(v, bytes):
        return _ctrl(T_BYTES, len(v)) + v
    if isinstance(v, dict):
        out = _ctrl(T_MAP, len(v))
        for k, val in v.items():
            out += _encode_value(str(k)) + _encode_value(val)
        return out
    if isinstance(v, (list, tuple)):
        out = _ctrl_ext(T_ARRAY, len(v))
        for item in v:
            out += _encode_value(item)
        return out
    raise MmdbError(f"cannot encode {type(v)}")


def _size_bits(size: int):
    if size < 29:
        return size, b""
    if size < 285:
        return 29, bytes([size - 29])
    if size < 65821:
        return 30, (size - 285).to_bytes(2, "big")
    return 31, (size - 65821).to_bytes(3, "big")


def _ctrl(dtype: int, size: int) -> bytes:
    sz, extra = _size_bits(size)
    return bytes([(dtype << 5) | sz]) + extra


def _ctrl_ext(dtype: int, size: int) -> bytes:
    sz, extra = _size_bits(size)
    return bytes([sz, dtype - 7]) + extra


class _TrieNode:
    __slots__ = ("left", "right", "data_idx")

    def __init__(self):
        self.left = None
        self.right = None
        self.data_idx = None


def _range_to_cidrs(start: int, end: int, nbits: int = 32):
    """Decompose [start, end] into maximal aligned power-of-two blocks."""
    while start <= end:
        max_size = start & -start if start else 1 << nbits
        while max_size > end - start + 1:
            max_size >>= 1
        prefix_len = nbits - max_size.bit_length() + 1
        yield start, prefix_len
        start += max_size


def build_mmdb(
    ranges: list[tuple[int, int, dict]],
    database_type: str = "GeoIP2-City",
    ip_version: int = 4,
) -> bytes:
    """Serialize (ip_start, ip_end, record_dict) ranges into a valid
    .mmdb byte string (record_size 32, values inline, no pointers).
    Fixture-scale writer: size-optimal encoding is explicitly a non-goal."""
    nbits = 32 if ip_version == 4 else 128
    root = _TrieNode()
    records: list[dict] = []
    for start, end, rec in ranges:
        idx = len(records)
        records.append(rec)
        for net, plen in _range_to_cidrs(start, end, nbits):
            node = root
            for i in range(nbits - 1, nbits - 1 - plen, -1):
                bit = (net >> i) & 1
                child = node.right if bit else node.left
                if child is None:
                    child = _TrieNode()
                    if bit:
                        node.right = child
                    else:
                        node.left = child
                node = child
            node.data_idx = idx

    # number internal nodes (pre-order); leaves carry data indexes
    nodes: list[_TrieNode] = []

    def collect(n: _TrieNode):
        if n.data_idx is not None:
            return
        nodes.append(n)
        for c in (n.left, n.right):
            if c is not None:
                collect(c)

    collect(root)
    node_ids = {id(n): i for i, n in enumerate(nodes)}
    node_count = len(nodes)

    # data section: encode each record once, remember offsets
    data = bytearray()
    offsets = []
    for rec in records:
        offsets.append(len(data))
        data += _encode_value(rec)

    def record_value(child: _TrieNode | None) -> int:
        if child is None:
            return node_count  # "no data"
        if child.data_idx is not None:
            return node_count + DATA_SEPARATOR_SIZE + offsets[child.data_idx]
        return node_ids[id(child)]

    tree = bytearray()
    for n in nodes:
        tree += record_value(n.left).to_bytes(4, "big")
        tree += record_value(n.right).to_bytes(4, "big")

    meta = {
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        "node_count": node_count,
        "record_size": 32,
        "ip_version": ip_version,
        "database_type": database_type,
        "languages": ["en"],
        "description": {"en": "enrich_spark test fixture"},
        "build_epoch": 0,
    }
    return (
        bytes(tree)
        + b"\x00" * DATA_SEPARATOR_SIZE
        + bytes(data)
        + METADATA_MARKER
        + _encode_value(meta)
    )


# ---------------------------------------------------------------------------
# converter-side helper: ranges → flat rows


def mmdb_to_rows(reader: Reader, model: str = "city") -> list[dict]:
    """Enumerate an mmdb into flat range rows ready for a Spark/DuckDB
    range table: {ip_start, ip_end, <geo or asn columns>}."""
    flatten = geo_columns if model == "city" else asn_columns
    out = []
    for start, end, rec in reader.iter_ranges(ipv4_only=True):
        row = {"ip_start": start, "ip_end": end}
        row.update(flatten(rec))
        out.append(row)
    return out


class RangeIndex:
    """Sorted-interval point-lookup over converter rows — the driver/test
    side equivalent of the Spark bucketized join (no Spark needed)."""

    def __init__(self, rows: list[dict]):
        rows = sorted(rows, key=lambda r: r["ip_start"])
        self.starts = [r["ip_start"] for r in rows]
        self.rows = rows

    def lookup(self, ip_long: int) -> dict | None:
        i = bisect.bisect_right(self.starts, ip_long) - 1
        if i >= 0 and self.rows[i]["ip_start"] <= ip_long <= self.rows[i]["ip_end"]:
            return self.rows[i]
        return None
