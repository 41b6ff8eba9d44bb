"""Column-level converters for tracker-protocol values.

Each converter mirrors a reference conversion (cited per function) but is
expressed as a native Spark SQL Column expression so the whole transform
stage stays inside whole-stage codegen — no Python UDFs on the hot path.

Error accumulation: converters that can fail return ``(value, error)``
column pairs. ``error`` is NULL on success, else a
``field_name\\tmessage\\traw_value`` string that the pipeline collects
into an ``_errors ARRAY<STRING>`` column (mirrors AtomicError.ParseError
accumulation in common/enrichments/Transform.scala:56-59).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# error helpers


def parse_error(field: str, message: str, raw: Column) -> Column:
    """An AtomicError.ParseError rendered as a single string cell."""
    return F.concat_ws("\t", F.lit(field), F.lit(message), F.coalesce(raw, F.lit("")))


def opaque(col: Column) -> Column:
    """Identity wrapper that Catalyst treats as nondeterministic
    (shuffle of a single-element array), so the wrapped expression is
    neither inlined into downstream consumers by CollapseProject nor
    substituted into predicates by filter pushdown.

    Used on the ``_errors`` accumulator: without it, the pipeline's
    good/bad split predicate (`size(_errors) > 0`) is rewritten to the
    FULL error-expression tree and pushed beneath the input repartition
    into the file scan — serializing the whole enrichment chain onto the
    scan's (possibly single) input split and evaluating every conversion
    twice. Measured 79 s → ~4 s on the sf0.1 chain."""
    return F.element_at(F.shuffle(F.array(col)), 1)


def _checked(present: Column, ok: Column, value: Column, field: str, message: str, raw: Column):
    """(value-or-null, error-or-null) for a converter guarded by `ok`."""
    val = F.when(present & ok, value)
    err = F.when(present & ~ok, parse_error(field, message, raw))
    return val, err


# ---------------------------------------------------------------------------
# string safety (ConversionUtils.makeTsvSafe:106, fixTabsNewlines:115)

_CONTROL_CHARS = "[\\p{Cntrl}&&[^\t]]"  # java regex class used after tab fix

# the literal char set [\x00-\x1f\x7f] — fed to translate() (chars with no
# replacement counterpart are DELETED), replacing the regex char-class scan
_CTRL_SET = "".join(chr(c) for c in range(0x20)) + "\x7f"


def fix_tabs_strip_ctrl(col: Column) -> Column:
    """Tabs → 4 spaces, then control chars removed. Exactly
    ``regexp_replace(regexp_replace(col, '\\t', '    '), '[\\x00-\\x1f\\x7f]', '')``
    but via literal ``replace`` + ``translate`` — the r14 optimization of
    the hottest per-row expression in the chain (~37 toTsvSafe fields ×
    every event paid two java.util.regex scans each; a literal replace
    and a char-table translate do the same scan without the regex
    engine)."""
    return F.translate(F.replace(col, F.lit("\t"), F.lit("    ")),
                       _CTRL_SET, "")


def make_tsv_safe(col: Column) -> Column:
    """Tabs → 4 spaces, control chars (incl. newlines) removed, ''→NULL."""
    fixed = fix_tabs_strip_ctrl(col)
    return F.when(F.length(fixed) > 0, fixed)


def truncate(col: Column, length: int) -> Column:
    """ConversionUtils.truncate:501 — substring keep-prefix."""
    return F.substring(col, 1, length)


# ---------------------------------------------------------------------------
# typed casts with ParseError semantics

_INT_RE = "^[+-]?[0-9]+$"
# JBigDecimal accepts optional sign, digits with optional fraction, optional exponent
_DECIMAL_RE = "^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$"
_UUID_RE = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"


def to_int(col: Column, field: str):
    """ConversionUtils.stringToJInteger2:335 — 'null' literal → NULL, junk → error.

    try_cast throughout: under ANSI mode (Spark 4 default) a plain cast
    on malformed input THROWS — a record-level engine must instead emit
    a ParseError row.
    """
    present = col.isNotNull() & (F.lower(col) != "null")
    as_int = col.try_cast("int")
    ok = col.rlike(_INT_RE) & as_int.isNotNull() & (as_int == col.try_cast("long"))
    return _checked(present, ok, as_int, field, "Cannot be converted to java.lang.Integer", col)


def to_decimal(col: Column, field: str, precision: int = 18, scale: int = 2):
    """ConversionUtils.stringToJBigDecimal2:360."""
    present = col.isNotNull() & (F.lower(col) != "null")
    value = col.try_cast(f"decimal({precision},{scale})")
    ok = col.rlike(_DECIMAL_RE) & value.isNotNull()
    return _checked(
        present, ok, value, field,
        "Cannot be converted to java.math.BigDecimal", col,
    )


def to_boolean_like_byte(col: Column, field: str):
    """ConversionUtils.stringToBooleanLikeJByte:471 — strictly '1'/'0'."""
    present = col.isNotNull()
    ok = col.isin("1", "0")
    return _checked(
        present, ok, col.cast("byte"), field,
        "Cannot be converted to Boolean-like java.lang.Byte", col,
    )


def validate_uuid(col: Column, field: str):
    """ConversionUtils.validateUuid:170 — lowercased canonical UUID."""
    present = col.isNotNull()
    ok = col.rlike(_UUID_RE)
    return _checked(present, ok, F.lower(col), field, "Not a valid UUID", col)


def extract_event_type(col: Column, field: str = "e"):
    """EventEnrichments.extractEventType:148 — tracker code → event name."""
    mapping = F.create_map(
        *[F.lit(x) for kv in [
            ("se", "struct"), ("ev", "struct"), ("ue", "unstruct"),
            ("ad", "ad_impression"), ("tr", "transaction"), ("ti", "transaction_item"),
            ("pv", "page_view"), ("pp", "page_ping"),
        ] for x in kv]
    )
    present = col.isNotNull()
    value = mapping[col]
    ok = value.isNotNull()
    return _checked(present, ok, value, field, "Not a valid event type", col)


_PLATFORMS = ["web", "iot", "app", "mob", "pc", "cnsl", "tv", "srv", "headset"]


def extract_platform(col: Column, field: str = "p"):
    """MiscEnrichments.extractPlatform:51-67 — closed platform enum."""
    present = col.isNotNull()
    ok = col.isin(*_PLATFORMS)
    return _checked(present, ok, col, field, "Not a valid platform", col)


def extract_ip(col: Column) -> Column:
    """MiscEnrichments.extractIp:78-84 — first IP of a comma-separated
    X-Forwarded-For style list, then TSV-safed. Infallible."""
    first = F.regexp_extract(col, "^\\s*([^,\\s]+)", 1)
    return make_tsv_safe(F.when(col.isNotNull(), first))


def extract_timestamp(col: Column, field: str):
    """EventEnrichments.extractTimestamp:114-133 — epoch-millis string →
    timestamp; rejects non-numeric and years outside [0, 9999]."""
    present = col.isNotNull()
    numeric = col.rlike(_INT_RE)
    as_long = col.try_cast("long")
    ts = F.timestamp_millis(as_long)
    in_range = numeric & as_long.isNotNull() & F.year(ts).between(0, 9999)
    val = F.when(present & in_range, ts)
    err = F.when(
        present & ~numeric,
        parse_error(field, "Not in the expected format: ms since epoch", col),
    ).when(
        present & numeric & ~in_range,
        parse_error(field, "Formatting is not Redshift-compatible", col),
    )
    return val, err


def extract_view_dimensions(col: Column, field: str):
    """ClientEnrichments.extractViewDimensions:40-49 — 'WxH' → (int, int).

    Returns ((width, height), error).
    """
    present = col.isNotNull()
    ok = col.rlike("^(\\d+)x(\\d+)$")
    w = F.regexp_extract(col, "^(\\d+)x(\\d+)$", 1).try_cast("int")
    h = F.regexp_extract(col, "^(\\d+)x(\\d+)$", 2).try_cast("int")
    # width/height must fit in ints (reference: .toInt throws → error)
    fits = w.isNotNull() & h.isNotNull()
    width = F.when(present & ok & fits, w)
    height = F.when(present & ok & fits, h)
    err = F.when(
        present & (~ok | ~fits),
        parse_error(field, "Does not conform to regex (\\d+)x(\\d+)", col),
    )
    return (width, height), err


def decode_base64_url(col: Column, field: str):
    """ConversionUtils.decodeBase64Url:137-160 — URL-safe base64 → UTF-8.

    Spark's unbase64 accepts the standard alphabet; translate -_ → +/ first
    and strip whitespace/padding slack.
    """
    present = col.isNotNull()
    std = F.translate(F.regexp_replace(col, "[\\r\\n ]", ""), "-_", "+/")
    ok = std.rlike("^[A-Za-z0-9+/]*={0,2}$")
    decoded = F.decode(F.unbase64(std), "UTF-8")
    return _checked(present, ok, decoded, field, "Could not base64 decode", col)


def format_timestamp(col: Column) -> Column:
    """Render TimestampType → 'yyyy-MM-dd HH:mm:ss.SSS' (EventEnrichments.scala:30-38)."""
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSS")
