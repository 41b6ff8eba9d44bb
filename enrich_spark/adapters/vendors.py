"""Webhook vendor adapters — pure Python payload translators.

Each adapter mirrors its reference counterpart in
common/adapters/registry/*.scala (cited per function): a pure function
``(qs: dict, content_type: str|None, body: str|None) -> list[event dict]``
raising AdapterError for malformed payloads. Every produced event is a
tracker-protocol parameter map whose unstruct event wraps the vendor JSON
in the standard SDJ envelope (Adapter.toUnstructEventParams,
common/adapters/registry/Adapter.scala:162-266): keep nuid/aid/cv/eid/
ttm/url passthrough params, set e=ue + ue_pr envelope, p default srv.

Schema URIs come from the reference's adaptersSchemas config
(modules/common/src/main/resources/reference.conf).
"""

from __future__ import annotations

import json
from urllib.parse import parse_qsl


class AdapterError(Exception):
    """AdapterFailure — becomes an adapter_failures bad row."""


TRACKER_VERSION = {
    "callrail": "com.callrail-v1",
    "cloudfront": "com.amazon.aws.cloudfront-wd_access_log",
    "googleanalytics": "com.google.analytics.measurement-protocol-v1",
    "hubspot": "com.hubspot-v1",
    "mailchimp": "com.mailchimp-v1",
    "mailgun": "com.mailgun-v1",
    "mandrill": "com.mandrill-v1",
    "marketo": "com.marketo-v1",
    "olark": "com.olark-v1",
    "pagerduty": "com.pagerduty-v1",
    "pingdom": "com.pingdom-v1",
    "sendgrid": "com.sendgrid-v3",
    "statusgator": "com.statusgator-v1",
    "unbounce": "com.unbounce-v1",
    "urbanairship": "com.urbanairship.connect-v1",
    "vero": "com.getvero-v1",
}

UE_ENVELOPE = "iglu:com.snowplowanalytics.snowplow/unstruct_event/jsonschema/1-0-0"

# passthrough mappings kept from the original qs (Adapter.scala:50)
_PASSTHROUGH = {"nuid": "nuid", "aid": "aid", "cv": "cv", "eid": "eid", "ttm": "ttm", "url": "url"}


def _ue(schema_uri: str, data: dict | list, qs: dict, tracker: str, platform: str = "srv") -> dict:
    envelope = {"schema": UE_ENVELOPE, "data": {"schema": schema_uri, "data": data}}
    event = {"tv": tracker, "e": "ue", "p": qs.get("p", platform),
             "ue_pr": json.dumps(envelope, separators=(",", ":"))}
    for k, out in _PASSTHROUGH.items():
        if k in qs and qs[k] is not None:
            event[out] = qs[k]
    return event


def _require_body(body, content_type, expected_ct=None):
    if body is None or body == "":
        raise AdapterError("empty body: no events to process")
    if expected_ct and (content_type is None or expected_ct not in content_type):
        raise AdapterError(f"expected content type {expected_ct}, got {content_type}")
    return body


def _json_body(body, content_type, expected_ct="application/json"):
    _require_body(body, content_type, expected_ct)
    try:
        return json.loads(body)
    except (ValueError, TypeError) as e:
        raise AdapterError(f"invalid JSON body: {e}") from e


def _form_body(body, content_type):
    _require_body(body, content_type, "application/x-www-form-urlencoded")
    return dict(parse_qsl(body, keep_blank_values=True))


# --- CallRail (registry/CallrailAdapter.scala:102) --------------------------

def callrail(qs, content_type, body):
    if not qs:
        raise AdapterError("empty querystring: no CallRail event to process")
    data = {k: v for k, v in qs.items() if k not in _PASSTHROUGH}
    return [_ue("iglu:com.callrail/call_complete/jsonschema/1-0-2", data, qs,
                TRACKER_VERSION["callrail"])]


# --- Pingdom (registry/PingdomAdapter.scala:165) ----------------------------

_PINGDOM_SCHEMAS = {
    "assign": "iglu:com.pingdom/incident_assign/jsonschema/1-0-0",
    "notify_user": "iglu:com.pingdom/incident_notify_user/jsonschema/1-0-0",
    "notify_of_close": "iglu:com.pingdom/incident_notify_of_close/jsonschema/1-0-0",
}


def pingdom(qs, content_type, body):
    if "message" not in qs:
        raise AdapterError("no Pingdom message parameter")
    # strip python-repr '(u'..')' artifacts (PingdomAdapter.scala:96-104)
    raw = qs["message"]
    try:
        msg = json.loads(raw)
    except ValueError as e:
        raise AdapterError(f"Pingdom message is not JSON: {e}") from e
    action = msg.get("action")
    schema = _PINGDOM_SCHEMAS.get(action)
    if schema is None:
        raise AdapterError(f"no schema associated with Pingdom action [{action}]")
    rest = {k: v for k, v in qs.items() if k != "message"}
    return [_ue(schema, msg, rest, TRACKER_VERSION["pingdom"])]


# --- StatusGator (registry/StatusGatorAdapter.scala:128) --------------------

def statusgator(qs, content_type, body):
    form = _form_body(body, content_type)
    return [_ue("iglu:com.statusgator/status_change/jsonschema/1-0-0", form, qs,
                TRACKER_VERSION["statusgator"])]


# --- Unbounce (registry/UnbounceAdapter.scala:173) --------------------------

def unbounce(qs, content_type, body):
    form = _form_body(body, content_type)
    if "data.json" not in form:
        raise AdapterError("no data.json in Unbounce form body")
    try:
        data_json = json.loads(form["data.json"])
    except ValueError as e:
        raise AdapterError(f"Unbounce data.json is not JSON: {e}") from e
    data = {k: v for k, v in form.items() if k != "data.json"}
    data["data.json"] = data_json
    return [_ue("iglu:com.unbounce/form_post/jsonschema/1-0-0", data, qs,
                TRACKER_VERSION["unbounce"])]


# --- Mailgun (registry/MailgunAdapter.scala:206) ----------------------------

_MAILGUN_EVENTS = {
    "bounced": "message_bounced", "clicked": "message_clicked",
    "complained": "message_complained", "delivered": "message_delivered",
    "dropped": "message_dropped", "opened": "message_opened",
    "unsubscribed": "recipient_unsubscribed",
}


def mailgun(qs, content_type, body):
    form = _form_body(body, content_type)
    event = form.get("event")
    name = _MAILGUN_EVENTS.get(event)
    if name is None:
        raise AdapterError(f"no schema associated with Mailgun event [{event}]")
    return [_ue(f"iglu:com.mailgun/{name}/jsonschema/1-0-0", form, qs,
                TRACKER_VERSION["mailgun"])]


# --- Mandrill (registry/MandrillAdapter.scala:182) --------------------------

_MANDRILL_SCHEMAS = {
    "hard_bounce": "iglu:com.mandrill/message_bounced/jsonschema/1-0-2",
    "click": "iglu:com.mandrill/message_clicked/jsonschema/1-0-2",
    "deferral": "iglu:com.mandrill/message_delayed/jsonschema/1-0-2",
    "delivered": "iglu:com.mandrill/message_delivered/jsonschema/1-0-0",
    "spam": "iglu:com.mandrill/message_marked_as_spam/jsonschema/1-0-2",
    "open": "iglu:com.mandrill/message_opened/jsonschema/1-0-3",
    "reject": "iglu:com.mandrill/message_rejected/jsonschema/1-0-1",
    "send": "iglu:com.mandrill/message_sent/jsonschema/1-0-1",
    "soft_bounce": "iglu:com.mandrill/message_soft_bounced/jsonschema/1-0-2",
    "unsub": "iglu:com.mandrill/recipient_unsubscribed/jsonschema/1-0-2",
}


def mandrill(qs, content_type, body):
    form = _form_body(body, content_type)
    if "mandrill_events" not in form:
        raise AdapterError("no mandrill_events parameter in body")
    try:
        events = json.loads(form["mandrill_events"])
    except ValueError as e:
        raise AdapterError(f"mandrill_events is not JSON: {e}") from e
    if not isinstance(events, list):
        raise AdapterError("mandrill_events is not a JSON array")
    out = []
    for ev in events:
        schema = _MANDRILL_SCHEMAS.get(ev.get("event"))
        if schema is None:
            raise AdapterError(f"no schema for Mandrill event [{ev.get('event')}]")
        out.append(_ue(schema, ev, qs, TRACKER_VERSION["mandrill"]))
    return out


# --- Sendgrid (registry/SendgridAdapter.scala:153) --------------------------

_SENDGRID_TYPES = {
    "processed", "dropped", "delivered", "deferred", "bounce", "open",
    "click", "spamreport", "unsubscribe", "group_unsubscribe", "group_resubscribe",
}


def sendgrid(qs, content_type, body):
    events = _json_body(body, content_type)
    if not isinstance(events, list):
        raise AdapterError("Sendgrid body is not a JSON array")
    out, seen = [], set()
    for ev in events:
        etype = ev.get("event")
        if etype not in _SENDGRID_TYPES:
            raise AdapterError(f"no schema for Sendgrid event [{etype}]")
        # dedupe identical consecutive events by (event, sg_event_id)
        key = json.dumps(ev, sort_keys=True)
        if key in seen:
            continue
        seen.add(key)
        out.append(_ue(f"iglu:com.sendgrid/{etype}/jsonschema/3-0-0", ev, qs,
                       TRACKER_VERSION["sendgrid"]))
    return out


# --- HubSpot (registry/HubSpotAdapter.scala:175) ----------------------------

_HUBSPOT_TYPES = {
    "contact.creation": "contact_creation", "contact.deletion": "contact_deletion",
    "contact.propertyChange": "contact_change", "company.creation": "company_creation",
    "company.deletion": "company_deletion", "company.propertyChange": "company_change",
    "deal.creation": "deal_creation", "deal.deletion": "deal_deletion",
    "deal.propertyChange": "deal_change",
}


def hubspot(qs, content_type, body):
    events = _json_body(body, content_type)
    if not isinstance(events, list):
        raise AdapterError("HubSpot body is not a JSON array")
    out = []
    for ev in events:
        name = _HUBSPOT_TYPES.get(ev.get("subscriptionType"))
        if name is None:
            raise AdapterError(f"no schema for HubSpot type [{ev.get('subscriptionType')}]")
        out.append(_ue(f"iglu:com.hubspot/{name}/jsonschema/1-0-0", ev, qs,
                       TRACKER_VERSION["hubspot"]))
    return out


# --- Olark (registry/OlarkAdapter.scala:190) --------------------------------

def olark(qs, content_type, body):
    form = _form_body(body, content_type)
    if "data" not in form:
        raise AdapterError("no data parameter in Olark body")
    try:
        data = json.loads(form["data"])
    except ValueError as e:
        raise AdapterError(f"Olark data is not JSON: {e}") from e
    name = "offline_message" if "tags" in data and "offline_message" in str(data.get("tags")) else "transcript"
    return [_ue(f"iglu:com.olark/{name}/jsonschema/1-0-0", data, qs,
                TRACKER_VERSION["olark"])]


# --- PagerDuty (registry/PagerdutyAdapter.scala:178) ------------------------

def pagerduty(qs, content_type, body):
    doc = _json_body(body, content_type)
    messages = doc.get("messages")
    if not isinstance(messages, list):
        raise AdapterError("no messages array in PagerDuty body")
    return [
        _ue("iglu:com.pagerduty/incident/jsonschema/1-0-0", m, qs,
            TRACKER_VERSION["pagerduty"])
        for m in messages
    ]


# --- UrbanAirship (registry/UrbanAirshipAdapter.scala:152) ------------------

_UA_TYPES = {
    "CLOSE", "CUSTOM", "FIRST_OPEN", "IN_APP_MESSAGE_DISPLAY",
    "IN_APP_MESSAGE_EXPIRATION", "IN_APP_MESSAGE_RESOLUTION", "LOCATION",
    "OPEN", "PUSH_BODY", "REGION", "RICH_DELETE", "RICH_DELIVERY",
    "RICH_HEAD", "SEND", "TAG_CHANGE", "UNINSTALL",
}


def urbanairship(qs, content_type, body):
    ev = _json_body(body, content_type, expected_ct=None)
    etype = ev.get("type")
    if etype not in _UA_TYPES:
        raise AdapterError(f"no schema for UrbanAirship type [{etype}]")
    return [_ue(f"iglu:com.urbanairship.connect/{etype}/jsonschema/1-0-0", ev, qs,
                TRACKER_VERSION["urbanairship"], platform="mob")]


# --- Vero (registry/VeroAdapter.scala:138) ----------------------------------

_VERO_TYPES = {
    "bounced", "clicked", "delivered", "opened", "sent", "unsubscribed",
    "created", "updated",
}


def vero(qs, content_type, body):
    ev = _json_body(body, content_type, expected_ct=None)
    etype = ev.get("type")
    if etype not in _VERO_TYPES:
        raise AdapterError(f"no schema for Vero type [{etype}]")
    return [_ue(f"iglu:com.getvero/{etype}/jsonschema/1-0-0", ev, qs,
                TRACKER_VERSION["vero"])]


# --- Marketo (registry/MarketoAdapter.scala:152) ----------------------------

def marketo(qs, content_type, body):
    ev = _json_body(body, content_type)
    return [_ue("iglu:com.marketo/event/jsonschema/2-0-0", ev, qs,
                TRACKER_VERSION["marketo"])]


# --- Mailchimp (registry/MailchimpAdapter.scala:188) ------------------------

_MAILCHIMP_TYPES = {
    "subscribe", "unsubscribe", "campaign", "cleaned", "upemail", "profile",
}
_MAILCHIMP_SCHEMA_NAMES = {
    "subscribe": "subscribe", "unsubscribe": "unsubscribe",
    "campaign": "campaign_sending_status", "cleaned": "cleaned_email",
    "upemail": "email_address_change", "profile": "profile_update",
}


def _undot(flat: dict) -> dict:
    """Mailchimp dotted/bracketed form keys → nested JSON
    (MailchimpAdapter.toNestedJson): data[merges][LNAME]=x → {data:{merges:{LNAME:x}}}"""
    out: dict = {}
    for key, value in flat.items():
        parts = key.replace("]", "").replace("[", ".").split(".")
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = value
    return out


def mailchimp(qs, content_type, body):
    form = _form_body(body, content_type)
    etype = form.get("type")
    name = _MAILCHIMP_SCHEMA_NAMES.get(etype)
    if name is None:
        raise AdapterError(f"no schema for Mailchimp type [{etype}]")
    nested = _undot(form)
    return [_ue(f"iglu:com.mailchimp/{name}/jsonschema/1-0-0", nested, qs,
                TRACKER_VERSION["mailchimp"])]


# --- CloudFront access log (registry/CloudfrontAccessLogAdapter.scala:238) --

_CLOUDFRONT_ARITY = {12: "1-0-0", 15: "1-0-1", 18: "1-0-2", 19: "1-0-3",
                     23: "1-0-4", 24: "1-0-5", 26: "1-0-6"}
_CF_FIELDS_12 = [
    "dateTime", "xEdgeLocation", "scBytes", "cIp", "csMethod", "csHost",
    "csUri", "scStatus", "csReferer", "csUserAgent", "csUriQuery", "csCookie",
]


def cloudfront(qs, content_type, body):
    _require_body(body, None)
    rows = [r for r in body.split("\n") if r.strip()]
    out = []
    for row in rows:
        fields = row.split("\t")
        n = len(fields)
        version = _CLOUDFRONT_ARITY.get(n)
        if version is None:
            raise AdapterError(f"access log contains row with [{n}] fields; expected one of {sorted(_CLOUDFRONT_ARITY)}")
        # first two tsv fields are date + time → ISO dateTime
        data = {"dateTime": f"{fields[0]}T{fields[1]}Z"}
        names = _CF_FIELDS_12[1:] + [f"field{i}" for i in range(13, n + 1)]
        for name, value in zip(names, fields[2:]):
            if value not in ("-", ""):
                data[name] = value
        out.append(_ue(
            f"iglu:com.amazon.aws.cloudfront/wd_access_log/jsonschema/{version}",
            data, qs, TRACKER_VERSION["cloudfront"],
        ))
    return out


# --- Google Analytics measurement protocol --------------------------------
# Full port of registry/GoogleAnalyticsAdapter.scala: typed field
# translations (:96-130), per-hit unstruct tables (:133-213), 13 simple
# context tables (:215-310), 11 composite context tables with field-name
# breakdown / transpose / currency reattach / min-size filter (:321-760),
# and the hit-dependent direct mappings (:445-467).

import re as _re
from decimal import ROUND_HALF_EVEN, Decimal

_GA_MP = "iglu:com.google.analytics.measurement-protocol/"
_GA_RAW = "iglu:com.google.analytics/"

_GA_HIT_SCHEMAS = {
    "pageview": "page_view", "screenview": "screen_view", "event": "event",
    "transaction": "transaction", "item": "item", "social": "social",
    "exception": "exception", "timing": "timing",
}


def _ga_str(v):
    return v


def _ga_int(v):
    try:
        return int(v)
    except ValueError as e:
        raise AdapterError(f"cannot convert [{v}] to int") from e


def _ga_2dec(v):
    try:
        return float(Decimal(v).quantize(Decimal("0.01"), rounding=ROUND_HALF_EVEN))
    except Exception as e:  # noqa: BLE001 — invalid decimal string
        raise AdapterError(f"cannot convert [{v}] to two-decimals double") from e


def _ga_double(v):
    try:
        return float(v)
    except ValueError as e:
        raise AdapterError(f"cannot convert [{v}] to double") from e


def _ga_bool(v):
    if v == "1":
        return True
    if v == "0":
        return False
    raise AdapterError(f"cannot convert [{v}] to boolean, only 1 or 0 are supported")


S, I, D2, D, B = _ga_str, _ga_int, _ga_2dec, _ga_double, _ga_bool

# per-hit unstruct event tables (GoogleAnalyticsAdapter.scala:133-213)
_GA_UNSTRUCT = {
    "pageview": {"dl": ("documentLocationUrl", S), "dh": ("documentHostName", S),
                 "dp": ("documentPath", S), "dt": ("documentTitle", S)},
    "screenview": {"cd": ("screenName", S)},
    "event": {"ec": ("category", S), "ea": ("action", S), "el": ("label", S),
              "ev": ("value", I)},
    "transaction": {"ti": ("id", S), "ta": ("affiliation", S), "tr": ("revenue", D2),
                    "ts": ("shipping", D2), "tt": ("tax", D2),
                    "tcc": ("couponCode", S), "cu": ("currencyCode", S)},
    "item": {"ti": ("transactionId", S), "in": ("name", S), "ip": ("price", D2),
             "iq": ("quantity", I), "ic": ("code", S), "iv": ("category", S),
             "cu": ("currencyCode", S)},
    "social": {"sn": ("network", S), "sa": ("action", S), "st": ("actionTarget", S)},
    "exception": {"exd": ("description", S), "exf": ("isFatal", B)},
    "timing": {"utc": ("userTimingCategory", S), "utv": ("userTimingVariableName", S),
               "utt": ("userTimingTime", I), "utl": ("userTimingLabel", S),
               "plt": ("pageLoadTime", I), "dns": ("dnsTime", I),
               "pdt": ("pageDownloadTime", I), "rrt": ("redirectResponseTime", I),
               "tcp": ("tcpConnectTime", I), "srt": ("serverResponseTime", I),
               "dit": ("domInteractiveTime", I), "clt": ("contentLoadTime", I)},
}

# simple (flat) context tables (GoogleAnalyticsAdapter.scala:215-310);
# page_view doubles as a context for non-pageview hits
_GA_CONTEXTS = [
    (f"{_GA_MP}page_view/jsonschema/1-0-0", _GA_UNSTRUCT["pageview"]),
    (f"{_GA_RAW}undocumented/jsonschema/1-0-0",
     {k: (k, S) for k in ("a", "jid", "gjid")}),
    (f"{_GA_RAW}private/jsonschema/1-0-0",
     {"_v": ("v", S), "_u": ("u", S), "_gid": ("gid", S),
      "_s": ("s", I), "_r": ("r", I)}),
    (f"{_GA_MP}general/jsonschema/1-0-0",
     {"v": ("protocolVersion", S), "tid": ("trackingId", S),
      "aip": ("anonymizeIp", B), "ds": ("dataSource", S),
      "qt": ("queueTime", I), "z": ("cacheBuster", S)}),
    (f"{_GA_MP}user/jsonschema/1-0-0",
     {"cid": ("clientId", S), "uid": ("userId", S)}),
    (f"{_GA_MP}session/jsonschema/1-0-0",
     {"sc": ("sessionControl", S), "uip": ("ipOverride", S),
      "ua": ("userAgentOverride", S), "geoid": ("geographicalOverride", S)}),
    (f"{_GA_MP}traffic_source/jsonschema/1-0-0",
     {"dr": ("documentReferrer", S), "cn": ("campaignName", S),
      "cs": ("campaignSource", S), "cm": ("campaignMedium", S),
      "ck": ("campaignKeyword", S), "cc": ("campaignContent", S),
      "ci": ("campaignId", S), "gclid": ("googleAdwordsId", S),
      "dclid": ("googleDisplayAdsId", S)}),
    (f"{_GA_MP}system_info/jsonschema/1-0-0",
     {"sr": ("screenResolution", S), "vp": ("viewportSize", S),
      "de": ("documentEncoding", S), "sd": ("screenColors", S),
      "ul": ("userLanguage", S), "je": ("javaEnabled", B),
      "fl": ("flashVersion", S)}),
    (f"{_GA_MP}link/jsonschema/1-0-0", {"linkid": ("id", S)}),
    (f"{_GA_MP}app/jsonschema/1-0-0",
     {"an": ("name", S), "aid": ("id", S), "av": ("version", S),
      "aiid": ("installerId", S)}),
    (f"{_GA_MP}product_action/jsonschema/1-0-0",
     {"pa": ("productAction", S), "pal": ("productActionList", S),
      "cos": ("checkoutStep", I), "col": ("checkoutStepOption", S)}),
    (f"{_GA_MP}content_experiment/jsonschema/1-0-0",
     {"xid": ("id", S), "xvar": ("variant", S)}),
    (f"{_GA_MP}hit/jsonschema/1-0-0",
     {"t": ("type", S), "ni": ("nonInteractionHit", B)}),
    (f"{_GA_MP}promotion_action/jsonschema/1-0-0",
     {"promoa": ("promotionAction", S)}),
]

# composite context tables (GoogleAnalyticsAdapter.scala:321-436):
# "IF"-prefixed keys carry values extracted from the field NAME (indexes)
_GA_COMPOSITE = [
    (f"{_GA_MP}product/jsonschema/1-0-0",
     {"IFpr": ("index", I), "prid": ("sku", S), "prnm": ("name", S),
      "prbr": ("brand", S), "prca": ("category", S), "prva": ("variant", S),
      "prpr": ("price", D2), "prqt": ("quantity", I), "prcc": ("couponCode", S),
      "prps": ("position", I), "cu": ("currencyCode", S)}),
    (f"{_GA_MP}product_custom_dimension/jsonschema/1-0-0",
     {"IFprcd": ("productIndex", I), "IFcd": ("dimensionIndex", I),
      "prcd": ("value", S)}),
    (f"{_GA_MP}product_custom_metric/jsonschema/1-0-0",
     {"IFprcm": ("productIndex", I), "IFcm": ("metricIndex", I),
      "prcm": ("value", I)}),
    (f"{_GA_MP}product_impression_list/jsonschema/1-0-0",
     {"IFil": ("index", I), "ilnm": ("name", S)}),
    (f"{_GA_MP}product_impression/jsonschema/1-0-0",
     {"IFilpi": ("listIndex", I), "IFpi": ("productIndex", I),
      "ilpiid": ("sku", S), "ilpinm": ("name", S), "ilpibr": ("brand", S),
      "ilpica": ("category", S), "ilpiva": ("variant", S),
      "ilpips": ("position", I), "ilpipr": ("price", D2),
      "cu": ("currencyCode", S)}),
    (f"{_GA_MP}product_impression_custom_dimension/jsonschema/1-0-0",
     {"IFilpicd": ("listIndex", I), "IFpicd": ("productIndex", I),
      "IFcd": ("customDimensionIndex", I), "ilpicd": ("value", S)}),
    (f"{_GA_MP}product_impression_custom_metric/jsonschema/1-0-0",
     {"IFilpicm": ("listIndex", I), "IFpicm": ("productIndex", I),
      "IFcm": ("customMetricIndex", I), "ilpicm": ("value", I)}),
    (f"{_GA_MP}promotion/jsonschema/1-0-0",
     {"IFpromo": ("index", I), "promoid": ("id", S), "promonm": ("name", S),
      "promocr": ("creative", S), "promops": ("position", S)}),
    (f"{_GA_MP}custom_dimension/jsonschema/1-0-0",
     {"IFcd": ("index", I), "cd": ("value", S)}),
    (f"{_GA_MP}custom_metric/jsonschema/1-0-0",
     {"IFcm": ("index", I), "cm": ("value", D)}),
    (f"{_GA_MP}content_group/jsonschema/1-0-0",
     {"IFcg": ("index", I), "cg": ("value", S)}),
]
_GA_COMPOSITE_WITH_CU = [uri for uri, table in _GA_COMPOSITE if "cu" in table]
_GA_N_IF = {uri: sum(1 for k in table if k.startswith("IF"))
            for uri, table in _GA_COMPOSITE}

# field → simple-context schema reverse index
_GA_FIELD_TO_CTX = {}
for _uri, _table in _GA_CONTEXTS:
    for _f in _table:
        _GA_FIELD_TO_CTX.setdefault(_f, []).append(_uri)

# direct measurement-protocol → tracker-protocol mappings, hit-dependent
# for ti/cu (GoogleAnalyticsAdapter.directMappings:445-467)


def _ga_direct(hit_type):
    return {
        "uip": "ip", "dr": "refr", "de": "cs", "sd": "cd", "ul": "lang",
        "je": "f_java", "dl": "url", "dt": "page",
        "ti": "tr_id" if hit_type == "transaction" else "ti_id",
        "ta": "tr_af", "tr": "tr_tt", "ts": "tr_sh", "tt": "tr_tx",
        "in": "ti_nm", "ip": "ti_pr", "iq": "ti_qu", "ic": "ti_sk",
        "iv": "ti_ca",
        "cu": "tr_cu" if hit_type == "transaction" else "ti_cu",
        "ua": "ua",
    }


_GA_COMP_RE = _re.compile(
    r"^(pr|promo|il|cd|cm|cg)(\d+)([a-zA-Z]*)(\d*)([a-zA-Z]*)(\d*)$"
)


def _ga_breakdown(field: str) -> dict:
    """pr12id → {IFpr: '12', prid: value-key}; il2pi3nm → {IFilpi:'2'?...}
    — exact port of breakDownCompField (GoogleAnalyticsAdapter.scala:736-779):
    suffix-concatenated IF keys zip the extracted indexes."""
    m = _GA_COMP_RE.match(field)
    if m is None:
        raise AdapterError(
            f"cannot parse composite field name [{field}]")
    gs = m.groups()
    strs = [g for g in (gs[0], gs[2], gs[4]) if g]
    ints = [g for g in (gs[1], gs[3], gs[5]) if g]
    out = {}
    if len(strs) == len(ints):
        heads = strs
    elif len(strs) == len(ints) + 1:
        heads = strs[:-1]
    else:  # pragma: no cover — regex structure prevents this
        raise AdapterError(f"cannot parse composite field name [{field}]")
    # suffix concatenations: ["il","pi"] → ["ilpi","pi"]
    suffixes = ["".join(heads[i:]) for i in range(len(heads))]
    for sfx, idx in zip(suffixes, ints):
        out["IF" + sfx] = idx
    out["".join(strs)] = None  # placeholder; caller sets the value key
    return out


def _ga_composites(params: dict) -> list[tuple[str, dict]]:
    """buildCompositeContexts (GoogleAnalyticsAdapter.scala:667-735)."""
    composite = {k: v for k, v in params.items() if any(c.isdigit() for c in k)}
    if not composite:
        return []
    if_maps, val_pairs = [], []
    for k in sorted(composite):
        broken = _ga_breakdown(k)
        ifs = {f: v for f, v in broken.items() if f.startswith("IF")}
        val_key = next(f for f, v in broken.items() if not f.startswith("IF"))
        if_maps.append(list(ifs.items()))
        val_pairs.append([(val_key, composite[k])])
    # drop consecutive duplicate IF maps (pr1id + pr1nm → one IFpr:1)
    deduped = []
    for m in if_maps:
        if not deduped or deduped[-1] != m:
            deduped.append(m)
    grouped: dict[str, list[str]] = {}
    for pairs in val_pairs + deduped:
        for f, v in pairs:
            grouped.setdefault(f, []).append(v)
    # translate each field's value list per composite schema
    translated: dict[str, dict[str, list]] = {}
    for uri, table in _GA_COMPOSITE:
        for f, values in grouped.items():
            if f in table:
                name, conv = table[f]
                translated.setdefault(uri, {})[name] = [conv(v) for v in values]
    out = []
    for uri, m in translated.items():
        names = list(m.keys())
        columns = [m[n] for n in names]
        n_rows = max(len(c) for c in columns)
        rows = []
        for i in range(n_rows):
            row = {n: c[i] for n, c in zip(names, columns) if i < len(c)}
            if uri in _GA_COMPOSITE_WITH_CU and "cu" in params:
                row["currencyCode"] = params["cu"]
            rows.append(row)
        # filter contexts built unnecessarily: must carry a real value
        # beyond the name-extracted indexes (+ reattached currency)
        min_size = _GA_N_IF[uri]
        rows = [r for r in rows
                if len(r) > min_size + (1 if "currencyCode" in r else 0)]
        for r in rows:
            out.append((uri, r))
    return out


def googleanalytics(qs, content_type, body):
    _require_body(body, None)
    out = []
    for line in body.split("\n"):
        line = line.strip()
        if not line:
            continue
        params = dict(parse_qsl(line, keep_blank_values=True))
        hit_type = params.get("t")
        if hit_type is None:
            raise AdapterError("no t parameter provided: cannot determine hit type")
        name = _GA_HIT_SCHEMAS.get(hit_type)
        if name is None:
            raise AdapterError(f"no matching hit type [{hit_type}]")
        schema = f"{_GA_MP}{name}/jsonschema/1-0-0"

        # typed unstruct event payload
        table = _GA_UNSTRUCT[hit_type]
        ue_data = {}
        for f, v in params.items():
            if f in table:
                field_name, conv = table[f]
                ue_data[field_name] = conv(v)

        # simple contexts (buildContexts, :620-652)
        simple: dict[str, dict] = {}
        for f, v in params.items():
            for uri in _GA_FIELD_TO_CTX.get(f, ()):
                table_c = dict(_GA_CONTEXTS)[uri]
                field_name, conv = table_c[f]
                simple.setdefault(uri, {})[field_name] = conv(v)
        # pageview-as-context is redundant when the hit IS a pageview
        page_view_uri = f"{_GA_MP}page_view/jsonschema/1-0-0"
        if hit_type == "pageview":
            simple.pop(page_view_uri, None)
        ordered_simple = [
            (uri, simple[uri]) for uri, _ in _GA_CONTEXTS if uri in simple
        ]

        contexts = ordered_simple + _ga_composites(params)

        event = {"tv": TRACKER_VERSION["googleanalytics"], "e": "ue", "p": "srv",
                 "ue_pr": json.dumps(
                     {"schema": UE_ENVELOPE,
                      "data": {"schema": schema, "data": ue_data}},
                     separators=(",", ":"))}
        if contexts:
            event["co"] = json.dumps(
                {"schema": "iglu:com.snowplowanalytics.snowplow/contexts/jsonschema/1-0-1",
                 "data": [{"schema": u, "data": d} for u, d in contexts]},
                separators=(",", ":"))
        for mp_key, tp_key in _ga_direct(hit_type).items():
            if mp_key in params:
                event[tp_key] = params[mp_key]
        out.append(event)
    return out


REGISTRY: dict[tuple[str, str], object] = {
    ("com.callrail", "v1"): callrail,
    ("com.pingdom", "v1"): pingdom,
    ("com.statusgator", "v1"): statusgator,
    ("com.unbounce", "v1"): unbounce,
    ("com.mailgun", "v1"): mailgun,
    ("com.mandrill", "v1"): mandrill,
    ("com.sendgrid", "v3"): sendgrid,
    ("com.hubspot", "v1"): hubspot,
    ("com.olark", "v1"): olark,
    ("com.pagerduty", "v1"): pagerduty,
    ("com.urbanairship.connect", "v1"): urbanairship,
    ("com.getvero", "v1"): vero,
    ("com.marketo", "v1"): marketo,
    ("com.mailchimp", "v1"): mailchimp,
    ("com.amazon.aws.cloudfront", "wd_access_log"): cloudfront,
    ("com.google.analytics", "v1"): googleanalytics,
}


# ---------------------------------------------------------------------------
# Remote adapter (registry/RemoteAdapter.scala:48-117): POST the payload to
# an external HTTP translator which returns {"events": [...]} or {"error": ...}.
# The transport is injectable (tests / auth variants); registration is
# config-time like the reference's remote-adapter map (Environment.scala:114).


def make_remote_adapter(transport):
    """transport(payload_json: str) -> response body str."""

    def remote(qs, content_type, body):
        request = json.dumps({
            "queryString": qs,
            "contentType": content_type,
            "body": body,
        })
        try:
            resp = json.loads(transport(request))
        except Exception as e:  # noqa: BLE001 — surfaced as AdapterFailure
            raise AdapterError(f"remote adapter failed: {type(e).__name__}: {e}") from e
        if not isinstance(resp, dict):
            raise AdapterError("remote adapter returned non-object response")
        if resp.get("error"):
            raise AdapterError(f"remote adapter error: {resp['error']}")
        events = resp.get("events")
        if not isinstance(events, list) or not events:
            raise AdapterError("remote adapter returned no events")
        return [{str(k): str(v) for k, v in ev.items()} for ev in events]

    return remote


def http_transport(url: str, timeout: float = 10.0,
                   headers: dict | None = None):
    """The production transport: POST the payload JSON to the remote
    adapter's HTTP endpoint and return the response body
    (RemoteAdapter.scala:76-100 does the same over http4s). Returned
    callable is picklable, so it works inside the adapter UDF on
    executors."""
    return _HttpTransport(url, timeout, dict(headers or {}))


class _HttpTransport:
    def __init__(self, url: str, timeout: float, headers: dict):
        self.url, self.timeout, self.headers = url, timeout, headers

    def __call__(self, payload_json: str) -> str:
        import urllib.request

        req = urllib.request.Request(
            self.url, data=payload_json.encode("utf-8"),
            headers={"Content-Type": "application/json", **self.headers},
            method="POST")
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return resp.read().decode("utf-8")

