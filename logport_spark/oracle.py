"""Single-process pure-Python reference oracle (no Spark).

Implements the reference's parse→envelope→route→count semantics literally,
line by line, as an independent check on the distributed pipeline:

- line framing + empty-line drop: src/InotifyWatcher.cc:346-415, 377-400
- JSON detect (first char `{` or `[`) + parse fallback: src/Watch.cc:413-422
- envelope fields added only if non-empty; keys serialized sorted+compact;
  `@timestamp` a quoted "sec.9-digit-ns" string: src/Watch.cc:404-424,
  src/Common.cc:253-270 (here derived deterministically from warc_ts)
- per-sink aggregates: rows routed, bytes shipped (envelope bytes + 1 for the
  newline the reference appends when spilling, src/KafkaProducer.cc:101-108),
  parse failures (the `{`/`[`-but-unparseable fallback branch)

pytest compares Spark output to this oracle order-insensitively.
"""

from __future__ import annotations

import json
from collections import defaultdict
from datetime import datetime, timezone
from urllib.parse import urlparse

from .config import DEFAULT_ROUTE_KEY, LOCALES, RouteSpec, domain_tld_rows, routes_by_key


def format_timestamp(warc_ts: datetime) -> str:
    """'%lld.%.9ld' — epoch seconds + 9-digit nanoseconds (from microseconds)."""
    ts = warc_ts.replace(tzinfo=timezone.utc) if warc_ts.tzinfo is None else warc_ts
    epoch = int(ts.timestamp())
    nanos = ts.microsecond * 1000
    return f"{epoch}.{nanos:09d}"


def build_envelope(
    line: str, ts_str: str, host: str, source: str, prd: str, log_type: str
) -> tuple[str, bool, bool]:
    """Return (envelope_json, is_obj, parse_fail) for one non-empty line."""
    env: dict = {"@timestamp": ts_str}
    if host:
        env["host"] = host
    if source:
        env["source"] = source
    if prd:
        env["prd"] = prd
    if log_type:
        env["log_type"] = log_type
    is_obj = False
    parse_fail = False
    first = line[0] if line else ""
    if first in ("{", "["):
        try:
            env["log_obj"] = json.loads(line)
            is_obj = True
        except ValueError:
            env["log"] = line
            parse_fail = True
    else:
        env["log"] = line
    return (
        json.dumps(env, sort_keys=True, separators=(",", ":"), ensure_ascii=False),
        is_obj,
        parse_fail,
    )


def route_for(url: str) -> tuple[str, RouteSpec, dict]:
    """domain → (category|default) → RouteSpec, plus enrichment values."""
    domain = urlparse(url).hostname or ""
    dt = {r["domain"]: r for r in domain_tld_rows()}.get(domain)
    category = dt["category"] if dt else None
    tld = dt["tld"] if dt else None
    routes = routes_by_key()
    spec = routes.get(category if category is not None else DEFAULT_ROUTE_KEY, routes[DEFAULT_ROUTE_KEY])
    return domain, spec, {"tld": tld, "category": category}


def run_oracle(pages: list[dict]) -> dict:
    """Run the full reference pipeline in-process.

    Returns {"records": [...], "metrics": {sink: {"rows_routed", "bytes_shipped",
    "parse_failures"}}}.
    """
    records = []
    metrics: dict[str, dict] = defaultdict(lambda: {"rows_routed": 0, "bytes_shipped": 0, "parse_failures": 0})
    for page in pages:
        url = page["url"]
        ts_str = format_timestamp(page["warc_ts"])
        domain, spec, enr = route_for(url)
        locale = LOCALES.get(page["lang"])
        for line_no, line in enumerate(page["text"].split("\n"), start=1):
            if len(line) == 0:
                continue  # empty lines never become messages
            record, is_obj, parse_fail = build_envelope(
                line, ts_str, spec.hostname, url, spec.product_code, spec.log_type
            )
            nbytes = len(record.encode("utf-8"))
            records.append(
                {
                    "url": url,
                    "line_no": line_no,
                    "line": line,
                    "record": record,
                    "is_obj": is_obj,
                    "parse_fail": parse_fail,
                    "sink": spec.sink,
                    "domain": domain,
                    "tld": enr["tld"],
                    "category": enr["category"],
                    "lang": page["lang"],
                    "locale": locale,
                    "record_bytes": nbytes,
                }
            )
            m = metrics[spec.sink]
            m["rows_routed"] += 1
            m["bytes_shipped"] += nbytes + 1  # +1: newline per spilled message
            m["parse_failures"] += int(parse_fail)
    return {"records": records, "metrics": dict(metrics)}
