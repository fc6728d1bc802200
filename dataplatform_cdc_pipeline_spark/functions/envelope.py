"""CDC envelope extraction (``__op`` / ``__ts_ns`` / ``__source_pos``).

The reference reads the Debezium-style envelope straight out of the JSON
payload with ``JSON_VALUE(data.__op)`` etc. (merge.sql:310-315;
step-5.sql:296-307). ``__ts_ns`` arrives in two encodings:

- epoch **nanoseconds** (int-as-string) — step-6.sql:311 parses
  ``FROM_UNIXTIME(x / 1000000000)``; the BQ variant divides to micros
  (merge.sql:319 ``TIMESTAMP_MICROS(CAST(x AS INT64) / 1000)``).
- ISO-8601 string ``2025-09-07T12:07:01Z`` — step-5.sql:300 strips T/Z
  with REPLACE before casting to DATETIME.

``auto`` handles both per-row (all-digits → nanos, else ISO).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_payload(data: Column | str) -> Column:
    """Parse the JSON payload ONCE into ``map<string,string>``.

    ``from_json(.., map<string,string>)`` yields exactly the per-key
    ``JSON_VALUE`` semantics (scalars as text, nested objects as JSON text,
    JSON null → NULL) in a single parse — vs ``get_json_object`` which
    re-parses the document for every extracted column. On a wide target
    (20+ columns) that is a ~20× reduction in JSON work at scan time.
    """
    data = F.col(data) if isinstance(data, str) else data
    return F.from_json(data, "map<string,string>")


def payload_value(payload: Column, key: str) -> Column:
    """Map lookup with 'null'-string → NULL (P16, step-5.sql:239)."""
    return F.nullif(F.element_at(payload, key), F.lit("null"))


def json_scalar(data: Column | str, key: str) -> Column:
    """``JSON_VALUE(data, '$.key')`` with 'null'-string → NULL (P16).

    Single-key variant kept for call sites that extract one value; plan
    builders parse once with :func:`parse_payload` instead.

    The MySQL variants wrap every extraction in
    ``NULLIF(JSON_UNQUOTE(JSON_EXTRACT(...)), 'null')`` (step-5.sql:239);
    get_json_object already returns SQL NULL for JSON null, but the literal
    string "null" payload must also map to NULL.
    """
    data = F.col(data) if isinstance(data, str) else data
    v = F.get_json_object(data, f"$.{key}")
    return F.nullif(v, F.lit("null"))


def event_ts_from_raw(raw: Column, encoding: str = "auto") -> Column:
    """``__ts_ns`` string → TimestampType at microsecond precision.

    nanos: ``TIMESTAMP_MICROS(CAST(x AS INT64) DIV 1000)`` (merge.sql:319).
    iso:   strip T/Z then cast (step-5.sql:300).
    auto:  per-row dispatch on an all-digits regex.
    """
    # integer `div`, NOT `/`: epoch-nanos ≈ 1.7e18 exceeds double's 53-bit
    # mantissa, so float division corrupts the last microsecond digit
    nanos = F.timestamp_micros(F.call_function("div", raw.cast("long"), F.lit(1000)))
    iso = F.to_timestamp(F.replace(F.replace(raw, F.lit("T"), F.lit(" ")), F.lit("Z"), F.lit("")))
    if encoding == "nanos":
        return nanos
    if encoding == "iso":
        return iso
    return F.when(raw.rlike(r"^\d+$"), nanos).otherwise(iso)


def event_ts_expr(data: Column | str, encoding: str = "auto") -> Column:
    """Single-shot variant of :func:`event_ts_from_raw` over the raw JSON."""
    return event_ts_from_raw(json_scalar(data, "__ts_ns"), encoding)


def envelope_columns(payload: Column | str = "__payload", encoding: str = "auto") -> dict[str, Column]:
    """The three envelope columns from a parsed payload map.

    - ``__op``: 'c' | 'u' | 'd' (merge.sql:312-315)
    - ``source_ts_ns_order``: event time, the dedup primary order key
      (merge.sql:310, 319)
    - ``pos``: source position (binlog offset), SIGNED, the deterministic
      tiebreak (merge.sql:310, 322)

    ``payload`` is the ``map<string,string>`` column from
    :func:`parse_payload` (plan builders materialize it once per row).
    """
    payload = F.col(payload) if isinstance(payload, str) else payload
    return {
        "__op": payload_value(payload, "__op"),
        "source_ts_ns_order": event_ts_from_raw(payload_value(payload, "__ts_ns"), encoding),
        "pos": payload_value(payload, "__source_pos").cast("long"),
    }
