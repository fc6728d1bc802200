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


def json_scalar(data: Column | str, key: str) -> Column:
    """``JSON_VALUE(data, '$.key')`` with 'null'-string → NULL (P16).

    The MySQL variants wrap every extraction in
    ``NULLIF(JSON_UNQUOTE(JSON_EXTRACT(...)), 'null')`` (step-5.sql:239);
    get_json_object already returns SQL NULL for JSON null, but the literal
    string "null" payload must also map to NULL.
    """
    data = F.col(data) if isinstance(data, str) else data
    v = F.get_json_object(data, f"$.{key}")
    return F.nullif(v, F.lit("null"))


def event_ts_expr(data: Column | str, encoding: str = "auto") -> Column:
    """``__ts_ns`` → TimestampType at microsecond precision.

    nanos: ``TIMESTAMP_MICROS(CAST(x AS INT64) DIV 1000)`` (merge.sql:319).
    iso:   strip T/Z then cast (step-5.sql:300).
    auto:  per-row dispatch on an all-digits regex.
    """
    raw = json_scalar(data, "__ts_ns")
    # integer `div`, NOT `/`: epoch-nanos ≈ 1.7e18 exceeds double's 53-bit
    # mantissa, so float division corrupts the last microsecond digit
    nanos = F.timestamp_micros(F.call_function("div", raw.cast("long"), F.lit(1000)))
    iso = F.to_timestamp(F.replace(F.replace(raw, F.lit("T"), F.lit(" ")), F.lit("Z"), F.lit("")))
    if encoding == "nanos":
        return nanos
    if encoding == "iso":
        return iso
    return F.when(raw.rlike(r"^\d+$"), nanos).otherwise(iso)


def envelope_columns(data: Column | str = "data", encoding: str = "auto") -> dict[str, Column]:
    """The three envelope columns as named expressions.

    - ``__op``: 'c' | 'u' | 'd' (merge.sql:312-315)
    - ``source_ts_ns_order``: event time, the dedup primary order key
      (merge.sql:310, 319)
    - ``pos``: source position (binlog offset), SIGNED, the deterministic
      tiebreak (merge.sql:310, 322)
    """
    data = F.col(data) if isinstance(data, str) else data
    return {
        "__op": json_scalar(data, "__op"),
        "source_ts_ns_order": event_ts_expr(data, encoding),
        "pos": json_scalar(data, "__source_pos").cast("long"),
    }
