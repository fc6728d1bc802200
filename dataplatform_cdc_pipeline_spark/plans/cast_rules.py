"""The JSON→typed-column cast-rule engine (SURVEY.md §2.2, rules P1–P20).

The reference generates one cast expression per target column by a
priority-ordered CASE over config lists and the catalog type
(BQ: merge.sql:220-304; MySQL: step-5.sql:230-249). First match wins.
This module is the Spark-native equivalent: ``StructField × MergeConfig →
Column`` — pure control-plane Python emitting native Catalyst expressions
(no UDFs, fully codegen-able).

Rule priority (mirroring merge.sql's CASE order):

  P1  SysEndTime sentinel                      merge.sql:224-225
  P2  row_key_binary  → `rowkeynum`            merge.sql:227-234
  P3  row_key_timestamp → `rowkeynum`          merge.sql:236-243
  P4  epoc_nano_cols (epoch ns → ts)           merge.sql:245-247
  P5  epoc_day_cols (epoch days → date)        merge.sql:249-251
  P6  epoc_cols (epoch s → ts, MySQL only)     step-5.sql:236
  P7  bit_to_int_col ('true'→1)                merge.sql:253-255
  P8  non_epoch_datetime_col (ISO → ts)        merge.sql:257-259
  P9  datetime_to_int_val_col (→yyyymmddHHMMSS) merge.sql:261-263
  P10 col_value_as_current_time_ist            step-5.sql:238
  P11 BOOL ('true'/'1'/'false'/'0')            merge.sql:265-269
  P12 TIMESTAMP (ISO, zone stripped)           merge.sql:271-273
  P13 DATETIME (epoch millis)                  merge.sql:275-277
  P14 JSON passthrough                         merge.sql:279-281
  P15 default CAST to declared type            merge.sql:283-285
  P16 'null'-string → NULL wrapper             step-5.sql:239 (in json_scalar)
  P17 metadata column exclusion                merge.sql:291-294
  P18 audit column injection                   merge.sql:317-323
  P19 json key override (PLACE ← $.place)      step-7:310
  P20 config normalization                     merge.sql:96-104 (in config.py)
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataplatform_cdc_pipeline_spark.config import MergeConfig
from dataplatform_cdc_pipeline_spark.functions.envelope import payload_value

#: P1 sentinel value (merge.sql:224-225)
SYS_END_TIME = datetime.datetime(9999, 12, 31, 23, 59, 59, 999999)


def _rowkey_binary_expr(payload: Column, json_key: str) -> Column:
    """P2: base64 payload → 8 bytes → big-endian signed INT64.

    Reference: ``TO_CODE_POINTS(FROM_BASE64(x))`` assembled with shifts
    56..0 (merge.sql:227-234), i.e. a SIGNED big-endian INT64 — a high bit
    set yields a negative value. ``conv(hex,16,10)`` alone returns the
    unsigned decimal (overflows a signed cast under ANSI), so assemble from
    two 32-bit halves with shiftleft, mirroring the reference's arithmetic.
    """
    raw = payload_value(payload, json_key)
    hx = F.lpad(F.hex(F.unbase64(raw)), 16, "0")
    high = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    low = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    return F.shiftleft(high, 32) + low


def _rowkey_timestamp_expr(payload: Column, json_key: str) -> Column:
    """P3: ISO timestamp string → epoch seconds (merge.sql:236-243)."""
    raw = payload_value(payload, json_key)
    return F.unix_timestamp(F.to_timestamp(raw)).cast("long")


def _bool_expr(raw: Column) -> Column:
    """P11: case-insensitive 'true'/'1' → TRUE, 'false'/'0' → FALSE, else NULL
    (merge.sql:265-269)."""
    low = F.lower(raw)
    return (
        F.when(low.isin("true", "1"), F.lit(True))
        .when(low.isin("false", "0"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def _iso_ts_expr(raw: Column) -> Column:
    """P8/P12: ISO-8601 ``…T…Z`` → zone-less timestamp (merge.sql:271-273
    casts TIMESTAMP→DATETIME to drop UTC; with session tz pinned to UTC,
    ``to_timestamp`` is value-identical)."""
    return F.to_timestamp(F.replace(F.replace(raw, F.lit("T"), F.lit(" ")), F.lit("Z"), F.lit("")))


def cast_expr(
    field: T.StructField,
    cfg: MergeConfig,
    payload: Column | str | None = "__payload",
    raw: Column | None = None,
) -> Column:
    """Build the cast expression for one target column (first match wins).

    ``payload`` is the parsed ``map<string,string>`` column
    (functions/envelope.parse_payload) — the JSON document is parsed once
    per row, not once per column. Callers that pre-extracted the raw string
    (e.g. the window scan's json_tuple PK columns) pass it via ``raw`` with
    ``payload=None``; only the row-key rules P2/P3 — which read a *different*
    payload key — still require the map.
    """
    if payload is not None:
        payload = F.col(payload) if isinstance(payload, str) else payload
    name = field.name
    # P19: json key override (step-7:310 reads $.place for column PLACE)
    json_key = cfg.json_key_overrides.get(name, name)
    if raw is None:
        if payload is None:
            raise ValueError(f"cast_expr({name}): need either payload or raw")
        raw = payload_value(payload, json_key)
    dt = field.dataType

    # P1 — SysEndTime sentinel (merge.sql:224-225)
    if name == "SysEndTime":
        expr = F.lit(SYS_END_TIME).cast(dt if isinstance(dt, (T.TimestampType, T.TimestampNTZType)) else "timestamp")
    # P2/P3 — row-key decode into the `rowkeynum` column (merge.sql:227-243);
    # config holds the *JSON key* carrying the row key.
    elif cfg.row_key_binary and name.lower() == "rowkeynum":
        if payload is None:
            raise ValueError("row_key_binary cast needs the payload map")
        expr = _rowkey_binary_expr(payload, cfg.row_key_binary).cast(dt)
    elif cfg.row_key_timestamp and name.lower() == "rowkeynum":
        if payload is None:
            raise ValueError("row_key_timestamp cast needs the payload map")
        expr = _rowkey_timestamp_expr(payload, cfg.row_key_timestamp).cast(dt)
    # P4 — epoch nanos → timestamp (merge.sql:245-247: TIMESTAMP_MICROS(DIV(x,1000)))
    elif name in cfg.epoc_nano_cols:
        # integer `div` — float division loses precision at epoch-nanos scale
        expr = F.timestamp_micros(F.call_function("div", raw.cast("long"), F.lit(1000))).cast(dt)
    # P5 — epoch days → date (merge.sql:249-251)
    elif name in cfg.epoc_day_cols:
        expr = F.date_add(F.lit(datetime.date(1970, 1, 1)), raw.cast("int")).cast(dt)
    # P6 — epoch seconds → timestamp (step-5.sql:236, MySQL-only rule)
    elif name in cfg.epoc_cols:
        expr = F.timestamp_seconds(raw.cast("long")).cast(dt)
    # P7 — bit_to_int: 'true'→1, 'false'→0, else NULL (merge.sql:253-255)
    elif name in cfg.bit_to_int_col:
        expr = (
            F.when(raw == "true", F.lit(1)).when(raw == "false", F.lit(0)).otherwise(F.lit(None)).cast(dt)
        )
    # P8 — non-epoch ISO datetime (merge.sql:257-259; step-5.sql:237 strips T/Z)
    elif name in cfg.non_epoch_datetime_col:
        expr = _iso_ts_expr(raw).cast(dt)
    # P13 — DATETIME from epoch-millis numeric string:
    # DATETIME(TIMESTAMP_MILLIS(CAST(CAST(x AS NUMERIC) AS INT64)))
    # (merge.sql:275-277). The NUMERIC hop tolerates decimal text like
    # "1718000000123.0"; decimal→long truncates like BQ's cast.
    elif name in cfg.datetime_millis_cols:
        expr = F.timestamp_millis(raw.cast("decimal(38,6)").cast("long")).cast(dt)
    # P9 — ISO timestamp → integer yyyymmddHHMMSS (merge.sql:261-263)
    elif name in cfg.datetime_to_int_val_col:
        expr = F.date_format(_iso_ts_expr(raw), "yyyyMMddHHmmss").cast(dt if isinstance(dt, T.NumericType) else "long")
    # P10 — ignore payload, write current IST wall-clock (step-5.sql:238)
    elif name in cfg.col_value_as_current_time_ist:
        expr = F.from_utc_timestamp(F.current_timestamp(), "Asia/Kolkata").cast(dt)
    # P11 — BOOL parse (merge.sql:265-269)
    elif isinstance(dt, T.BooleanType):
        expr = _bool_expr(raw)
    # P12 — TIMESTAMP: ISO → zone-stripped (merge.sql:271-273)
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        expr = _iso_ts_expr(raw).cast(dt)
    # (P13 handled above via cfg.datetime_millis_cols — Spark has no separate
    # DATETIME type, so the rule is config-list-driven rather than keyed on
    # the catalog type like BQ.)
    # P14 — JSON passthrough: nested objects survive as their JSON text in
    # the parsed map (merge.sql:279-281), so the default branch covers it.
    # P15 — default CAST to the declared catalog type (merge.sql:283-285;
    # step-5.sql:239-244 maps int family → SIGNED, decimal(p,s), double, …
    # — all subsumed by Spark's cast to the StructField's type).
    else:
        expr = raw.cast(dt)
    return expr.alias(name)


def typed_projection(
    target_schema: T.StructType,
    cfg: MergeConfig,
    payload: Column | str = "__payload",
    include_audit: bool = True,
    deterministic_audit: bool = False,
) -> list[Column]:
    """Full projection for the upsert view (merge.sql:306-326).

    - P17: metadata/audit columns of the *target* are not cast from payload
      (merge.sql:291-294) — they are injected (P18) instead:
      ``source_ts_ns_order`` (event ts), ``pos`` (source position),
      ``updated_on`` (current_timestamp ≡ BIGQUERY_UPDATED_ON).
    - ``deterministic_audit`` drops wall-clock audit columns so tests and
      oracle comparisons are reproducible.
    """
    from dataplatform_cdc_pipeline_spark.functions.envelope import envelope_columns

    payload_c = F.col(payload) if isinstance(payload, str) else payload
    cols: list[Column] = []
    excluded = {c.lower() for c in MergeConfig.EXCLUDED_COLUMNS}
    for field in target_schema.fields:
        if field.name.lower() in excluded:
            continue
        cols.append(cast_expr(field, cfg, payload_c))
    if include_audit:
        env = envelope_columns(payload_c, cfg.ts_ns_encoding)
        cols.append(env["source_ts_ns_order"].alias("source_ts_ns_order"))
        cols.append(env["pos"].alias("pos"))
        if not deterministic_audit:
            cols.append(F.current_timestamp().alias("updated_on"))
    return cols
