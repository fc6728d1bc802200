"""CDC batch plan: window scan → dedup → typed projection → change set.

Mirrors the reference lifecycle phases 4-5 (SURVEY.md §3): the upsert view
``log_v_i`` (merge.sql:306-326) and delete view ``log_v_d`` with the J2
survivorship join (merge.sql:334-349) — plus the engine's default *unified*
plan (SURVEY.md §7): dedup ALL ops together and let the merge branch on
``__op``, which provably reproduces J2 with one fewer shuffle/join.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataplatform_cdc_pipeline_spark.config import MergeConfig
from dataplatform_cdc_pipeline_spark.functions.envelope import (
    envelope_columns,
    parse_payload,
    payload_value,
)
from dataplatform_cdc_pipeline_spark.operators.dedup import latest_per_key, latest_per_key_agg
from dataplatform_cdc_pipeline_spark.plans.cast_rules import cast_expr, typed_projection


def window_scan(
    raw: DataFrame,
    cfg: MergeConfig,
    start: datetime.datetime | str | None,
    end: datetime.datetime | str | None,
) -> DataFrame:
    """S4 + F1 + F3: half-open arrival-time window of valid CDC events.

    ``load_ts > start AND load_ts <= end AND JSON_VALUE(data.__op) IS NOT
    NULL`` (merge.sql:307-315; step-5.sql:303-307). Arrival-time windowing —
    late *event-time* data is processed in the batch it arrives in
    (SURVEY.md §2.8). The load_ts range predicate is what partition-prunes a
    date-partitioned bronze table (automatic in Spark — the reference needed
    an explicit PARTITION list, step-8:352-377).
    """
    out = raw.withColumn("__payload", parse_payload("data"))
    out = out.withColumn("__op", payload_value(F.col("__payload"), "__op")).filter(
        F.col("__op").isNotNull()
    )
    lt = F.col(cfg.load_ts_col)
    if start is not None:
        out = out.filter(lt > F.lit(start))
    if end is not None:
        out = out.filter(lt <= F.lit(end))
    return out


def _pk_exprs(cfg: MergeConfig, target_schema: T.StructType, payload: str = "__payload") -> list[Column]:
    """Typed PK extraction expressions from the JSON payload.

    Default: cast PKs to their declared type *before* dedup (intentional
    fix of the reference's string-form-dedup hazard, SURVEY.md §4 — e.g.
    "01" vs "1" dedup separately in the reference but join equal).
    ``cfg.string_pk_dedup=True`` restores literal reference behavior
    (merge.sql:310 partitions on JSON_VALUE strings).
    """
    by_name = {f.name: f for f in target_schema.fields}
    exprs = []
    for k in cfg.pk:
        json_key = cfg.json_key_overrides.get(k, k)
        raw = payload_value(F.col(payload), json_key)
        if cfg.string_pk_dedup or k not in by_name:
            exprs.append(raw.alias(k))
        else:
            exprs.append(cast_expr(by_name[k], cfg, payload))
    return exprs


def build_changes(
    windowed: DataFrame,
    target_schema: T.StructType,
    cfg: MergeConfig,
    deterministic_audit: bool = False,
) -> DataFrame:
    """Unified change set: one typed row per PK with the final ``__op``.

    Dedup across inserts *and* deletes together — a delete survives iff it
    is the newest event for its key, which is exactly the reference's J2
    predicate ``i.pk IS NULL OR i.ts < d.ts`` (merge.sql:348) given both
    sides kept only rn=1 (proof in SURVEY.md §7). One shuffle total.
    """
    env = envelope_columns("__payload", cfg.ts_ns_encoding)
    pk_aliases = [f"__pk_{i}" for i in range(len(cfg.pk))]
    if cfg.dedup_strategy == "agg":
        # agg-dedup: groupBy(pk).max(struct(ts, pos, raw json)) — map-side
        # partial aggregation ships ≤1 candidate per key per partition
        # through the shuffle (the map column is not orderable, so the raw
        # string rides the struct and winners re-parse — a per-KEY parse,
        # not per-event)
        keyed = windowed.select(
            F.col("data"),
            F.col(cfg.load_ts_col),
            env["source_ts_ns_order"].alias("__event_ts"),
            env["pos"].alias("__pos"),
            *[e.alias(a) for a, e in zip(pk_aliases, _pk_exprs(cfg, target_schema))],
        )
        deduped = latest_per_key_agg(
            keyed, pk_aliases, "__event_ts", "__pos", ["data", cfg.load_ts_col]
        )
        deduped = deduped.withColumn("__payload", parse_payload("data")).withColumn(
            "__op", payload_value(F.col("__payload"), "__op")
        )
    else:
        # window-dedup: exact reference plan shape (ranked window, rn=1);
        # project to exactly what the dedup + typed projection need BEFORE
        # the shuffle — the raw `data` string and transport metadata would
        # otherwise ride the exchange for nothing
        keyed = windowed.select(
            F.col("__op"),
            F.col("__payload"),
            F.col(cfg.load_ts_col),
            env["source_ts_ns_order"].alias("__event_ts"),
            env["pos"].alias("__pos"),
            *[e.alias(a) for a, e in zip(pk_aliases, _pk_exprs(cfg, target_schema))],
        )
        deduped = latest_per_key(
            keyed,
            pk_aliases,
            ts_col="__event_ts",
            pos_col="__pos",
        )
    proj = typed_projection(target_schema, cfg, deterministic_audit=deterministic_audit)
    # __load_ts rides along so the merge can derive window stats + the next
    # watermark from the SAME cached frame (one agg job — the reference also
    # computes stats from the materialized view, merge.sql:360-366)
    return deduped.select(
        F.col("__op"), F.col(cfg.load_ts_col).alias("__load_ts"), *proj
    )


def build_two_stream(
    windowed: DataFrame,
    target_schema: T.StructType,
    cfg: MergeConfig,
    deterministic_audit: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Reference-fidelity plan: (log_v_i, log_v_d) with the J2 join.

    - log_v_i: ``__op != 'd'`` → dedup → typed projection (merge.sql:306-326)
    - log_v_d: ``__op = 'd'`` → dedup → LEFT JOIN log_v_i on PK, keep the
      delete iff no surviving upsert or the upsert is older
      (merge.sql:334-349; multi-PK null-check step-7:433-440).

    Kept for differential testing against the unified plan; costs one extra
    shuffle + join.
    """
    pk_names = list(cfg.pk)

    def ranked(df: DataFrame) -> DataFrame:
        env = envelope_columns("__payload", cfg.ts_ns_encoding)
        keyed = df.select(
            F.col("__op"),
            F.col("__payload"),
            F.col(cfg.load_ts_col),
            env["source_ts_ns_order"].alias("__event_ts"),
            env["pos"].alias("__pos"),
            *[e.alias(f"__pk_{i}") for i, e in enumerate(_pk_exprs(cfg, target_schema))],
        )
        return latest_per_key(
            keyed, [f"__pk_{i}" for i in range(len(pk_names))], ts_col="__event_ts", pos_col="__pos"
        )

    upserts_raw = ranked(windowed.filter(F.col("__op") != "d"))
    deletes_raw = ranked(windowed.filter(F.col("__op") == "d"))

    proj = typed_projection(target_schema, cfg, deterministic_audit=deterministic_audit)
    log_v_i = upserts_raw.select(
        F.col("__op"), F.col(cfg.load_ts_col).alias("__load_ts"), *proj
    )

    # J2 survivorship: typed-PK equi-join, delete wins only if strictly newer
    # than any surviving upsert (merge.sql:345-349).
    i_side = upserts_raw.select(
        *[F.col(f"__pk_{i}").alias(f"__ipk_{i}") for i in range(len(pk_names))],
        F.col("__event_ts").alias("__i_ts"),
    )
    cond = None
    for i in range(len(pk_names)):
        c = deletes_raw[f"__pk_{i}"] == i_side[f"__ipk_{i}"]
        cond = c if cond is None else (cond & c)
    survived = (
        deletes_raw.join(i_side, cond, "left")
        .filter(F.col("__i_ts").isNull() | (F.col("__i_ts") < F.col("__event_ts")))
        .drop(*[f"__ipk_{i}" for i in range(len(pk_names))], "__i_ts")
    )
    log_v_d = survived.select(
        F.col("__op"), F.col(cfg.load_ts_col).alias("__load_ts"), *proj
    )
    return log_v_i, log_v_d
