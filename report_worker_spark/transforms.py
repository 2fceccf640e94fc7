"""Pure column transforms (SURVEY §2 P1-P11, F1-F4).

Every function is ``DataFrame -> DataFrame`` (or ``Column -> Column``)
built only from ``pyspark.sql.functions`` — zero Python UDFs, so the
whole chain stays inside whole-stage codegen and is identical in batch
and streaming (the streaming pipeline reuses these verbatim).

Reference citations point into /root/reference (behavioral spec only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schemas import (
    EQUIPMENT_SLOTS,
    EQUIP_MAX_ID,
    MS_EPOCH_CUTOFF,
    TS_LOWER_BOUND,
    TS_UPPER_BOUND,
)

# --- P9: name sanitization (reference src/app/controllers/player.py:23-24) ---


def sanitize_name(col: Column | str) -> Column:
    """lower, '_'/'-' → space, strip — the reference's exact recipe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[_-]", " "))


# --- P4: ms→s epoch normalization (reference src/main.py:127-129) ------------


def normalize_ts(col: Column | str, cutoff: int = MS_EPOCH_CUTOFF) -> Column:
    """Epoch in ms (> cutoff) → seconds; already-seconds pass through."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c > F.lit(cutoff), (c / 1000).cast("long")).otherwise(
        c.cast("long")
    )


# --- F1+F2: event-time bounds (reference src/main.py:131-137) ----------------


def bounds_filter(
    df: DataFrame,
    ts_col: str = "ts",
    lower: int = TS_LOWER_BOUND,
    upper: int = TS_UPPER_BOUND,
) -> DataFrame:
    """Drop rows outside [2020-01-01, 2025-01-01] epoch-seconds.

    This IS the reference's entire late/early-data policy (no watermark,
    no state) — a pushdown-friendly range predicate.
    """
    c = F.col(ts_col)
    return df.filter((c >= F.lit(lower)) & (c <= F.lit(upper)))


# --- P5: epoch→timestamp (reference src/main.py:139-141, fixed to UTC) -------


def epoch_to_timestamp(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(c)


# --- P8: equipment clamp (reference src/main.py:143-152) ---------------------


def clamp_equipment(
    df: DataFrame,
    slots: list[str] = EQUIPMENT_SLOTS,
    max_id: int = EQUIP_MAX_ID,
    flag_col: str | None = "item_bug",
) -> DataFrame:
    """Any slot id > 32767 → 0; optional ``item_bug`` warn flag."""
    present = [s for s in slots if s in df.columns]
    if flag_col:
        bug = None
        for s in present:
            cond = F.coalesce(F.col(s) > F.lit(max_id), F.lit(False))
            bug = cond if bug is None else (bug | cond)
        df = df.withColumn(flag_col, bug if bug is not None else F.lit(False))
    for s in present:
        df = df.withColumn(
            s, F.when(F.col(s) > F.lit(max_id), F.lit(0)).otherwise(F.col(s))
        )
    return df


# --- P1: struct flatten (reference src/main.py:166-174) ----------------------


def flatten_struct(df: DataFrame, struct_col: str) -> DataFrame:
    """Promote ``struct_col.*`` to top level, dropping the struct."""
    inner = [f"{struct_col}.{f.name}" for f in df.schema[struct_col].dataType.fields]
    others = [c for c in df.columns if c != struct_col]
    return df.select(*others, *inner)


# --- P6/P7: bool casts and reverse defaults ----------------------------------


def int_to_bool(df: DataFrame, cols: list[str]) -> DataFrame:
    """Wire 0/1 ints → boolean (reference src/main.py:162-164)."""
    for c in cols:
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast("boolean"))
    return df


def bool_to_int_default0(col: Column | str) -> Column:
    """bool/None → int with None→0 (DLQ re-encode, views/report.py:188-204)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("int"), F.lit(0))


# --- P11: ms re-encode (views/report.py:188) ---------------------------------


def timestamp_to_epoch_ms(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.unix_timestamp(c) * 1000).cast("long")


# --- P10: version dispatch (reference src/main.py:198-209) -------------------


def with_version(df: DataFrame, default: str = "v1.0.0") -> DataFrame:
    """Absent metadata/version ⇒ v1 (reference src/main.py:202)."""
    ver = (
        F.coalesce(F.col("metadata.version"), F.lit(default))
        if "metadata" in df.columns
        else F.lit(default)
    )
    return df.withColumn("version", ver)


def version_dispatch(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split into (v1 name-keyed, v2 id-keyed) branches.

    Caller transforms each and re-merges with ``unionByName`` — the
    declarative analog of the reference's per-message if/else.
    """
    df = with_version(df)
    v1 = df.filter(F.col("version") == "v1.0.0")
    v2 = df.filter(F.col("version") == "v2.0.0")
    return v1, v2


# --- F3: null-guard on resolved ids (reference src/main.py:110-117) ----------


def require_not_null(df: DataFrame, cols: list[str]) -> DataFrame:
    cond = None
    for c in cols:
        k = F.col(c).isNotNull()
        cond = k if cond is None else (cond & k)
    return df.filter(cond) if cond is not None else df
