"""StructType single source of truth.

The reference declares each logical schema three times — pydantic wire
views (reference src/app/views/report.py:27-124), SQLAlchemy models
(src/database/models/report.py:8-61), and MySQL DDL
(mysql/docker-entrypoint-initdb.d/01_tables.sql). Here every schema
exists exactly once as a StructType; ``from_json`` in PERMISSIVE mode
replaces pydantic ValidationError handling (invalid → null struct →
DLQ filter).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- wire envelope -----------------------------------------------------------

# reference src/app/views/report.py:15-25 — 9 optional gear slots.
EQUIPMENT_SLOTS = [
    "equip_head_id",
    "equip_amulet_id",
    "equip_torso_id",
    "equip_legs_id",
    "equip_boots_id",
    "equip_cape_id",
    "equip_hands_id",
    "equip_weapon_id",
    "equip_shield_id",
]

EQUIPMENT_SCHEMA = T.StructType(
    [T.StructField(slot, T.IntegerType(), True) for slot in EQUIPMENT_SLOTS]
)

# reference src/app/views/report.py:11-12 — optional version envelope.
METADATA_SCHEMA = T.StructType([T.StructField("version", T.StringType(), True)])

# Superset wire schema covering v1 (name-keyed, report.py:27-44) and
# v2 (id-keyed, report.py:46-52); version dispatch decides which fields
# are required (transforms.version_dispatch).
REPORT_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("metadata", METADATA_SCHEMA, True),
        # v1 identity
        T.StructField("reporter", T.StringType(), True),
        T.StructField("reported", T.StringType(), True),
        # v2 identity
        T.StructField("reporter_id", T.LongType(), True),
        T.StructField("reported_id", T.LongType(), True),
        T.StructField("region_id", T.IntegerType(), True),
        T.StructField("x_coord", T.IntegerType(), True),
        T.StructField("y_coord", T.IntegerType(), True),
        T.StructField("z_coord", T.IntegerType(), True),
        # epoch seconds OR milliseconds (normalized by transforms.normalize_ts)
        T.StructField("ts", T.LongType(), True),
        # wire 0/1 ints, cast to boolean (src/main.py:162-164)
        T.StructField("manual_detect", T.IntegerType(), True),
        T.StructField("on_members_world", T.IntegerType(), True),
        T.StructField("on_pvp_world", T.IntegerType(), True),
        T.StructField("world_number", T.IntegerType(), True),
        T.StructField("equipment", EQUIPMENT_SCHEMA, True),
        T.StructField("equip_ge_value", T.LongType(), True),
    ]
)

# --- dimension: players (01_tables.sql:3-24) ---------------------------------

PLAYERS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("possible_ban", T.BooleanType(), False),
        T.StructField("confirmed_ban", T.BooleanType(), False),
        T.StructField("confirmed_player", T.BooleanType(), False),
        T.StructField("label_id", T.IntegerType(), False),
        T.StructField("label_jagex", T.IntegerType(), False),
        T.StructField("ironman", T.BooleanType(), True),
        T.StructField("hardcore_ironman", T.BooleanType(), True),
        T.StructField("ultimate_ironman", T.BooleanType(), True),
        T.StructField("normalized_name", T.StringType(), True),
    ]
)

# --- wide staging fact (01_tables.sql:27-52) ---------------------------------

STG_REPORT_SCHEMA = T.StructType(
    [
        T.StructField("reported_id", T.LongType(), False),
        T.StructField("reporting_id", T.LongType(), False),
        T.StructField("region_id", T.IntegerType(), False),
        T.StructField("x_coord", T.IntegerType(), False),
        T.StructField("y_coord", T.IntegerType(), False),
        T.StructField("z_coord", T.IntegerType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("manual_detect", T.BooleanType(), True),
        T.StructField("on_members_world", T.IntegerType(), True),
        T.StructField("on_pvp_world", T.BooleanType(), True),
        T.StructField("world_number", T.IntegerType(), True),
    ]
    + [T.StructField(slot, T.IntegerType(), True) for slot in EQUIPMENT_SLOTS]
    + [T.StructField("equip_ge_value", T.LongType(), True)]
)

# --- normalized star (01_tables.sql:96-140) ----------------------------------

SIGHTING_KEYS = ["reporting_id", "reported_id", "manual_detect"]
GEAR_KEYS = list(EQUIPMENT_SLOTS)  # all 9, nullable → null-safe dedup/join
LOCATION_KEYS = ["region_id", "x_coord", "y_coord", "z_coord"]
FACT_PAYLOAD = [
    "reported_at",
    "on_members_world",
    "on_pvp_world",
    "world_number",
    "region_id",
]

# --- event-time policy (reference src/main.py:131-137) -----------------------

TS_LOWER_BOUND = 1577883600  # 2020-01-01 — "too late to report" guard
TS_UPPER_BOUND = 1735736400  # 2025-01-01 — "future data" guard
MS_EPOCH_CUTOFF = 10**10  # ts above this is milliseconds (src/main.py:127-129)
EQUIP_MAX_ID = 32767  # SMALLINT clamp (src/main.py:143-152)
