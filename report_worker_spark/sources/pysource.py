"""Custom Python DataSource (Spark 4 API): a deterministic, resumable
wire-message generator stream.

``spark.readStream.format("wiregen")`` yields the same JSON wire
corpus as :mod:`sources.synthetic` but as a REAL streaming source with
offset tracking: offsets are message indexes, every message's content
is a pure function of (seed, msg_id) — hash-derived, not an RNG
stream — so any index range can be (re)generated independently on any
worker. Restart from a checkpoint replays exactly the uncommitted
range: deterministic content + offset bookkeeping = effectively-once
end to end, which makes this the load/chaos harness for the ingest
pipeline (batch mode works too for parity tests).

The reference's load generator is a driver-side asyncio loop
(reference kafka_setup/src/main.py:41-93); this source keeps its
distribution but generates distributed and resumable.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..schemas import EQUIPMENT_SLOTS

WIRE_SCHEMA = "msg_id bigint, value string"


def _h(seed: int, msg_id: int, field: str) -> int:
    """Uniform 64-bit draw, pure in (seed, msg_id, field)."""
    d = hashlib.md5(f"{seed}:{msg_id}:{field}".encode()).digest()
    return int.from_bytes(d[:8], "big")


def wire_message(seed: int, msg_id: int, n_players: int = 300) -> str:
    """The synthetic wire JSON for one message id — same field
    distribution as sources.synthetic.generate_reports (v1/v2 mix,
    ms/s epochs, out-of-bounds tails, NULL-able equipment)."""
    lo, hi = 838857600, 2145916800
    is_v1 = _h(seed, msg_id, "v") % 2 == 0
    ts = lo + _h(seed, msg_id, "ts") % (hi - lo)
    if _h(seed, msg_id, "ms") % 4 == 0:
        ts *= 1000
    reporter_n = _h(seed, msg_id, "rp") % n_players
    reported_n = _h(seed, msg_id, "rd") % n_players
    equipment = {
        slot: (
            None
            if _h(seed, msg_id, f"eq0{slot}") % 10 < 3
            else _h(seed, msg_id, f"eq{slot}") % 40001
        )
        for slot in EQUIPMENT_SLOTS
    }
    body = {
        "reporter": f"player{reporter_n}" if is_v1 else None,
        "reported": f"player{reported_n}" if is_v1 else None,
        "reporter_id": None if is_v1 else reporter_n,
        "reported_id": None if is_v1 else reported_n,
        "region_id": 10000 + _h(seed, msg_id, "rg") % 501,
        "x_coord": _h(seed, msg_id, "x") % 5001,
        "y_coord": _h(seed, msg_id, "y") % 5001,
        "z_coord": _h(seed, msg_id, "z") % 4,
        "ts": ts,
        "manual_detect": _h(seed, msg_id, "md") % 2,
        "on_members_world": _h(seed, msg_id, "mw") % 2,
        "on_pvp_world": _h(seed, msg_id, "pw") % 2,
        "world_number": 300 + _h(seed, msg_id, "wn") % 201,
        "equipment": equipment,
        "equip_ge_value": _h(seed, msg_id, "gv") % 1_000_000,
    }
    meta_absent = is_v1 and _h(seed, msg_id, "ma") % 2 == 0
    msg = {
        "metadata": None if meta_absent else {"version": "v1" if is_v1 else "v2"},
        **body,
    }
    return json.dumps(msg, separators=(",", ":"), sort_keys=True)


class WireGenSource(DataSource):
    """format("wiregen") — options: seed, n (batch mode row count),
    rows_per_batch (streaming), n_partitions."""

    @classmethod
    def name(cls) -> str:
        return "wiregen"

    def schema(self) -> str:
        return WIRE_SCHEMA

    def reader(self, schema) -> "WireGenBatchReader":
        return WireGenBatchReader(self.options)

    def simpleStreamReader(self, schema) -> "WireGenStreamReader":
        return WireGenStreamReader(self.options)


class WireGenBatchReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.seed = int(options.get("seed", 42))
        self.n = int(options.get("n", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        return [InputPartition(p) for p in range(self.n_partitions)]

    def read(self, partition):
        for i in range(partition.value, self.n, self.n_partitions):
            yield (i, wire_message(self.seed, i))


class WireGenStreamReader(SimpleDataSourceStreamReader):
    """Offsets are plain message indexes; content is pure in the index,
    so commit/restart replays exactly the uncommitted range."""

    def __init__(self, options) -> None:
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rows_per_batch", 1000))
        # max_rows >= 0 bounds the stream (the offset stops advancing
        # at max_rows, so no further micro-batches fire) — lets tests
        # compare a kill-and-resume run against a one-shot run over the
        # exact same message range. Default -1 = unbounded.
        self.max_rows = int(options.get("max_rows", -1))

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict):
        lo = start["idx"]
        hi = lo + self.rows_per_batch
        if self.max_rows >= 0:
            hi = min(hi, max(lo, self.max_rows))
        return (
            iter([(i, wire_message(self.seed, i)) for i in range(lo, hi)]),
            {"idx": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [(i, wire_message(self.seed, i)) for i in range(start["idx"], end["idx"])]
        )


def register(spark) -> None:
    spark.dataSource.register(WireGenSource)


import sys as _sys

from ..util import pickle_by_value as _pbv

_pbv(_sys.modules[__name__])
