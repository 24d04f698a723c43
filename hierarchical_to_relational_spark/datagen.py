"""Deterministic synthetic binlog generator + pure-pandas replay oracle.

Generates the change-event stream of FIXTURES.md F6 with controllable skew
(zipf-hot conversations), duplicate events, and out-of-order arrival, then
writes parquet segments with pyarrow (no Spark dependency, byte-stable for a
given seed). ``expected_state`` replays the same events in pandas — the
independent oracle the engine's final table state must equal row-for-row
(per-turn text equality under stable (conv_id, turn_idx) ordering,
BASELINE.json:input_hint).

Event semantics:
- ``insert``/``update``: upsert every turn in ``payload.turns`` for the
  conversation; last write wins per ``(conv_id, turn_idx)`` ordered by
  ``(lsn, commit_ts)``.
- ``delete``: tombstone the whole conversation — every turn whose effective
  lsn is below the delete's lsn is removed; turns written with a higher lsn
  (re-insert after delete) survive.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH = pd.Timestamp("2026-01-01 00:00:00")
ROLES = ["user", "assistant", "system", "tool"]
TOOLS = [None, "bash", "search", "python", None, None]
WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu data spark merge stream shuffle partition broadcast"
).split()


@dataclass
class BinlogSpec:
    n_events: int = 1000
    n_convs: int = 50
    seed: int = 42
    max_turns_per_event: int = 8
    zipf_a: float = 1.3          # conv popularity skew (lower = more skew)
    delete_rate: float = 0.03
    update_rate: float = 0.45    # rest are inserts
    dup_rate: float = 0.05       # fraction of events re-emitted verbatim
    shuffle: bool = True         # out-of-order arrival
    evolve_after: int | None = None  # event index after which turns carry 'model'


def _texts(rng: np.random.Generator, n: int) -> np.ndarray:
    idx = rng.integers(0, len(WORDS), size=(n, 6))
    return np.array([" ".join(WORDS[j] for j in row) for row in idx])


def generate_events(spec: BinlogSpec) -> pd.DataFrame:
    """Logical event list (pre-duplication, pre-shuffle), one row per event:
    columns lsn, commit_ts, op, conv_id, turns (list[dict] or None)."""
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events
    conv_ranks = (rng.zipf(spec.zipf_a, size=n) - 1) % spec.n_convs
    conv_ids = np.array([f"c{r:05d}" for r in conv_ranks])
    u = rng.random(n)
    ops = np.where(u < spec.delete_rate, "delete", np.where(u < spec.delete_rate + spec.update_rate, "update", "insert"))
    lsns = np.arange(1, n + 1, dtype=np.int64)
    # commit_ts mostly follows lsn order but with jitter (ties + small inversions)
    commit_ts = EPOCH + pd.to_timedelta(lsns * 1000 + rng.integers(-500, 500, size=n), unit="ms")

    turns_col: list[list[dict] | None] = []
    next_turn = {f"c{i:05d}": 0 for i in range(spec.n_convs)}
    for i in range(n):
        cid = conv_ids[i]
        if ops[i] == "delete":
            turns_col.append(None)
            continue
        k = int(rng.integers(1, spec.max_turns_per_event + 1))
        if ops[i] == "insert" or next_turn[cid] == 0:
            start = next_turn[cid]
            next_turn[cid] = start + k
            idxs = list(range(start, start + k))
        else:  # update: rewrite k existing turn slots
            hi = max(next_turn[cid], 1)
            idxs = sorted(set(int(x) for x in rng.integers(0, hi, size=k)))
        texts = _texts(rng, len(idxs))
        turns = []
        for j, tix in enumerate(idxs):
            t = {
                "turn_idx": int(tix),
                "role": ROLES[int(rng.integers(0, len(ROLES)))],
                "text": f"{texts[j]} [e{i}]",
                "tool": TOOLS[int(rng.integers(0, len(TOOLS)))],
                "ts": (EPOCH + pd.to_timedelta(int(lsns[i]), unit="s")).to_pydatetime(),
            }
            if spec.evolve_after is not None and i >= spec.evolve_after:
                t["model"] = f"m{int(rng.integers(0, 3))}"
            turns.append(t)
        turns_col.append(turns)

    return pd.DataFrame(
        {"lsn": lsns, "commit_ts": commit_ts, "op": ops, "conv_id": conv_ids, "turns": turns_col}
    )


def arrival_order(events: pd.DataFrame, spec: BinlogSpec) -> pd.DataFrame:
    """Physical arrival stream: duplicates injected, order shuffled."""
    rng = np.random.default_rng(spec.seed + 1)
    n = len(events)
    dup_idx = rng.choice(n, size=int(n * spec.dup_rate), replace=False)
    stream = pd.concat([events, events.iloc[dup_idx]], ignore_index=True)
    if spec.shuffle:
        stream = stream.iloc[rng.permutation(len(stream))].reset_index(drop=True)
    return stream


def _turn_type(evolved: bool) -> pa.StructType:
    fields = [
        pa.field("turn_idx", pa.int32(), nullable=False),
        pa.field("role", pa.string(), nullable=False),
        pa.field("text", pa.string(), nullable=False),
        pa.field("tool", pa.string(), nullable=True),
        pa.field("ts", pa.timestamp("us"), nullable=False),
    ]
    if evolved:
        fields.append(pa.field("model", pa.string(), nullable=True))
    return pa.struct(fields)


def write_binlog(stream: pd.DataFrame, out_dir: str, n_segments: int = 8, evolved: bool = False) -> list[str]:
    """Write the arrival stream as parquet WAL segments (envelope schema)."""
    os.makedirs(out_dir, exist_ok=True)
    payload_type = pa.struct([pa.field("turns", pa.list_(_turn_type(evolved)), nullable=True)])
    schema = pa.schema(
        [
            pa.field("lsn", pa.int64(), nullable=False),
            pa.field("commit_ts", pa.timestamp("us"), nullable=False),
            pa.field("op", pa.string(), nullable=False),
            pa.field("conv_id", pa.string(), nullable=False),
            pa.field("payload", payload_type, nullable=True),
        ]
    )
    paths = []
    bounds = np.linspace(0, len(stream), n_segments + 1, dtype=int)
    for s in range(n_segments):
        seg = stream.iloc[bounds[s] : bounds[s + 1]]
        if seg.empty:
            continue
        payload = [None if t is None else {"turns": t} for t in seg["turns"]]
        tbl = pa.Table.from_pydict(
            {
                "lsn": pa.array(seg["lsn"], pa.int64()),
                "commit_ts": pa.array(seg["commit_ts"], pa.timestamp("us")),
                "op": pa.array(seg["op"], pa.string()),
                "conv_id": pa.array(seg["conv_id"], pa.string()),
                "payload": pa.array(payload, payload_type),
            },
            schema=schema,
        )
        path = os.path.join(out_dir, f"segment-{s:05d}.parquet")
        pq.write_table(tbl, path)
        paths.append(path)
    return paths


def expected_state(events: pd.DataFrame) -> pd.DataFrame:
    """Pure-pandas replay oracle → final transcripts table, sorted by
    (conv_id, turn_idx). Independent of the Spark engine (set-based LWW +
    tombstone-watermark semantics)."""
    deletes = events[events["op"] == "delete"].groupby("conv_id")["lsn"].max()
    rows = []
    ups = events[events["op"] != "delete"]
    for _, ev in ups.iterrows():
        for t in ev["turns"]:
            rows.append(
                {
                    "conv_id": ev["conv_id"],
                    "turn_idx": t["turn_idx"],
                    "role": t["role"],
                    "text": t["text"],
                    "tool": t["tool"],
                    "ts": t["ts"],
                    "lsn": ev["lsn"],
                    "commit_ts": ev["commit_ts"],
                }
            )
    if not rows:
        return pd.DataFrame(columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df = pd.DataFrame(rows)
    # whole-row last-write-wins (groupby().last() would skip nulls per column)
    df = df.sort_values(["lsn", "commit_ts"]).drop_duplicates(
        subset=["conv_id", "turn_idx"], keep="last"
    )
    df["del_lsn"] = df["conv_id"].map(deletes).fillna(-1).astype(np.int64)
    df = df[df["lsn"] > df["del_lsn"]]
    return (
        df[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
