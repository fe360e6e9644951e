"""Trivially-correct pandas replay oracle (SURVEY §5.2.1).

Replays a change-event log strictly in LSN order, one event at a time,
with the engine's documented semantics, producing the expected final table
state. The engine's micro-batched, folded, merged result must equal this —
the final-state equivalence gate of BASELINE.json.

Semantics (authoritative statement, mirrored by ``cdc/fold.py`` +
``cdc/merge.py``):

* events are applied in ascending ``lsn``; an event whose lsn was already
  applied (verbatim duplicate) is a no-op;
* ``I`` — full-row replace (insert events carry full row images);
* ``U`` — if the key is live: non-null columns overwrite, null columns keep
  the previous value (column-granular LWW, the reference's
  ``pyspark_interface.py:45-48``); if the key is absent or tombstoned:
  the row becomes the event payload as-is;
* ``D`` — tombstone: payload cleared, key remembered with its lsn;
* every applied event increments the key's ``row_version`` (the
  generalization of the reference ``touch_counter``, ``utils/schemas.py:29``).
"""

from __future__ import annotations

import hashlib

import pandas as pd


def replay_oracle(
    events: pd.DataFrame,
    key_columns: list[str] = ("repo", "path"),
    payload_columns: list[str] | None = None,
    include_tombstones: bool = False,
) -> pd.DataFrame:
    """Replay the full event log; return the expected final table state.

    Output columns: key..., payload..., content_sha256, last_lsn,
    row_version (sorted by key), matching ``LakeTable.read()`` of the
    merged table.
    """
    key_columns = list(key_columns)
    if payload_columns is None:
        payload_columns = [
            c for c in events.columns if c not in key_columns and c not in ("lsn", "op", "ts")
        ]
    ev = events.sort_values("lsn", kind="stable").drop_duplicates("lsn", keep="first")

    state: dict[tuple, dict] = {}
    for row in ev.itertuples(index=False):
        r = row._asdict()
        key = tuple(r[k] for k in key_columns)
        cur = state.get(key)
        ver = (cur["row_version"] if cur else 0) + 1
        if r["op"] == "D":
            state[key] = {
                **{c: None for c in payload_columns},
                "last_lsn": r["lsn"],
                "row_version": ver,
                "_deleted": True,
            }
        elif r["op"] == "I" or cur is None or cur["_deleted"]:
            state[key] = {
                **{c: _norm(r.get(c)) for c in payload_columns},
                "last_lsn": r["lsn"],
                "row_version": ver,
                "_deleted": False,
            }
        else:  # U on a live row: non-null wins per column
            for c in payload_columns:
                v = _norm(r.get(c))
                if v is not None:
                    cur[c] = v
            cur["last_lsn"] = r["lsn"]
            cur["row_version"] = ver
            cur["_deleted"] = False

    rows = []
    for key, st in state.items():
        if st["_deleted"] and not include_tombstones:
            continue
        content = st.get("content")
        rows.append(
            {
                **dict(zip(key_columns, key)),
                **{c: st[c] for c in payload_columns},
                "content_sha256": (
                    hashlib.sha256(content.encode("utf-8")).hexdigest()
                    if content is not None
                    else None
                ),
                "last_lsn": st["last_lsn"],
                "row_version": st["row_version"],
                **({"_deleted": st["_deleted"]} if include_tombstones else {}),
            }
        )
    out = pd.DataFrame(rows)
    return out.sort_values(key_columns).reset_index(drop=True) if len(rows) else out


def _norm(v):
    """pandas NA/NaN → None so oracle values match Spark nulls."""
    return None if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NA else v
