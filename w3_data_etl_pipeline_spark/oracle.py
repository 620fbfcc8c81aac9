"""Single-threaded reference reducer — the correctness oracle for the
CDC engine (FIXTURES.md §F2). Deliberately naive: applies events one
at a time in (lsn, commit) order into a dict. The engine's massively
parallel result must equal this byte-for-byte (per-key
sha256(content)); any nondeterminism in the engine shows up here.
"""

from __future__ import annotations

import hashlib


def reduce_events(
    snapshot_rows: list[dict], event_rows: list[dict]
) -> dict[tuple[str, str], dict]:
    """Last-writer-wins with delete tombstones, max-LSN per key."""
    state: dict[tuple[str, str], dict] = {}
    for r in snapshot_rows:
        state[(r["repo"], r["path"])] = dict(r)
    ordered = sorted(event_rows, key=lambda e: (e["lsn"], e.get("commit") or ""))
    for e in ordered:
        k = (e["repo"], e["path"])
        prev_lsn = state[k].get("lsn", 0) if k in state else None
        if prev_lsn is not None and e["lsn"] < prev_lsn:
            continue  # stale event
        if e["op"] == "D":
            state.pop(k, None)
        else:
            row = {c: v for c, v in e.items() if c not in ("op", "event_ts")}
            state[k] = row
    return state


def expected_fingerprint(state: dict[tuple[str, str], dict]) -> dict[tuple[str, str], str]:
    return {
        k: hashlib.sha256((v.get("content") or "").encode()).hexdigest()
        for k, v in state.items()
    }
