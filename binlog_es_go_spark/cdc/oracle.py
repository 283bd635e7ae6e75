"""Sequential pure-Python oracle: the ground truth for replay convergence.

Applies the changelog one event at a time in total order
``(offset, seq_in_tx)`` with last-writer-wins per ``(repo, path)`` — the
semantics the reference gets for free from binlog total order
(``pkg/realtime/loop.go:177-236``). Every distributed run (single batch,
K micro-batches, restarted, duplicated delivery) must converge to this
state, checked by per-row ``sha256(content)`` and an order-insensitive
whole-table digest.
"""

from __future__ import annotations

import hashlib

import pandas as pd


def apply_sequential(changelog: pd.DataFrame) -> pd.DataFrame:
    """Apply events in (offset, seq_in_tx) order; return final visible state."""
    ev = changelog.sort_values(["offset", "seq_in_tx"], kind="mergesort")
    state: dict[tuple[str, str], dict] = {}
    applied_offset: dict[tuple[str, str], tuple[int, int]] = {}
    for row in ev.itertuples(index=False):
        key = (row.repo, row.path)
        pos = (int(row.offset), int(row.seq_in_tx))
        # duplicates (same offset re-delivered) must be no-ops
        if key in applied_offset and pos <= applied_offset[key]:
            continue
        applied_offset[key] = pos
        if row.op == "delete":
            state.pop(key, None)
        else:
            after = row.after
            if isinstance(after, dict):
                payload = dict(after)
            else:  # Row / namedtuple-ish
                payload = after.asDict() if hasattr(after, "asDict") else dict(after._asdict())
            payload["last_offset"] = int(row.offset)
            state[key] = payload
    rows = [{"repo": k[0], "path": k[1], **v} for k, v in state.items()]
    if not rows:
        return pd.DataFrame(columns=["repo", "path", "commit", "lang", "content", "last_offset"])
    return pd.DataFrame(rows).sort_values(["repo", "path"]).reset_index(drop=True)


def content_sha256(df: pd.DataFrame, content_col: str = "content") -> pd.Series:
    return df[content_col].map(
        lambda s: hashlib.sha256(s.encode("utf-8")).hexdigest() if isinstance(s, str) else None
    )


def table_digest(df: pd.DataFrame, key_cols=("repo", "path"), content_col: str = "content") -> str:
    """Order-insensitive digest: sha256 of the sorted per-row hashes."""
    per_row = [
        hashlib.sha256(
            ("|".join(str(r[k]) for k in key_cols) + "|" + str(r[content_col])).encode("utf-8")
        ).hexdigest()
        for _, r in df.iterrows()
    ]
    return hashlib.sha256("".join(sorted(per_row)).encode("ascii")).hexdigest()
