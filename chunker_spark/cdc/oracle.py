"""Single-threaded replay referee (FIXTURES.md §D).

Applies a change-event stream in strict ``seq`` order to a plain dict
and reports the final table state. The engine's distributed replay must
equal this oracle exactly (T4); the oracle itself is anchored to the
reference via the kernel golden vectors, so equality here transitively
pins the engine to the reference repository's semantics.
"""

from __future__ import annotations

import hashlib
from typing import Iterable


def _canonical(ev: dict) -> dict:
    ver = ev["schema_ver"]
    return {
        "repo": ev["repo"],
        "path": ev["path"],
        "commit": ev["commit"],
        "language": ev["language"] if ver >= 3 else ev["lang"],
        "branch": ev["branch"] if ver >= 2 else "main",
        "content": ev["content"],
    }


def replay(events: Iterable[dict]) -> dict[tuple[str, str], dict]:
    """Final state keyed by (repo, path) after applying all events in
    seq order (insert/update replace the whole row; delete removes)."""
    state: dict[tuple[str, str], dict] = {}
    for ev in sorted(events, key=lambda e: e["seq"]):
        key = (ev["repo"], ev["path"])
        if ev["op"] == "D":
            state.pop(key, None)
        else:
            state[key] = _canonical(ev)
    return state


def state_rows(state: dict[tuple[str, str], dict]) -> list[dict]:
    """Comparable row set: canonical fields + the content sha256
    invariant (content itself is not compared byte-wise — its sha256
    is, per BASELINE.json input_hint)."""
    rows = []
    for row in state.values():
        sha = hashlib.sha256(row["content"].encode("utf-8")).hexdigest()
        rows.append(
            {
                "repo": row["repo"],
                "path": row["path"],
                "commit": row["commit"],
                "language": row["language"],
                "branch": row["branch"],
                "content_sha256": sha,
            }
        )
    return sorted(rows, key=lambda r: (r["repo"], r["path"]))


def state_digest(rows: list[dict]) -> str:
    """One sha256 over the sorted canonical rows — the 'final-state
    sha256 match' scalar reported by the bench runs."""
    h = hashlib.sha256()
    for r in rows:
        h.update(
            "|".join(
                str(r[c]) for c in ("repo", "path", "commit", "language", "branch", "content_sha256")
            ).encode()
        )
        h.update(b"\n")
    return h.hexdigest()
