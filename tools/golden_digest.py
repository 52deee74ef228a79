"""The ONE digest scheme for checked-in golden parquet files.

Shared by tools/make_dataops_goldens.py (prints digests at generation
time) and tests/test_entry.py (pins them), so the printed and pinned
values are always comparable — previously the two used different
row-serialization schemes and could never match.
"""

from __future__ import annotations

import hashlib


def golden_digest(rows: list[dict]) -> str:
    """16-hex-char sha256 over the order-insensitive row multiset.

    ``rows`` is ``pyarrow.Table.to_pylist()`` / list-of-dicts shaped.
    """
    h = hashlib.sha256()
    for r in sorted(repr(sorted(d.items())) for d in rows):
        h.update(r.encode())
    return h.hexdigest()[:16]
