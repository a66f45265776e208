"""Report which gate entries are FRESH (fingerprint differs from every
archived stamp) — i.e. what the next driver window will re-evaluate.

Run after ANY operator edit: the count must stay <= 50 (the driver
window) or some entries lose their driver-proven status for a round.

Usage: python tools/refront_report.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fresh_entries() -> list[str]:
    """fresh = not driver-proven = exactly the complement of the gate's
    own ``archived_green_entries`` (stamp matches AND the archived row was
    GREEN). Delegating — instead of re-implementing the membership test —
    keeps this report from diverging from the gate: the old local version
    counted a stamp from a round whose row FAILED as not-fresh, while the
    gate correctly re-fronted the entry (round-6 advice)."""
    import __spark_entry__ as E

    q = E.queries()
    o = E.oracle_sql()
    archived = E.archived_green_entries(q, o)
    return [k for k in q if k not in archived]


if __name__ == "__main__":
    fresh = fresh_entries()
    print(f"fresh (next-window) entries: {len(fresh)} / 50 slots")
    for k in fresh:
        print(" ", k)
    if len(fresh) > 50:
        print("WARNING: window overflow — some entries stay unproven a round")
