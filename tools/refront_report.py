"""Report which gate entries are FRESH (fingerprint differs from every
archived stamp) — i.e. what the next driver window will re-evaluate.

Run after ANY operator edit: the count must stay <= 50 (the driver
window) or some entries lose their driver-proven status for a round.

Usage: python tools/refront_report.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fresh_entries() -> list[str]:
    """fresh = fingerprint differs from every archived stamp (a revert
    to an older round's code is NOT fresh — membership against the set
    of all rounds' stamps, not just the latest)."""
    import __spark_entry__ as E
    import gate_fingerprints as GF

    q = E.queries()
    o = E.oracle_sql()
    fps = GF.entry_fingerprints(q, o)
    stamped: dict[str, set[str]] = {}
    fp_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "GATE_FINGERPRINTS.json",
    )
    try:
        stamps = json.load(open(fp_path))
    except FileNotFoundError:
        stamps = {}
    for rnd, m in stamps.items():
        if rnd.startswith("CORRECTNESS"):
            for name, fp in m.items():
                stamped.setdefault(name, set()).add(fp)
    return [k for k in q if fps.get(k) not in stamped.get(k, set())]


if __name__ == "__main__":
    fresh = fresh_entries()
    print(f"fresh (next-window) entries: {len(fresh)} / 50 slots")
    for k in fresh:
        print(" ", k)
    if len(fresh) > 50:
        print("WARNING: window overflow — some entries stay unproven a round")
