"""The gate's archive-invalidation fingerprints must be deterministic
(same code → same fp across processes and hash seeds) and sensitive to
the code an entry actually reaches."""

from __future__ import annotations

import gate_fingerprints as gfp
import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_fingerprints_cover_every_entry_and_are_deterministic():
    a = gfp.entry_fingerprints(QUERIES, ORACLES)
    b = gfp.entry_fingerprints(QUERIES, ORACLES)
    assert a == b
    assert set(a) == set(QUERIES)
    assert "unfingerprintable" not in a.values(), [
        k for k, v in a.items() if v == "unfingerprintable"
    ]


def test_stable_repr_sorts_sets():
    # set repr order is hash-randomized across processes; the stable
    # variant must not be
    assert gfp._stable_repr({"b", "a", "c"}) == gfp._stable_repr({"c", "a", "b"})
    assert gfp._stable_repr(frozenset({1, 2})) == gfp._stable_repr({2, 1})


def test_stable_repr_rejects_address_reprs():
    class Opaque:
        pass

    assert gfp._stable_repr(Opaque()).startswith("unstable:")


def test_fingerprint_reaches_cross_module_code():
    """p1_p5_ingest_oag never names functions/text.py, but reaches
    validate_str through ingest.validate_publications — the reachable
    source set must include it (the round-3 staleness gap)."""
    src = gfp.reachable_sources(QUERIES["p1_p5_ingest_oag"])
    assert "def validate_str" in src
    assert "_poisoned_oag_raw" in src  # entry-module helper closure


def test_oracle_sql_changes_fingerprint():
    a = gfp.entry_fingerprints(QUERIES, ORACLES)
    o2 = dict(ORACLES)
    o2["tpch_q1"] = o2["tpch_q1"] + " -- changed"
    b = gfp.entry_fingerprints(QUERIES, o2)
    assert a["tpch_q1"] != b["tpch_q1"]
    assert a["tpch_q3"] == b["tpch_q3"]


def test_stamps_file_matches_algo_version():
    import json
    from pathlib import Path

    p = Path(__file__).resolve().parent.parent / "GATE_FINGERPRINTS.json"
    stamps = json.load(p.open())
    assert stamps.get("_algo") == gfp.ALGO_VERSION, (
        "GATE_FINGERPRINTS.json was stamped by a different fingerprint "
        "algorithm — regenerate against the archived trees "
        "(tools/stamp_round.py)"
    )
