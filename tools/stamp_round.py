"""Re-stamp GATE_FINGERPRINTS.json for an archived round against the tree
the driver actually evaluated.

Usage (one process per round; merge with tools/merge_stamps.py):

    git worktree add /tmp/fp_rN <round-N archive commit>
    python tools/stamp_round.py /tmp/fp_rN CORRECTNESS_r0N.json > /tmp/stN.json
    git worktree remove /tmp/fp_rN

Needed after bumping gate_fingerprints.ALGO_VERSION (old stamps are
dropped on version mismatch, which re-fronts everything until
regenerated). The fingerprint ALGORITHM always comes from the CURRENT
repo; the fingerprinted CODE comes from the worktree."""

import importlib.util
import json
import os
import sys

worktree = os.path.abspath(sys.argv[1])
rec_name = sys.argv[2]
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# current algorithm, loaded by explicit path (old trees may lack the file)
spec = importlib.util.spec_from_file_location(
    "gate_fingerprints", os.path.join(repo, "gate_fingerprints.py")
)
gfp = importlib.util.module_from_spec(spec)
sys.modules["gate_fingerprints"] = gfp
spec.loader.exec_module(gfp)

# the worktree's entry module + its scipi_spark
sys.path.insert(0, worktree)
os.chdir(worktree)
import __spark_entry__ as em  # noqa: E402

entries = em.queries()
oracles = em.oracle_sql()
# rec_name may be absolute (the archive file usually lives in the MAIN
# repo, not the worktree: the driver's verdict commit adds it on top of
# the evaluated snapshot) — os.path.join yields it unchanged then
rows = json.load(open(os.path.join(worktree, rec_name)))
fps = gfp.entry_fingerprints(
    {n: f for n, f in entries.items() if n in rows}, oracles
)
json.dump({os.path.basename(rec_name): fps}, sys.stdout)
