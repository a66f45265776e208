"""Merge per-round stamp JSONs (tools/stamp_round.py output) into
GATE_FINGERPRINTS.json with the current ALGO_VERSION header."""

import json
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import gate_fingerprints as gfp  # noqa: E402

merged = {"_algo": gfp.ALGO_VERSION}
for p in sys.argv[1:]:
    merged.update(json.load(open(p)))
out = os.path.join(repo, "GATE_FINGERPRINTS.json")
json.dump(merged, open(out, "w"), indent=1, sort_keys=True)
print({k: (v if k == "_algo" else len(v)) for k, v in merged.items()})
