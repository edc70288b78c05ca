"""Merge a partial driver_sim --json output (a --names subset run) into a
full-registry correctness artifact, so newly added queries keep the
committed artifacts name-complete BETWEEN the once-per-round clean full
re-runs (the end-of-round artifact-coherence commit still re-produces
every artifact from one full run at HEAD).

Usage: python scripts/merge_artifact.py PARTIAL.json FULL_ARTIFACT.json
"""

from __future__ import annotations

import json
import sys

partial, full = sys.argv[1], sys.argv[2]
with open(partial) as f:
    p = json.load(f)
with open(full) as f:
    base = json.load(f)
base.update(p)
with open(full, "w") as f:
    json.dump(base, f, indent=2)
print(f"merged {len(p)} rows into {full} ({len(base)} total)")
