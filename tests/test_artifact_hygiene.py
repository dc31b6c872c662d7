"""Notes-vs-artifacts hygiene (VERDICT r4 #10).

Round-4's work log claimed REF_PARITY_HARD.json was committed when it was
not — the parity gate silently skipped and the repo asserted evidence it did
not carry. This test makes that class of drift impossible to miss: every
repo-root artifact filename named in a ROUND*_NOTES.md work log must exist
in the tree.

Scope: uppercase-leading .json/.md names (the repo-root artifact convention:
SYNTH_EVAL.json, REF_PARITY*.json, WHOLE_SCENE_BENCH.json, ...). Lowercase
names (e.g. hard_stats.json, a per-scene-dir sidecar) are out of scope — they
are not repo-root artifacts.
"""

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_ARTIFACT_RE = re.compile(r"\b([A-Z][A-Za-z0-9_]*\.(?:json|md))\b")


def test_every_artifact_named_in_round_notes_exists():
    notes = sorted(glob.glob(os.path.join(REPO, "ROUND*_NOTES.md")))
    assert notes, "no ROUND*_NOTES.md work logs found"
    missing = []
    for path in notes:
        with open(path) as fh:
            text = fh.read()
        for name in sorted(set(_ARTIFACT_RE.findall(text))):
            if not os.path.exists(os.path.join(REPO, name)):
                missing.append(f"{os.path.basename(path)} -> {name}")
    assert not missing, (
        "work logs name artifacts that are not in the tree: "
        + ", ".join(missing)
    )
