"""EVAL artifact schema: every finalized experiment artifact from round 5
on (EVAL_r15+) must carry a self-contained `verdict` sentence written by
its aggregator from explicit numeric criteria (VERDICT r04 task 4 — the
calls must live in the artifact, not only in PERF.md prose), so a later
round cannot re-litigate a settled question.

An artifact is "finalized" once its aggregator ran (it has an
`experiment` field); in-flight sweep state (bare `runs`/arm dicts written
by a resumable driver mid-queue) is exempt until finalized.
"""
import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VERDICT_FROM_ROUND = 15

ARTIFACTS = sorted(glob.glob(os.path.join(REPO, "EVAL_r*.json")))


@pytest.mark.parametrize("path", ARTIFACTS, ids=os.path.basename)
def test_eval_artifact_parses_and_has_verdict(path):
    with open(path) as f:
        raw = f.read()
    doc = json.loads(raw)  # every artifact must be valid JSON
    assert isinstance(doc, dict)

    m = re.match(r"EVAL_r(\d+)", os.path.basename(path))
    round_no = int(m.group(1))
    finalized = "experiment" in doc
    if round_no >= VERDICT_FROM_ROUND and finalized:
        assert isinstance(doc.get("verdict"), str) and doc["verdict"].strip(), (
            f"{os.path.basename(path)}: finalized artifact is missing its "
            f"verdict sentence (aggregators must emit one — VERDICT r04 "
            f"task 4)")


def test_artifacts_exist():
    assert ARTIFACTS, "no EVAL artifacts found at repo root"
