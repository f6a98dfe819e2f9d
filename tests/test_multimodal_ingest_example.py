"""examples/multimodal_ingest.py — the unified-screen demo runs end
to end on the sf0.001 testdata and its printed counts are internally
consistent: planted text copies and vector clones are rejected, real
incoming docs survive, full-row schema in the lake."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_example_runs_and_rejects_planted_dups(tmp_path):
    out_dir = tmp_path / "acc"
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "examples" / "multimodal_ingest.py"),
            "--input", "/root/testdata/sf0.001",
            "--split-id", "400",
            "--waves", "2",
            "--out", str(out_dir),
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [
        json.loads(ln)
        for ln in proc.stdout.splitlines()
        if ln.startswith("{")
    ]
    waves = [d for d in lines if "batch_id" in d]
    summary = [d for d in lines if "accepted_total" in d][-1]
    assert len(waves) == 2
    for w in waves:
        # each wave carries 2 planted dups (one text copy, one vector
        # clone) that must NOT be accepted
        assert w["n_accepted"] <= w["n_in"] - 2
        assert w["n_accepted"] > 0  # real incoming docs survive
    assert summary["accepted_total"] == sum(
        w["n_accepted"] for w in waves
    )
    assert summary["columns"] == [
        "batch_id", "doc_id", "embedding", "text"
    ]
