"""ttasr.cli.warmup — census-driven pre-compilation (VERDICT r4 #1)."""

import json
import subprocess
import sys

import numpy as np  # noqa: F401  (conftest pins the CPU backend)


def test_warmup_dry_run_lists_census():
    out = subprocess.run(
        [sys.executable, "-m", "ttasr.cli.warmup", "--dry-run",
         "--slots", "8"],
        capture_output=True, text=True, timeout=120, check=True)
    lines = [json.loads(x) for x in out.stdout.splitlines()
             if x.startswith("{")]
    fams = {l["family"] for l in lines}
    assert fams == {"encoder", "beam_decode", "greedy_decode"}
    # the streaming beams cover every (window, budget) bucket pair
    stream_keys = {tuple(l["key"]) for l in lines
                   if l["family"] == "beam_decode" and len(l["key"]) == 5}
    assert (8, 32, 81920, 48, "beam5") in stream_keys
    assert (8, 32, 480000, 224, "beam5") in stream_keys


def test_warmup_executes_micro_census():
    """A minimal real warmup on the CPU backend: file-api only, micro
    model — proves every census family has a working driver (the
    encoder/decode entries execute through the real engine)."""
    out = subprocess.run(
        [sys.executable, "-m", "ttasr.cli.warmup", "--model", "micro-test",
         "--compute", "float32", "--slots", "2", "--beam", "2",
         "--streams", "off", "--cpu"],
        capture_output=True, text=True, timeout=900, check=True)
    lines = [json.loads(x) for x in out.stdout.splitlines()
             if x.startswith("{")]
    done = [l for l in lines if "s" in l and "family" in l]
    skipped = [l for l in lines if "skipped" in l]
    total = [l for l in lines if "warmup_total_s" in l]
    assert not skipped, skipped
    assert total and total[0]["programs"] == len(done)
    assert {l["family"] for l in done} == {"encoder", "beam_decode",
                                           "greedy_decode"}
