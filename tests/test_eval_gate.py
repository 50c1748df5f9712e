"""The weights-gated accuracy driver (eval.py at the repo root).

The gate must (a) self-skip with exit code 2 + machine-readable JSON when
reference checkpoints are absent — so CI can wire it unconditionally and it
activates the day weights appear — and (b) run the full driver path
(annotation load → engine → metric JSON) on synthetic weights in tiny mode.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVAL = os.path.join(REPO, "eval.py")


def _run(args, timeout=900):
    # GVLLM_FORCE_CPU: the subprocess must not depend on the TPU tunnel —
    # the suite is CPU-hermetic (conftest's in-process config doesn't reach
    # subprocesses, and a backend outage would fail the gate test)
    env = dict(os.environ, GVLLM_FORCE_CPU="1")
    return subprocess.run([sys.executable, EVAL] + args, capture_output=True,
                          text=True, timeout=timeout, cwd=REPO, env=env)


def test_gate_skips_without_weights(tmp_path):
    anno = tmp_path / "a.json"
    anno.write_text("[]")
    r = _run(["--anno_path", str(anno), "--ckpt_path", "/nonexistent.pth"])
    assert r.returncode == 2, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["status"] == "skipped"
    assert "ckpt_path" in out["required"]


def test_charades_sta_parser(tmp_path):
    anno = tmp_path / "charades_sta_test.txt"
    anno.write_text("AO8RW 0.0 6.9##a person puts a book away.\n"
                    "XYZ12 2.5 10.0##someone opens a door\n")
    sys.path.insert(0, REPO)
    import importlib

    ev = importlib.import_module("eval")
    items = ev.load_annotations(str(anno), "charades_sta")
    assert items == [
        {"video": "AO8RW.mp4", "query": "a person puts a book away.",
         "start": 0.0, "end": 6.9},
        {"video": "XYZ12.mp4", "query": "someone opens a door",
         "start": 2.5, "end": 10.0},
    ]


def test_gate_runs_tiny_on_synthetic_weights(tmp_path, demo_video):
    anno = tmp_path / "a.json"
    anno.write_text(json.dumps([
        {"video": os.path.basename(demo_video), "query": "a car drives",
         "start": 1.0, "end": 5.0}]))
    out_path = tmp_path / "metrics.json"
    r = _run(["--anno_path", str(anno), "--benchmark", "grounding",
              "--video_root", os.path.dirname(demo_video),
              "--allow_random_weights", "--debug_tiny", "--max_items", "1",
              "--max_new_tokens", "3", "--out", str(out_path)])
    assert r.returncode == 0, r.stderr[-2000:]
    result = json.loads(r.stdout.strip().splitlines()[-1])
    assert result["benchmark"] == "grounding"
    assert result["quantize"] == "bf16"
    assert set(result["metrics"]) == {"R1@0.3", "R1@0.5", "R1@0.7", "mIoU"}
    assert json.load(open(out_path)) == result
