"""Rehearsal for the learned-weights operating point (VERDICT r4 #1):
scripts/train_tiny_stack.py must run corpus -> 5 pretrains -> mmsft ->
two-phase eval end to end at smoke sizes and leave a complete
OPERATING_POINT.json. The full-size chip run is the same command minus
--tiny; this keeps the one-command reproduction path green.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "train_tiny_stack.py")


@pytest.mark.slow
def test_tiny_stack_end_to_end(tmp_path):
    stack = str(tmp_path / "stack")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-u", SCRIPT, "--tiny", "--stack-dir", stack],
        capture_output=True, text=True, timeout=1500, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    with open(os.path.join(stack, "OPERATING_POINT.json")) as f:
        report = json.load(f)
    stages = report["stages"]
    for stage in ("corpus", "graphdit", "predictor", "cost_mlp",
                  "graphclip", "oracle", "llm_config", "mmsft", "eval"):
        assert stage in stages, f"stage {stage} missing from report"

    # every trained artifact in place, wired the way build_graph_lm loads
    assert os.path.exists(os.path.join(stack, "graphdit", "model.msgpack"))
    assert os.path.exists(os.path.join(stack, "predictor", "model.msgpack"))
    assert os.path.exists(
        os.path.join(stack, "predictor", "available.csv.gz")), \
        "inventory must ride the predictor checkpoint (planner stock)"
    assert os.path.exists(
        os.path.join(stack, "predictor", "cost_model.msgpack")), \
        "cost model rides the predictor dir (build_graph_lm discovery)"
    assert os.path.exists(os.path.join(stack, "mmsft", "llm.msgpack")), \
        "full finetuning exports the whole LLM"
    assert os.path.exists(
        os.path.join(stack, "mmsft", "connector", "graph_to_lm.msgpack"))

    # the eval stage produced the reference-protocol summary
    ev = stages["eval"]
    assert ev["planning_wall"] == "per_molecule"
    assert 0.0 <= ev["validity"] <= 1.0
    assert "retro_success" in ev and "molecules_per_min" in ev
    # mmsft actually learned (loss finite and recorded)
    assert stages["mmsft"]["train_loss"] == stages["mmsft"]["train_loss"]


def test_resolve_adapter_dir_checkpoint_fallback(tmp_path):
    """Eval must be able to ride the newest committed checkpoint-N when
    the mmsft run died before its final save (bit twice in r5)."""
    from llamole_tpu.models.loader import resolve_adapter_dir

    final = tmp_path / "final"
    (final / "connector").mkdir(parents=True)
    assert resolve_adapter_dir(str(final)) == str(final)

    died = tmp_path / "died"
    for step, committed in ((250, True), (500, True), (750, False)):
        ck = died / f"checkpoint-{step}"
        (ck / "connector").mkdir(parents=True)
        if committed:
            (ck / "trainer_state.json").write_text(
                json.dumps({"backend": "msgpack"}))
            (ck / "trainable.msgpack").write_bytes(b"x")
    # 750 never committed its trainer payload: 500 must win
    assert resolve_adapter_dir(str(died)).endswith("checkpoint-500")

    with pytest.raises(FileNotFoundError):
        resolve_adapter_dir(str(tmp_path / "empty"))
