"""Driver-contract pieces of bench.py that must not regress silently:
the OOM classifier and the re-exec ladder's argv surgery (a wrong argv
would loop the driver's headline run forever or drop its --mode)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


def test_is_oom_classifier():
    assert bench._is_oom(RuntimeError("RESOURCE_EXHAUSTED: TPU backend"))
    assert bench._is_oom(RuntimeError("Ran out of memory in memory space"))
    assert not bench._is_oom(ValueError("shape mismatch"))


def test_reexec_argv_replaces_batch(monkeypatch):
    captured = {}

    def fake_execve(exe, argv, env):
        captured["exe"] = exe
        captured["argv"] = argv
        captured["env"] = env
        raise SystemExit(0)  # execve never returns; emulate process swap

    monkeypatch.setattr(os, "execve", fake_execve)
    # never clear live backends inside the test process
    monkeypatch.setattr(bench, "_teardown_jax_client", lambda: None)
    monkeypatch.setattr(
        sys, "argv", ["bench.py", "--mode", "molqa", "--batch", "64"])
    try:
        bench._reexec_at_batch(32)
    except SystemExit:
        pass
    assert captured["exe"] == sys.executable
    argv = captured["argv"]
    assert argv[0] == sys.executable
    # --mode preserved, old --batch pair removed, new one appended
    assert argv[1:] == ["bench.py", "--mode", "molqa", "--batch", "32"]
    # the reap-delay handshake rides the child env, NOT the live one
    assert captured["env"]["LLAMOLE_OOM_REEXEC_SLEEP"] == "45"
    assert "LLAMOLE_OOM_REEXEC_SLEEP" not in os.environ


def test_reexec_argv_appends_batch_when_absent(monkeypatch):
    captured = {}

    def fake_execve(exe, argv, env):
        captured["argv"] = argv
        raise SystemExit(0)

    monkeypatch.setattr(os, "execve", fake_execve)
    monkeypatch.setattr(bench, "_teardown_jax_client", lambda: None)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    try:
        bench._reexec_at_batch(64)
    except SystemExit:
        pass
    assert captured["argv"][1:] == ["bench.py", "--batch", "64"]
