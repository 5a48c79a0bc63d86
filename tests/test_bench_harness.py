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


def test_serve_oom_retries_same_slots_then_halves(monkeypatch):
    """Serve-mode OOM policy: attempt 1 re-execs the SAME slot count
    (the config is known-safe; the OOM is transient reaping), attempt 2
    halves it, attempt 3 raises."""
    import argparse

    captured = {}

    def fake_execve(exe, argv, env):
        captured["argv"] = argv
        captured["env"] = env
        raise SystemExit(0)

    def boom(args):
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend")

    monkeypatch.setattr(os, "execve", fake_execve)
    monkeypatch.setattr(bench, "_teardown_jax_client", lambda: None)
    monkeypatch.setattr(bench, "_bench_serve_run", boom)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--mode", "serve"])
    args = argparse.Namespace(batch=None, tiny=False, kv8=False)

    # attempt 1: same slots (8), tries -> 1
    monkeypatch.delenv("LLAMOLE_SERVE_OOM_TRIES", raising=False)
    try:
        bench.bench_serve(args)
    except SystemExit:
        pass
    assert captured["argv"][1:] == ["bench.py", "--mode", "serve",
                                    "--batch", "8"]
    assert captured["env"]["LLAMOLE_SERVE_OOM_TRIES"] == "1"
    assert captured["env"]["LLAMOLE_OOM_REEXEC_SLEEP"] == "45"

    # attempt 2: halve (8 -> 4), tries -> 2
    monkeypatch.setenv("LLAMOLE_SERVE_OOM_TRIES", "1")
    args.batch = 8
    try:
        bench.bench_serve(args)
    except SystemExit:
        pass
    assert captured["argv"][-2:] == ["--batch", "4"]
    assert captured["env"]["LLAMOLE_SERVE_OOM_TRIES"] == "2"

    # attempt 3: give up — the OOM propagates
    monkeypatch.setenv("LLAMOLE_SERVE_OOM_TRIES", "2")
    args.batch = 4
    try:
        bench.bench_serve(args)
        raise AssertionError("expected the OOM to propagate")
    except RuntimeError as e:
        assert "RESOURCE_EXHAUSTED" in str(e)

    # non-OOM errors never re-exec
    monkeypatch.delenv("LLAMOLE_SERVE_OOM_TRIES", raising=False)
    monkeypatch.setattr(
        bench, "_bench_serve_run",
        lambda a: (_ for _ in ()).throw(ValueError("shape mismatch")))
    try:
        bench.bench_serve(args)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


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
