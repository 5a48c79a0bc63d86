"""CLI dispatcher: pretrain subcommand parsing + kwarg typing (the
device-touching workflows themselves are covered by their own tests)."""

import importlib.util
import sys

import pytest


def _load_main():
    spec = importlib.util.spec_from_file_location("main_cli", "main.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pretrain_dispatch_and_kwarg_typing(monkeypatch):
    main = _load_main()
    calls = {}

    def fake(corpus, outdir, **kw):
        calls.update(corpus=corpus, outdir=outdir, **kw)
        return {"final_loss": 0.0}

    import llamole_tpu.train.pretrain as pt
    for name in ("pretrain_graphdit", "pretrain_predictor",
                 "pretrain_cost_mlp", "pretrain_graphclip",
                 "pretrain_property_oracle"):
        monkeypatch.setattr(pt, name, fake)

    main.run_pretrain(["oracle", "corpus.json", "out/",
                       "steps=40", "learning_rate=2e-3",
                       "hidden_size=32"])
    assert calls["corpus"] == "corpus.json" and calls["outdir"] == "out/"
    assert calls["steps"] == 40 and isinstance(calls["steps"], int)
    assert calls["learning_rate"] == pytest.approx(2e-3)
    assert calls["hidden_size"] == 32


def test_pretrain_dispatch_rejects_bad_usage():
    main = _load_main()
    with pytest.raises(SystemExit, match="usage"):
        main.run_pretrain(["nope", "c.json", "out/"])
    with pytest.raises(SystemExit, match="usage"):
        main.run_pretrain(["oracle"])
    with pytest.raises(SystemExit, match="key=value"):
        main.run_pretrain(["oracle", "c.json", "out/", "steps40"])


def test_serving_knobs_parse_from_config(tmp_path):
    from llamole_tpu.config import get_infer_args

    cfg = tmp_path / "serve.yaml"
    cfg.write_text(
        "model_name_or_path: ''\n"
        "continuous_batching: true\n"
        "serve_batch_size: 4\n"
        "serve_chunk_steps: 16\n"
        "serve_cache_len: 512\n"
        "serve_max_wait_s: 0.2\n"
        "shared_prefix_text: 'You are a chemist.'\n")
    *_rest, ga = get_infer_args(str(cfg))
    assert ga.continuous_batching and ga.serve_batch_size == 4
    assert ga.serve_chunk_steps == 16 and ga.serve_cache_len == 512
    assert ga.serve_max_wait_s == 0.2
    assert ga.shared_prefix_text == "You are a chemist."


def test_unknown_command_exits(monkeypatch):
    main = _load_main()
    monkeypatch.setattr(sys, "argv", ["main.py", "frobnicate"])
    with pytest.raises(SystemExit, match="unknown command"):
        main.main()
