"""Batched design serving (llamole_tpu/serve.py).

The reference serves one request at a time through Gradio; TPU serving
needs fixed-shape batching. These tests drive the scheduler end to end
on tiny random models: request grouping, per-request result routing,
padding-row hygiene, error isolation, and the JSONL CLI loop.
"""

import io
import json
import threading

import numpy as np
import pytest

from llamole_tpu.config import DataArguments, FinetuningArguments, ModelArguments
from llamole_tpu.models.composite import GenerationSettings
from llamole_tpu.models.loader import build_graph_lm
from llamole_tpu.serve import DesignServer, properties_vector, serve_jsonl


@pytest.fixture(scope="module")
def tiny_stack():
    model, frozen, trainable, tok = build_graph_lm(
        ModelArguments(model_name_or_path=""), DataArguments(),
        FinetuningArguments(), seed=0)
    return model, frozen, trainable, tok


def test_properties_vector_schema():
    vec = properties_vector({"HIV": 1.0, "SA": 3.0})
    assert vec.shape == (10,)
    assert np.isnan(vec).sum() == 8
    with pytest.raises(ValueError, match="unknown property"):
        properties_vector({"nope": 1.0})


@pytest.mark.slow
def test_server_batches_and_routes_results(tiny_stack):
    model, frozen, trainable, tok = tiny_stack
    gen = GenerationSettings(max_new_tokens=8, do_sample=True)
    server = DesignServer(model, frozen, trainable, tok, batch_size=4,
                          max_wait_s=0.5, gen=gen).start()
    try:
        prompts = [f"Design molecule number {i} please." for i in range(6)]
        handles = [server.submit(p, {"SA": float(i)})
                   for i, p in enumerate(prompts)]
        results = [h.result(timeout=300) for h in handles]
    finally:
        server.stop()
    assert len(results) == 6
    for r in results:
        assert "smiles" in r and "text" in r and "error" not in r
    # 6 requests at batch_size 4 -> first flush groups multiple requests
    assert server.requests_served == 6
    assert server.batches_run < 6, "no batching happened"


@pytest.mark.slow
def test_server_survives_bad_batch(tiny_stack):
    model, frozen, trainable, tok = tiny_stack
    gen = GenerationSettings(max_new_tokens=8, do_sample=True)
    server = DesignServer(model, frozen, trainable, tok, batch_size=2,
                          max_wait_s=0.1, gen=gen).start()
    # sabotage one batch by monkeypatching, then restore
    orig = model.design_molecule
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected failure")
        return orig(*a, **k)

    model.design_molecule = flaky
    try:
        bad = server.submit("first request fails")
        res_bad = bad.result(timeout=300)
        assert res_bad["error"] == "injected failure"
        ok = server.submit("second request works")
        res_ok = ok.result(timeout=300)
        assert "error" not in res_ok
    finally:
        model.design_molecule = orig
        server.stop()


@pytest.mark.slow
def test_serve_jsonl_loop(tiny_stack, tmp_path, monkeypatch):
    """The CLI loop answers every request line with its id echoed."""
    import llamole_tpu.serve as serve_mod

    model, frozen, trainable, tok = tiny_stack

    def fake_build(*a, **k):
        return model, frozen, trainable, tok

    monkeypatch.setattr("llamole_tpu.models.loader.build_graph_lm",
                        fake_build)
    cfg = tmp_path / "serve.yaml"
    cfg.write_text("model_name_or_path: ''\nmax_new_tokens: 8\n"
                   "do_sample: true\n")
    requests = [
        {"prompt": "Design something small.", "property": {"SA": 2.0}},
        {"prompt": "Design something aromatic.", "property": {"HIV": 1.0}},
        {"stats": True},   # ops probe answers inline with counters
    ]
    in_stream = io.StringIO("\n".join(json.dumps(r) for r in requests) + "\n")
    out_stream = io.StringIO()
    serve_jsonl(str(cfg), in_stream=in_stream, out_stream=out_stream)
    lines = [json.loads(l) for l in out_stream.getvalue().splitlines()]
    assert {l["id"] for l in lines} == {0, 1, 2}
    by_id = {l["id"]: l for l in lines}
    for i in (0, 1):
        assert "smiles" in by_id[i] and "text" in by_id[i]
    assert "requests_served" in by_id[2] and "error" not in by_id[2]


@pytest.mark.slow
def test_serve_jsonl_isolates_bad_lines(tiny_stack, tmp_path, monkeypatch):
    """A malformed request line gets an error response; later healthy
    lines still get answered (code-review r3b finding #2)."""
    model, frozen, trainable, tok = tiny_stack
    monkeypatch.setattr("llamole_tpu.models.loader.build_graph_lm",
                        lambda *a, **k: (model, frozen, trainable, tok))
    cfg = tmp_path / "serve.yaml"
    cfg.write_text("model_name_or_path: ''\nmax_new_tokens: 8\n"
                   "do_sample: true\n")
    lines = [
        "this is not json",
        json.dumps({"promt": "typo key"}),
        json.dumps({"prompt": "ok", "property": {"nope": 1.0}}),
        json.dumps({"prompt": "Design something.", "property": {"SA": 2.0}}),
        json.dumps({"prompt": ""}),  # empty prompt must not poison batch
    ]
    out_stream = io.StringIO()
    serve_jsonl(str(cfg), in_stream=io.StringIO("\n".join(lines) + "\n"),
                out_stream=out_stream)
    results = {json.loads(l)["id"]: json.loads(l)
               for l in out_stream.getvalue().splitlines()}
    assert set(results) == {0, 1, 2, 3, 4}
    assert "error" in results[0] and "error" in results[1] \
        and "error" in results[2]
    assert "smiles" in results[3] and "error" not in results[3]
    assert "error" not in results[4]


@pytest.mark.slow
def test_server_retro_requests(tiny_stack):
    """retro=True requests get a route plan attached; the batch's retro
    targets run as one cross-target search. Mixed batches (retro and
    non-retro) route results correctly."""
    model, frozen, trainable, tok = tiny_stack
    gen = GenerationSettings(max_new_tokens=8, do_sample=True)
    server = DesignServer(model, frozen, trainable, tok, batch_size=3,
                          max_wait_s=0.5, gen=gen, retro_iterations=1,
                          retro_max_time=10.0, retro_width=4,
                          retro_topk=2).start()
    try:
        h1 = server.submit("Design and synthesize something.",
                           {"SA": 2.0}, retro=True)
        h2 = server.submit("Design only.", {"SA": 1.0})
        h3 = server.submit("Design and synthesize another.",
                           {"SC": 2.0}, retro=True)
        r1, r2, r3 = (h.result(timeout=600) for h in (h1, h2, h3))
    finally:
        server.stop()
    assert "retro" in r1 and "retro" in r3
    assert "retro" not in r2
    for r in (r1, r3):
        assert isinstance(r["retro"]["success"], bool)
        assert isinstance(r["retro"]["reactions"], list)
        # the whole result must be JSON-serializable for the CLI loop
        json.dumps(r)
