"""No-gradio UI fallback (webui/server.py): the stdlib HTTP surface must
serve the single page and drive a real design+retro request through the
composite stack, landing an SVG depiction in the response (reference UI:
launch.py:116-238 renders with gradio + RDKit Draw; this is the
dependency-free counterpart)."""

import json
import threading
import urllib.request

import pytest

from llamole_tpu.webui.server import DesignUIServer


@pytest.fixture(scope="module")
def server():
    srv = DesignUIServer({
        "model_name_or_path": "",
        "dataset": "molqa_drug_examples",
        "dataset_dir": "data",
        "template": "default",
        "cutoff_len": 96,
        "learned_query_size": 4,
        "do_train": False,
        "output_dir": "",
        "max_new_tokens": 6,
        "temperature": 0.6,
        "top_p": 0.9,
    }, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _get(srv, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}{path}", timeout=60) as r:
        return r.status, r.read().decode()


def _post(srv, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, json.loads(r.read())


@pytest.mark.slow
def test_page_and_health(server):
    status, page = _get(server, "/")
    assert status == 200
    assert "<form" in page and "Instruction" in page
    for prop in ("BBBP", "CO2", "SA"):
        assert prop in page
    status, body = _get(server, "/health")
    assert status == 200 and json.loads(body)["ok"]


@pytest.mark.slow
def test_design_request_lands_svg(server):
    """Drive design+retro end to end over HTTP. Random tiny weights
    produce an invalid molecule some seeds; sweep a few — each valid
    one must come back with an inline SVG depiction."""
    got_svg = False
    for seed in range(8):
        status, out = _post(server, "/api/design", {
            "instruction": "Design a small ester with low SA.",
            "properties": {"SA": 2.0, "SC": 2.0},
            "seed": seed,
        })
        assert status == 200
        assert set(out) >= {"smiles", "valid", "text_html",
                            "reactions_html", "mol_svg", "route_svg",
                            "route_found"}
        if out["valid"]:
            assert out["mol_svg"].startswith("<svg"), out["mol_svg"][:80]
            got_svg = True
            break
    assert got_svg, "no valid molecule in 8 seeds (tiny-random regression?)"


@pytest.mark.slow
def test_bad_request_isolated(server):
    """A failing request must return a JSON error, not kill the server."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/api/unknown",
        data=b"{}", headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 404
    assert raised
    status, _ = _get(server, "/health")
    assert status == 200
