"""Converter vs the reference's REAL torch checkpoint key schema
(VERDICT round-1 item 8).

The GraphDiT test instantiates the reference's actual Transformer class
(pure torch — /root/reference/src/model/graph_decoder/transformer.py),
saves its state_dict exactly as the reference does (model.pt), converts
it with scripts/convert_reference_weights.py, and compares our
denoiser's fp32 forward against the torch forward numerically. The
encoder/predictor/connector tests build synthetic state dicts with the
exact key names/shapes their reference classes produce (PyG is not
installed, so those classes cannot be instantiated here) and drive the
full convert -> from_pretrained -> forward path.
"""

import gzip
import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/src/model/graph_decoder"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.convert_reference_weights import (  # noqa: E402
    convert_connectors,
    convert_encoder,
    convert_graphdit,
    convert_predictor,
)
from llamole_tpu.utils.serialization import load_pytree  # noqa: E402


def _load_reference_transformer():
    """Import the reference denoiser modules (read-only study; PyG
    symbols it never calls at forward time are stubbed)."""
    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tgu = types.ModuleType("torch_geometric.utils")
        tgu.to_dense_adj = tgu.to_dense_batch = tgu.remove_self_loops = (
            lambda *a, **k: None)
        tg.utils = tgu
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.utils"] = tgu
    pkg = types.ModuleType("_refgd")
    pkg.__path__ = [REF]
    sys.modules["_refgd"] = pkg

    def load(name):
        spec = importlib.util.spec_from_file_location(
            f"_refgd.{name}", os.path.join(REF, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"_refgd.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    load("layers")
    load("conditions")
    load("diffusion_utils")
    return load("transformer")


TINY = dict(max_n_nodes=8, hidden_size=64, depth=2, num_heads=4,
            Xdim=6, Edim=5, ydim=3, text_dim=16)


def test_graphdit_convert_and_forward_fidelity(tmp_path):
    import jax
    import jax.numpy as jnp

    from llamole_tpu.models.graphdit.config import GraphDiTConfig
    from llamole_tpu.models.graphdit.denoiser import apply_denoiser

    tr = _load_reference_transformer()
    torch.manual_seed(0)
    ref = tr.Transformer(mlp_ratio=2.0, drop_condition=0.0, **TINY)
    ref.eval()

    src = tmp_path / "src"
    src.mkdir()
    torch.save(ref.state_dict(), src / "model.pt")
    dst = tmp_path / "dst"
    convert_graphdit(str(src), str(dst))
    params = load_pytree(str(dst / "model.msgpack"))

    cfg = GraphDiTConfig(
        max_n_nodes=TINY["max_n_nodes"], hidden_size=TINY["hidden_size"],
        depth=TINY["depth"], num_heads=TINY["num_heads"], mlp_ratio=2.0,
        drop_condition=0.0, Xdim=TINY["Xdim"], Edim=TINY["Edim"],
        ydim=TINY["ydim"], text_dim=TINY["text_dim"], diffusion_steps=10)

    rng = np.random.default_rng(0)
    B, N = 3, TINY["max_n_nodes"]
    n_nodes = np.array([8, 5, 3])
    node_mask = np.arange(N)[None, :] < n_nodes[:, None]
    X = rng.normal(size=(B, N, TINY["Xdim"])).astype(np.float32)
    E = rng.normal(size=(B, N, N, TINY["Edim"])).astype(np.float32)
    E = 0.5 * (E + E.transpose(0, 2, 1, 3))
    X[~node_mask] = 0.0
    pair = node_mask[:, :, None] & node_mask[:, None, :]
    E[~pair] = 0.0
    y = rng.normal(size=(B, TINY["ydim"])).astype(np.float32)
    y[0, 1] = np.nan  # NaN channel -> null embedding path
    txt = rng.normal(size=(B, TINY["text_dim"])).astype(np.float32)
    t = np.array([0.1, 0.5, 0.9], np.float32)

    with torch.no_grad():
        out = ref(torch.from_numpy(X), torch.from_numpy(E),
                  torch.from_numpy(node_mask), torch.from_numpy(y),
                  torch.from_numpy(txt), torch.from_numpy(t),
                  unconditioned=False)
    ref_X, ref_E = out.X.numpy(), out.E.numpy()

    ours_X, ours_E = apply_denoiser(
        params, cfg, jnp.asarray(X), jnp.asarray(E), jnp.asarray(node_mask),
        jnp.asarray(y), jnp.asarray(txt), jnp.asarray(t), train=False)
    ours_X, ours_E = np.asarray(ours_X), np.asarray(ours_E)

    assert ref_X.shape == ours_X.shape and ref_E.shape == ours_E.shape
    np.testing.assert_allclose(ours_X, ref_X, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(ours_E, ref_E, atol=2e-4, rtol=2e-4)


def _lin_sd(prefix, in_dim, out_dim, bias=True, gen=None):
    sd = {f"{prefix}.weight": torch.from_numpy(
        gen.normal(size=(out_dim, in_dim)).astype(np.float32))}
    if bias:
        sd[f"{prefix}.bias"] = torch.from_numpy(
            gen.normal(size=(out_dim,)).astype(np.float32))
    return sd


def _ln_sd(prefix, dim, gen):
    """nn.LayerNorm(dim) state dict: 1-D weight + bias."""
    return {
        f"{prefix}.weight": torch.from_numpy(
            gen.normal(size=(dim,)).astype(np.float32)),
        f"{prefix}.bias": torch.from_numpy(
            gen.normal(size=(dim,)).astype(np.float32)),
    }


def _gin_trunk_sd(gen, n_layers, h, norms_affine):
    """Exact GNNEncoder/GNNRetrosynthsizer trunk key layout
    (graph_encoder/model.py:86-165, graph_predictor/model.py:230-278)."""
    sd = {
        "atom_encoder.weight": torch.from_numpy(
            gen.normal(size=(118, h)).astype(np.float32)),
        "virtualnode_embedding.weight": torch.zeros(1, h),
    }
    for i in range(n_layers):
        sd.update(_lin_sd(f"convs.{i}.mlp.0", h, 4 * h, gen=gen))
        sd.update(_ln_sd(f"convs.{i}.mlp.1", 4 * h, gen))
        sd.update(_lin_sd(f"convs.{i}.mlp.4", 4 * h, h, gen=gen))
        sd[f"convs.{i}.eps"] = torch.zeros(1)
        sd[f"convs.{i}.bond_encoder.weight"] = torch.from_numpy(
            gen.normal(size=(5, h)).astype(np.float32))
        if norms_affine:
            sd.update(_ln_sd(f"norms.{i}", h, gen))
        if i < n_layers - 1:
            sd.update(_lin_sd(f"mlp_virtualnode_list.{i}.0", h, 4 * h, gen=gen))
            sd.update(_ln_sd(f"mlp_virtualnode_list.{i}.1", 4 * h, gen))
            sd.update(_lin_sd(f"mlp_virtualnode_list.{i}.4", 4 * h, h, gen=gen))
    return sd


def test_encoder_schema_roundtrip(tmp_path):
    import jax.numpy as jnp

    from llamole_tpu.models.graphclip.model import GraphCLIP

    gen = np.random.default_rng(1)
    h, L = 32, 3
    src = tmp_path / "src"
    src.mkdir()
    torch.save(_gin_trunk_sd(gen, L, h, norms_affine=True), src / "model.pt")
    proj = {}
    proj.update(_lin_sd("fc1", h, h, gen=gen))
    proj.update(_ln_sd("norm1", h, gen))
    proj.update(_lin_sd("fc2", h, h, gen=gen))
    torch.save(proj, src / "model_proj.pt")
    with open(src / "model_config.json", "w") as f:
        json.dump({"graph_num_layer": L, "graph_hidden_size": h}, f)

    dst = tmp_path / "dst"
    convert_encoder(str(src), str(dst))
    model, params = GraphCLIP.from_pretrained(str(dst))
    assert model.cfg.num_layer == L and model.cfg.hidden_size == h

    atoms = jnp.asarray([[5, 6, 7, 0]])          # C, N, O + pad
    edges = jnp.zeros((1, 4, 4), jnp.int32).at[0, 0, 1].set(1).at[0, 1, 0].set(1)
    mask = jnp.asarray([[True, True, True, False]])
    emb = model(params, atoms, edges, mask)
    assert emb.shape == (1, h)
    assert np.isfinite(np.asarray(emb)).all()
    np.testing.assert_allclose(float(jnp.linalg.norm(emb[0])), 1.0, atol=1e-4)


def test_predictor_schema_roundtrip(tmp_path):
    import jax.numpy as jnp

    from llamole_tpu.models.retro.model import GraphPredictor

    gen = np.random.default_rng(2)
    h, L, tdim, n_task = 32, 3, 24, 7
    sd = _gin_trunk_sd(gen, L, h, norms_affine=False)
    sd["text_dropping.weight"] = torch.from_numpy(
        gen.normal(size=(1, tdim)).astype(np.float32))
    for i in range(L):
        sd.update(_lin_sd(f"adapters.{i}.1", tdim, 3 * h, gen=gen))
    sd.update(_lin_sd("decoder.0", h, 4 * h, gen=gen))
    sd.update(_ln_sd("decoder.1", 4 * h, gen))
    sd.update(_lin_sd("decoder.4", 4 * h, n_task, gen=gen))
    src = tmp_path / "src"
    src.mkdir()
    torch.save(sd, src / "model.pt")
    # a reference cost_model.pt must make conversion REFUSE (RDKit Morgan
    # features are incompatible with the first-party hash — see
    # tests/test_cost_mlp.py for the full story)
    cost = {}
    cost.update(_lin_sd("layers.0", 64, 16, gen=gen))
    torch.save(cost, src / "cost_model.pt")
    with open(src / "model_config.json", "w") as f:
        json.dump({"num_layer": L, "hidden_size": h, "num_task": n_task,
                   "text_input_size": tdim}, f)
    with gzip.open(src / "label_to_template.csv.gz", "wt") as f:
        f.write("rule_label,retro_templates\n0,[C:1]-[OH;D1:2]>>[C:1]=[O:2]\n")

    dst = tmp_path / "dst"
    with pytest.raises(SystemExit, match="REFUSING"):
        convert_predictor(str(src), str(dst))
    # refusal must fire BEFORE any writes — no half-converted dst dir
    assert not dst.exists()
    (src / "cost_model.pt").unlink()
    convert_predictor(str(src), str(dst))
    model, params = GraphPredictor.from_pretrained(str(dst))
    assert model.cfg.out_dim == n_task and model.cfg.text_input_size == tdim
    assert model.label_to_template[0].startswith("[C:1]")

    atoms = jnp.asarray([[5, 7, 0]])
    edges = jnp.zeros((1, 3, 3), jnp.int32).at[0, 0, 1].set(1).at[0, 1, 0].set(1)
    mask = jnp.asarray([[True, True, False]])
    txt = jnp.zeros((1, tdim))
    logits = model(params, atoms, edges, mask, txt)
    assert logits.shape == (1, n_task)
    assert np.isfinite(np.asarray(logits)).all()
    assert not os.path.exists(dst / "cost_model.msgpack")


def test_connectors_schema_roundtrip(tmp_path):
    gen = np.random.default_rng(3)
    src = tmp_path / "src"
    src.mkdir()
    # reference: nn.Sequential(Linear, SiLU) saved per connector
    # (modeling_llamole.py:205-222, 489-500)
    torch.save(_lin_sd("0", 300, 2048, gen=gen), src / "graph_to_lm_connector.pt")
    torch.save(_lin_sd("0", 2048, 768, gen=gen), src / "lm_to_graph_decoder.pt")
    torch.save(_lin_sd("0", 2048, 768, gen=gen), src / "lm_to_graph_predictor.pt")
    dst = tmp_path / "dst"
    convert_connectors(str(src), str(dst))
    for name, shape in (("graph_to_lm", (300, 2048)),
                        ("lm_to_graph_decoder", (2048, 768)),
                        ("lm_to_graph_predictor", (2048, 768))):
        p = load_pytree(str(dst / "connector" / f"{name}.msgpack"))
        assert p["w"].shape == shape
        assert p["b"].shape == (shape[1],)
