"""Weight converter tests: fabricate torch state dicts with the
reference's key layout, convert, and run a forward pass through our
models (validates name mapping + shapes end to end)."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
import convert_reference_weights as conv  # noqa: E402


def _linear(out_dim, in_dim, bias=True):
    d = {"weight": torch.randn(out_dim, in_dim)}
    if bias:
        d["bias"] = torch.randn(out_dim)
    return d


def _flat(prefix, d):
    return {f"{prefix}.{k}": v for k, v in d.items()}


def test_graphdit_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from llamole_tpu.models.graphdit import DataInfo, GraphDiT, GraphDiTConfig
    from llamole_tpu.models.graphdit.config import build_data_info_from_smiles
    from llamole_tpu.utils.serialization import load_pytree

    info = build_data_info_from_smiles(
        ["CCO", "c1ccccc1", "CC(=O)O", "CCN"], max_n_nodes=8)
    cfg = GraphDiTConfig(hidden_size=32, depth=2, num_heads=4,
                         diffusion_steps=5, text_dim=16, ydim=10)
    model = GraphDiT(cfg, info)
    dx = cfg.Xdim
    n, h, de = cfg.max_n_nodes, 32, 5
    in_dim = dx + n * de

    sd = {}
    sd["x_embedder.0.weight"] = torch.randn(h, in_dim)
    sd.update(_flat("x_embedder.1", {"weight": torch.randn(h),
                                     "bias": torch.randn(h)}))
    sd.update(_flat("t_embedder.mlp.0", _linear(h, 256)))
    sd.update(_flat("t_embedder.mlp.2", _linear(h, h)))
    sd["y_embedder.embedding_drop.weight"] = torch.randn(10, h)
    for d in range(10):
        sd.update(_flat(f"y_embedder.mlps.{d}.0", _linear(h, 1)))
        sd.update(_flat(f"y_embedder.mlps.{d}.2", _linear(h, h, bias=False)))
    sd["txt_embedder.embedding_drop.weight"] = torch.randn(1, h)
    sd.update(_flat("txt_embedder.linear", _linear(h, 16)))
    for i in range(2):
        sd.update(_flat(f"blocks.{i}.attn.qkv", _linear(3 * h, h, bias=False)))
        dh = h // 4
        sd.update(_flat(f"blocks.{i}.attn.q_norm",
                        {"weight": torch.randn(dh), "bias": torch.randn(dh)}))
        sd.update(_flat(f"blocks.{i}.attn.k_norm",
                        {"weight": torch.randn(dh), "bias": torch.randn(dh)}))
        sd.update(_flat(f"blocks.{i}.attn.proj", _linear(h, h)))
        sd.update(_flat(f"blocks.{i}.mlp.fc1", _linear(4 * h, h)))
        sd.update(_flat(f"blocks.{i}.mlp.fc2", _linear(h, 4 * h)))
        sd.update(_flat(f"blocks.{i}.adaLN_modulation.0", _linear(h, h)))
        sd.update(_flat(f"blocks.{i}.adaLN_modulation.2", _linear(6 * h, h)))
    final = in_dim
    sd.update(_flat("output_layer.xedecoder.fc1", _linear(h, h)))
    sd.update(_flat("output_layer.xedecoder.fc2", _linear(final, h)))
    sd.update(_flat("output_layer.adaLN_modulation.0", _linear(h, h)))
    sd.update(_flat("output_layer.adaLN_modulation.2", _linear(2 * final, h)))

    src = tmp_path / "src"
    src.mkdir()
    torch.save(sd, src / "model.pt")
    dst = tmp_path / "dst"
    conv.convert_graphdit(str(src), str(dst))

    params = load_pytree(str(dst / "model.msgpack"))
    # forward runs with the converted tree
    from llamole_tpu.models.graphdit.denoiser import apply_denoiser
    b = 2
    X = jnp.zeros((b, n, dx)).at[:, :, 0].set(1.0)
    E = jnp.zeros((b, n, n, de)).at[:, :, :, 0].set(1.0)
    mask = jnp.ones((b, n), bool)
    lX, lE = apply_denoiser(params, cfg, X, E, mask,
                            jnp.zeros((b, 10)), jnp.zeros((b, 16)),
                            jnp.full((b,), 0.5))
    assert lX.shape == (b, n, dx) and lE.shape == (b, n, n, de)
    assert np.isfinite(np.asarray(lX)).all()


def test_encoder_and_predictor_roundtrip(tmp_path):
    import jax.numpy as jnp
    from llamole_tpu.models.graphclip import GraphCLIP, GraphCLIPConfig
    from llamole_tpu.models.retro import GraphPredictor, GraphPredictorConfig
    from llamole_tpu.utils.serialization import load_pytree

    h, L = 24, 2

    def gin_sd(with_adapters=False, text=16, out=None):
        sd = {"atom_encoder.weight": torch.randn(118, h),
              "virtualnode_embedding.weight": torch.zeros(1, h)}
        for i in range(L):
            sd[f"convs.{i}.eps"] = torch.zeros(1)
            sd[f"convs.{i}.bond_encoder.weight"] = torch.randn(5, h)
            sd.update(_flat(f"convs.{i}.mlp.0", _linear(4 * h, h)))
            sd.update(_flat(f"convs.{i}.mlp.1", {"weight": torch.randn(4 * h),
                                                 "bias": torch.randn(4 * h)}))
            sd.update(_flat(f"convs.{i}.mlp.4", _linear(h, 4 * h)))
            if with_adapters:
                sd.update(_flat(f"adapters.{i}.1", _linear(3 * h, text)))
            else:
                sd.update(_flat(f"norms.{i}", {"weight": torch.randn(h),
                                               "bias": torch.randn(h)}))
            if i < L - 1:
                sd.update(_flat(f"mlp_virtualnode_list.{i}.0", _linear(4 * h, h)))
                sd.update(_flat(f"mlp_virtualnode_list.{i}.1",
                                {"weight": torch.randn(4 * h),
                                 "bias": torch.randn(4 * h)}))
                sd.update(_flat(f"mlp_virtualnode_list.{i}.4", _linear(h, 4 * h)))
        if with_adapters:
            sd["text_dropping.weight"] = torch.randn(1, text)
            sd.update(_flat("decoder.0", _linear(4 * h, h)))
            sd.update(_flat("decoder.1", {"weight": torch.randn(4 * h),
                                          "bias": torch.randn(4 * h)}))
            sd.update(_flat("decoder.4", _linear(out, 4 * h)))
        return sd

    # encoder
    src = tmp_path / "enc"
    src.mkdir()
    torch.save(gin_sd(), src / "model.pt")
    proj = {}
    proj.update(_flat("fc1", _linear(h, h)))
    proj.update(_flat("norm1", {"weight": torch.randn(h), "bias": torch.randn(h)}))
    proj.update(_flat("fc2", _linear(h, h)))
    torch.save(proj, src / "model_proj.pt")
    dst = tmp_path / "enc_out"
    conv.convert_encoder(str(src), str(dst))
    params = load_pytree(str(dst / "model.msgpack"))
    model = GraphCLIP(GraphCLIPConfig(num_layer=L, hidden_size=h))
    atoms = jnp.zeros((1, 6), jnp.int32)
    edges = jnp.zeros((1, 6, 6), jnp.int32)
    mask = jnp.ones((1, 6), bool)
    emb = model(params, atoms, edges, mask)
    assert emb.shape == (1, h)

    # predictor
    src2 = tmp_path / "pred"
    src2.mkdir()
    torch.save(gin_sd(with_adapters=True, text=16, out=7), src2 / "model.pt")
    dst2 = tmp_path / "pred_out"
    conv.convert_predictor(str(src2), str(dst2))
    p2 = load_pytree(str(dst2 / "model.msgpack"))
    pm = GraphPredictor(GraphPredictorConfig(
        num_layer=L, hidden_size=h, out_dim=7, text_input_size=16))
    logits = pm(p2, atoms, edges, mask, jnp.zeros((1, 16)))
    assert logits.shape == (1, 7)


def test_connectors_roundtrip(tmp_path):
    from llamole_tpu.utils.serialization import load_pytree
    src = tmp_path / "conn"
    src.mkdir()
    for name, (o, i) in {
        "graph_to_lm_connector.pt": (64, 24),
        "lm_to_graph_decoder.pt": (16, 64),
        "lm_to_graph_predictor.pt": (16, 64),
    }.items():
        torch.save(_flat("0", _linear(o, i)), src / name)
    dst = tmp_path / "out"
    conv.convert_connectors(str(src), str(dst))
    p = load_pytree(str(dst / "connector" / "graph_to_lm.msgpack"))
    assert p["w"].shape == (24, 64)
