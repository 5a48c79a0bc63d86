"""Graph-module pretraining workflows.

The reference ships its graph modules pretrained on HF
(Llamole-Pretrained-{GraphDiT,GNNPredictor,GraphEncoder}; loader.py:
226-331 auto-downloads) and includes no training code for them. These
workflows make the framework self-sufficient: given a MolQA-format
corpus they train

  * GraphDiT — denoising CE over noised molecule graphs, property
    conditioning from the records, text conditioning dropped (NaN ->
    the learned null embedding), exactly the unconditional-capable
    regime CFG sampling needs
  * GraphPredictor — reaction-template classification on (product
    graph, label) pairs extracted from the records' retro annotations

Both run on TPU or CPU, save in the framework's pretrained layout, and
are deliberately simple single-host loops (scale-out via the same mesh
machinery as mmsft when needed).
"""

import json
import random
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..chem.featurize import GraphSample, pad_graph_batch, smiles_to_graph
from ..data.aligner import extract_all_smiles, extract_retro_products
from ..utils.constants import MOL_PROPERTIES, NO_LABEL_INDEX
from ..utils.logging import get_logger

logger = get_logger(__name__)


def _load_corpus(path: str) -> List[Dict[str, Any]]:
    with open(path) as f:
        return json.load(f)


def _molecule_rows(records) -> List[Tuple[GraphSample, np.ndarray]]:
    """(graph, property vector) per designed molecule."""
    rows = []
    for rec in records:
        smiles = extract_all_smiles(rec.get("output", ""))
        if not smiles:
            continue
        g = smiles_to_graph(smiles[0])
        if g is None:
            continue
        props = np.full(10, float(NO_LABEL_INDEX), np.float32)
        for i, name in enumerate(MOL_PROPERTIES):
            if name in (rec.get("property") or {}):
                props[i] = float(rec["property"][name])
        rows.append((g, props))
    return rows


def _retro_rows(records) -> List[Tuple[GraphSample, int]]:
    """(product graph, template label) per labeled retro step."""
    rows = []
    for rec in records:
        products = extract_retro_products(rec.get("output", ""))
        labels = rec.get("retro") or []
        for smi, lab in zip(products, labels):
            if lab is None:
                continue
            g = smiles_to_graph(smi)
            if g is not None:
                rows.append((g, int(lab)))
    return rows


def pretrain_graphdit(
    corpus_path: str,
    output_dir: str,
    *,
    hidden_size: int = 256,
    depth: int = 6,
    num_heads: int = 8,
    diffusion_steps: int = 100,
    batch_size: int = 32,
    steps: int = 500,
    learning_rate: float = 2e-4,
    seed: int = 0,
    max_n_nodes: Optional[int] = None,
) -> Dict[str, float]:
    """Train a GraphDiT from scratch on a MolQA corpus; saves the
    framework's pretrained layout (model.msgpack + model_config.yaml +
    data.meta.json) so graph_decoder_path can point at output_dir."""
    from ..models.graphdit import GraphDiT, GraphDiTConfig
    from ..models.graphdit.config import build_data_info_from_smiles

    records = _load_corpus(corpus_path)
    all_smiles = sorted({s for rec in records
                         for s in extract_all_smiles(rec.get("output", ""))})
    info = build_data_info_from_smiles(all_smiles, max_n_nodes=max_n_nodes)
    cfg = GraphDiTConfig(hidden_size=hidden_size, depth=depth,
                         num_heads=num_heads, diffusion_steps=diffusion_steps,
                         guide_scale=2.0)
    model = GraphDiT(cfg, info)
    params = model.init(jax.random.PRNGKey(seed))

    rows = _molecule_rows(records)
    if not rows:
        raise ValueError("no trainable molecules in corpus")
    n = cfg.max_n_nodes

    tx = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, max(steps // 20, 1), steps))
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, rng, atoms, edges, mask, props, txt):
        def lf(p):
            return model.loss(p, rng, atoms, edges, mask, props, txt,
                              train=True)
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(seed)
    shuffler = random.Random(seed)
    losses = []
    for step in range(steps):
        batch = [rows[shuffler.randrange(len(rows))]
                 for _ in range(batch_size)]
        padded = pad_graph_batch([g for g, _ in batch], n)
        props = jnp.asarray(np.stack([p for _, p in batch]))
        txt = jnp.full((batch_size, cfg.text_dim), jnp.nan, jnp.float32)
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step_fn(
            params, opt_state, sub,
            jnp.asarray(padded["atom_types"]),
            jnp.asarray(padded["edge_classes"]),
            jnp.asarray(padded["node_mask"]), props, txt)
        losses.append(float(loss))
        if (step + 1) % max(steps // 10, 1) == 0:
            logger.info("graphdit pretrain step %d/%d loss %.4f",
                        step + 1, steps, np.mean(losses[-20:]))

    model.save_pretrained(params, output_dir)
    metrics = {"final_loss": float(np.mean(losses[-20:])),
               "first_loss": float(np.mean(losses[:20]))}
    logger.info("graphdit pretraining done: %s", metrics)
    return metrics


def pretrain_predictor(
    corpus_path: str,
    output_dir: str,
    *,
    hidden_size: int = 128,
    num_layer: int = 3,
    batch_size: int = 32,
    steps: int = 300,
    learning_rate: float = 1e-3,
    seed: int = 0,
    label_to_template: Optional[Dict[int, str]] = None,
) -> Dict[str, float]:
    """Train the retro template classifier on (product, label) pairs.
    Labels are remapped to a dense range; the mapping ships in
    label_to_template so sample_templates stays consistent."""
    from ..models.retro import GraphPredictor, GraphPredictorConfig

    records = _load_corpus(corpus_path)
    rows = _retro_rows(records)
    if not rows:
        raise ValueError("no labeled retro steps in corpus")
    raw_labels = sorted({lab for _, lab in rows})
    remap = {lab: i for i, lab in enumerate(raw_labels)}
    rows = [(g, remap[lab]) for g, lab in rows]
    out_dim = len(raw_labels)
    n = max(g.n_nodes for g, _ in rows)
    n = ((n + 7) // 8) * 8

    cfg = GraphPredictorConfig(num_layer=num_layer, hidden_size=hidden_size,
                               out_dim=out_dim)
    l2t = {remap[lab]: (label_to_template or {}).get(lab, "")
           for lab in raw_labels}
    model = GraphPredictor(cfg, label_to_template=l2t)
    params = model.init(jax.random.PRNGKey(seed))
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, atoms, edges, mask, labels):
        def lf(p):
            logits = model(p, atoms, edges, mask, None)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return -jnp.take_along_axis(logp, labels[:, None], 1).mean()
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    shuffler = random.Random(seed)
    losses = []
    for step in range(steps):
        batch = [rows[shuffler.randrange(len(rows))]
                 for _ in range(batch_size)]
        padded = pad_graph_batch([g for g, _ in batch], n)
        labels = jnp.asarray([lab for _, lab in batch], jnp.int32)
        params, opt_state, loss = step_fn(
            params, opt_state,
            jnp.asarray(padded["atom_types"]),
            jnp.asarray(padded["edge_classes"]),
            jnp.asarray(padded["node_mask"]), labels)
        losses.append(float(loss))
        if (step + 1) % max(steps // 10, 1) == 0:
            logger.info("predictor pretrain step %d/%d loss %.4f",
                        step + 1, steps, np.mean(losses[-20:]))

    model.save_pretrained(params, output_dir)
    metrics = {"final_loss": float(np.mean(losses[-20:])),
               "first_loss": float(np.mean(losses[:20]))}
    logger.info("predictor pretraining done: %s", metrics)
    return metrics


_AVAILABLE_RE = re.compile(r"([^\s,:]+) \(available\)")


def _cost_rows(records) -> List[Tuple[str, float]]:
    """(smiles, cost) pairs. Explicit {"smiles", "cost"} records pass
    through; MolQA records contribute (molecule at retro step k,
    remaining route length n-k) for every step product — the Retro*
    value-model target (cost-to-go in steps) — plus terminal reactants
    at cost 0 when marked '(available)' (the zero anchors the regressor
    needs so in-stock leaves don't inherit the min observed step cost)."""
    rows: List[Tuple[str, float]] = []
    for rec in records:
        if "smiles" in rec and "cost" in rec:
            rows.append((str(rec["smiles"]), float(rec["cost"])))
            continue
        out = rec.get("output", "")
        products = extract_retro_products(out)
        n = len(products)
        for k, smi in enumerate(products):
            rows.append((smi, float(n - k)))
        for smi in _AVAILABLE_RE.findall(out):
            rows.append((smi, 0.0))
    return rows


def pretrain_cost_mlp(
    corpus_path: str,
    output_dir: str,
    *,
    n_layers: int = 1,
    fp_dim: int = 2048,
    latent_dim: int = 128,
    batch_size: int = 64,
    steps: int = 200,
    learning_rate: float = 1e-3,
    seed: int = 0,
) -> Dict[str, float]:
    """Train the fingerprint->synthesis-cost regressor on THIS package's
    Morgan bits (chem/fingerprint.py) and save it with the
    COST_FEATURE_SCHEME provenance marker.

    The reference ships a pretrained CostMLP consuming RDKit Morgan bits
    (graph_predictor/model.py:356-391); those weights are
    feature-incompatible here (the converter refuses them), so the cost
    model must be (re)trained against first-party features. Corpus: JSON
    list of {"smiles": ..., "cost": float} records and/or MolQA records
    (cost-to-go in route steps, see _cost_rows)."""
    from ..chem.fingerprint import morgan_fingerprint
    from ..models.retro import CostMLP

    records = _load_corpus(corpus_path)
    pairs = _cost_rows(records)
    X, y = [], []
    for s, c in pairs:
        fp = morgan_fingerprint(s, radius=2, n_bits=fp_dim)
        if fp is not None:
            X.append(np.asarray(fp, np.float32))
            y.append(c)
    if not X:
        raise ValueError("no featurizable (smiles, cost) pairs in corpus")
    X = jnp.asarray(np.stack(X))
    y = jnp.asarray(np.asarray(y, np.float32))

    model = CostMLP(n_layers=n_layers, fp_dim=fp_dim, latent_dim=latent_dim)
    params = model.init(jax.random.PRNGKey(seed))
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, xb, yb):
        def lf(p):
            pred = model(p, xb).reshape(-1).astype(jnp.float32)
            return jnp.mean((pred - yb) ** 2)
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    shuffler = random.Random(seed)
    n = X.shape[0]
    losses = []
    for step in range(steps):
        idx = jnp.asarray([shuffler.randrange(n)
                           for _ in range(min(batch_size, n))], jnp.int32)
        params, opt_state, loss = step_fn(params, opt_state, X[idx], y[idx])
        losses.append(float(loss))
        if (step + 1) % max(steps // 10, 1) == 0:
            logger.info("cost-mlp pretrain step %d/%d loss %.4f",
                        step + 1, steps, np.mean(losses[-20:]))

    model.save_pretrained(params, output_dir)
    metrics = {"final_loss": float(np.mean(losses[-20:])),
               "first_loss": float(np.mean(losses[:20]))}
    logger.info("cost-mlp pretraining done: %s", metrics)
    return metrics
