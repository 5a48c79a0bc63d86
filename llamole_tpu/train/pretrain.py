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
  * GraphCLIP — symmetric InfoNCE between the GIN graph tower and a
    first-party hashed bag-of-words text tower over each record's
    natural-language description (the reference ships
    Llamole-Pretrained-GraphEncoder, loader.py:269, with no training
    code; CLIP-style alignment is what the name implies)

All run on TPU or CPU, save in the framework's pretrained layout, and
are deliberately simple single-host loops (scale-out via the same mesh
machinery as mmsft when needed).
"""

import json
import os
import random
import re
import zlib
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
    available: Optional[List[str]] = None,
) -> Dict[str, float]:
    """Train the retro template classifier on (product, label) pairs.
    Labels are remapped to a dense range; the mapping ships in
    label_to_template so sample_templates stays consistent. `available`
    (building-block inventory SMILES) rides the checkpoint as
    available.csv.gz — the planner's starting_mols, mirroring the
    reference's bundled inventory (loader.py:279-284)."""
    from ..models.retro import GraphPredictor, GraphPredictorConfig

    # corpus sidecars (data/synthetic.write_corpus layout) wire the CLI
    # path with no extra flags: <base>.templates.json is the
    # label->template map, <base>.inventory.json the purchasable leaves
    base = os.path.splitext(corpus_path)[0]
    if label_to_template is None and os.path.exists(base + ".templates.json"):
        with open(base + ".templates.json") as f:
            label_to_template = {int(k): v for k, v in json.load(f).items()}
        logger.info("predictor: %d templates from corpus sidecar",
                    len(label_to_template))
    if available is None and os.path.exists(base + ".inventory.json"):
        with open(base + ".inventory.json") as f:
            available = json.load(f)
        logger.info("predictor: %d-block inventory from corpus sidecar",
                    len(available))

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
    model = GraphPredictor(cfg, label_to_template=l2t, available=available)
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


def pretrain_property_oracle(
    corpus_path: str,
    output_dir: str,
    *,
    num_layer: int = 3,
    hidden_size: int = 128,
    batch_size: int = 32,
    steps: int = 300,
    learning_rate: float = 1e-3,
    seed: int = 0,
) -> Dict[str, float]:
    """Train the first-party property oracle (models/oracle.py) on the
    corpus' molecule/property labels: BCE on the binary channels
    (BBBP/HIV/BACE), MSE on standardized continuous channels. The saved
    artifact plugs into eval via ModelArguments.property_oracle_path so
    the summary reports per-channel property fidelity of generated
    molecules — the offline analog of the paper's external oracles
    (arXiv 2410.04223 §5)."""
    from ..models.oracle import (
        CONTINUOUS_CHANNELS,
        PropertyOracle,
        PropertyOracleConfig,
    )

    records = _load_corpus(corpus_path)
    rows = _molecule_rows(records)
    rows = [(g, p) for g, p in rows
            if np.any(p > float(NO_LABEL_INDEX) + 1.0)]
    if not rows:
        raise ValueError("no property-labeled molecules in corpus")
    n = max(g.n_nodes for g, _ in rows)
    n = ((n + 7) // 8) * 8

    # continuous-channel standardization from observed labels
    y_mean = np.zeros(len(MOL_PROPERTIES), np.float32)
    y_std = np.ones(len(MOL_PROPERTIES), np.float32)
    labels = np.stack([p for _, p in rows])
    for c in CONTINUOUS_CHANNELS:
        vals = labels[:, c][labels[:, c] > float(NO_LABEL_INDEX) + 1.0]
        # standardize only channels with enough coverage to estimate a
        # stable scale; a 1-sample channel with the raw 1e-3 floor makes
        # z explode for every OTHER value of that channel at eval time
        if vals.size >= 8:
            y_mean[c] = float(vals.mean())
            y_std[c] = float(max(vals.std(), 0.05))

    model = PropertyOracle(PropertyOracleConfig(
        num_layer=num_layer, hidden_size=hidden_size))
    params = model.init(jax.random.PRNGKey(seed), y_mean=y_mean, y_std=y_std)
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, atoms, edges, mask, targets):
        loss, grads = jax.value_and_grad(
            lambda p: model.loss(p, atoms, edges, mask, targets))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    shuffler = random.Random(seed)
    losses = []
    for step in range(steps):
        batch = [rows[shuffler.randrange(len(rows))]
                 for _ in range(min(batch_size, len(rows)))]
        padded = pad_graph_batch([g for g, _ in batch], n)
        targets = jnp.asarray(np.stack([p for _, p in batch]))
        params, opt_state, loss = step_fn(
            params, opt_state,
            jnp.asarray(padded["atom_types"]),
            jnp.asarray(padded["edge_classes"]),
            jnp.asarray(padded["node_mask"]), targets)
        losses.append(float(loss))
        if (step + 1) % max(steps // 10, 1) == 0:
            logger.info("oracle pretrain step %d/%d loss %.4f",
                        step + 1, steps, np.mean(losses[-20:]))

    model.save_pretrained(params, output_dir)
    metrics = {"final_loss": float(np.mean(losses[-20:])),
               "first_loss": float(np.mean(losses[:20]))}
    logger.info("property-oracle pretraining done: %s", metrics)
    return metrics


# -- GraphCLIP contrastive pretraining ----------------------------------

_MOL_SPAN_RE = re.compile(r"<mol_start>.*?<mol_end>", re.DOTALL)
_SPECIAL_TOKEN_RE = re.compile(r"<[a-z_]+>")
_WORD_RE = re.compile(r"[a-z0-9]+")


def hash_text_features(texts: List[str], dim: int) -> np.ndarray:
    """[len(texts), dim] L2-normalized hashed bag-of-words features
    (lowercased unigrams + bigrams, stable crc32 hashing — Python's
    builtin hash() is salted per process and would break persisted
    towers). The first-party text tower for GraphCLIP pretraining and
    molecule retrieval."""
    out = np.zeros((len(texts), dim), np.float32)
    for i, text in enumerate(texts):
        words = _WORD_RE.findall(text.lower())
        grams = words + [f"{a}_{b}" for a, b in zip(words, words[1:])]
        for g in grams:
            out[i, zlib.crc32(g.encode()) % dim] += 1.0
    norm = np.linalg.norm(out, axis=-1, keepdims=True)
    return out / np.clip(norm, 1e-12, None)


def apply_text_tower(text_params: Dict, feats: jnp.ndarray) -> jnp.ndarray:
    """Hashed BoW features -> unit-norm embeddings in the graph-tower
    space (fc -> GELU -> fc, mirroring the graph projection head)."""
    from ..ops.nn import dense
    x = dense(text_params["fc1"], feats)
    x = jax.nn.gelu(x, approximate=False)
    x = dense(text_params["fc2"], x)
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return x / jnp.clip(norm, 1e-12, None)


def _smiles_like(token: str) -> bool:
    """Heuristic for raw SMILES/reaction tokens in prose (outside
    <mol_start> spans — MolQA reaction strings and reactant lists).
    A reaction arrow is decisive; otherwise the token must parse AND
    contain non-lowercase syntax (ring digits, brackets, uppercase,
    bond symbols) — valid multi-atom SMILES essentially always do,
    while plain lowercase English words never carry such characters,
    so words that happen to parse ('cons') are kept."""
    from ..chem.smiles import canonical_smiles

    if ">>" in token:
        return True
    if token.islower() and token.isalpha():
        return False
    return canonical_smiles(token) is not None


def _strip_molecule_text(text: str) -> str:
    """Drop SMILES spans, special tokens, and free-standing SMILES
    tokens so only natural language reaches the text tower."""
    text = _SPECIAL_TOKEN_RE.sub(" ", _MOL_SPAN_RE.sub(" ", text))
    kept = []
    for tok in text.split():
        bare = tok.strip(".,:;!?()")
        if bare and _smiles_like(bare):
            continue
        kept.append(tok)
    return " ".join(kept)


def _clip_rows(records) -> List[Tuple[GraphSample, str]]:
    """(graph, description) per record: the designed molecule paired
    with the record's surrounding text. SMILES spans, special tokens,
    and raw SMILES/reaction tokens in the prose are stripped so the
    text tower sees natural language only (a molecule-identifying token
    would be a degenerate retrieval shortcut). The molecule re-spells
    through its canonical form at ingest (CLAUDE.md boundary rule);
    rows are deduped by canonical spelling so in-batch negatives are
    true negatives."""
    from ..chem.smiles import canonical_smiles

    rows: List[Tuple[GraphSample, str]] = []
    seen = set()
    for rec in records:
        out = rec.get("output", "")
        smiles = extract_all_smiles(out)
        if not smiles:
            continue
        can = canonical_smiles(smiles[0])
        if can is None or can in seen:
            continue
        g = smiles_to_graph(can)
        if g is None:
            continue
        seen.add(can)
        text = " ".join(filter(None, [rec.get("instruction", ""),
                                      rec.get("input", ""), out]))
        rows.append((g, _strip_molecule_text(text)))
    return rows


def pretrain_graphclip(
    corpus_path: str,
    output_dir: str,
    *,
    num_layer: int = 5,
    hidden_size: int = 300,
    text_hash_dim: int = 4096,
    batch_size: int = 16,
    steps: int = 300,
    learning_rate: float = 1e-3,
    seed: int = 0,
) -> Dict[str, float]:
    """Contrastive graph<->text pretraining for the GraphCLIP encoder.

    Symmetric InfoNCE with in-batch negatives and a learnable
    temperature (CLIP recipe) between the GIN graph tower and a hashed
    bag-of-words text tower over each record's description. The graph
    tower saves in the standard pretrained layout (graph_encoder_path
    points at output_dir); the text tower + hash config save alongside
    (text_tower.msgpack / clip_config.json) so the artifact doubles as
    a text->molecule retrieval index.

    The reference ships this module pretrained
    (Llamole-Pretrained-GraphEncoder; loader.py:269) with no training
    code; architecture parity is graph_encoder/model.py:23-205."""
    from ..models.graphclip.model import GraphCLIP, GraphCLIPConfig
    from ..ops.nn import dense_init
    from ..utils.serialization import save_pytree

    records = _load_corpus(corpus_path)
    rows = _clip_rows(records)
    if len(rows) < 2:
        raise ValueError("need >= 2 distinct molecules for contrastive "
                         "pretraining")
    batch_size = min(batch_size, len(rows))
    n = max(g.n_nodes for g, _ in rows)
    n = ((n + 7) // 8) * 8

    cfg = GraphCLIPConfig(num_layer=num_layer, hidden_size=hidden_size)
    model = GraphCLIP(cfg)
    k_graph, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
    params = {
        "graph": model.init(k_graph),
        "text": {
            "fc1": dense_init(k1, text_hash_dim, hidden_size),
            "fc2": dense_init(k2, hidden_size, hidden_size),
        },
        # CLIP init: log(1/0.07)
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
    }
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, atoms, edges, mask, txt_feats):
        def lf(p):
            g = model(p["graph"], atoms, edges, mask).astype(jnp.float32)
            t = apply_text_tower(p["text"], txt_feats).astype(jnp.float32)
            scale = jnp.exp(jnp.clip(p["logit_scale"], None, np.log(100.0)))
            logits = scale * g @ t.T
            labels = jnp.arange(logits.shape[0])
            loss_g = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            loss_t = optax.softmax_cross_entropy_with_integer_labels(
                logits.T, labels).mean()
            acc = (jnp.argmax(logits, -1) == labels).mean()
            return (loss_g + loss_t) / 2.0, acc
        (loss, acc), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    # precompute text features once (host-side, cheap)
    feats_all = hash_text_features([t for _, t in rows], text_hash_dim)
    shuffler = random.Random(seed)
    order: List[int] = []
    losses, accs = [], []
    for step in range(steps):
        # epoch-shuffled walk -> every in-batch pair is a distinct
        # molecule (random.sample per step would still guarantee it,
        # but the walk also covers the corpus evenly)
        if len(order) < batch_size:
            fresh = list(range(len(rows)))
            shuffler.shuffle(fresh)
            order = fresh
        idx = [order.pop() for _ in range(batch_size)]
        padded = pad_graph_batch([rows[i][0] for i in idx], n)
        params, opt_state, loss, acc = step_fn(
            params, opt_state,
            jnp.asarray(padded["atom_types"]),
            jnp.asarray(padded["edge_classes"]),
            jnp.asarray(padded["node_mask"]),
            jnp.asarray(feats_all[idx]))
        losses.append(float(loss))
        accs.append(float(acc))
        if (step + 1) % max(steps // 10, 1) == 0:
            logger.info("graphclip pretrain step %d/%d loss %.4f acc %.3f",
                        step + 1, steps, np.mean(losses[-20:]),
                        np.mean(accs[-20:]))

    model.save_pretrained(params["graph"], output_dir)
    save_pytree({"text": params["text"],
                 "logit_scale": params["logit_scale"]},
                os.path.join(output_dir, "text_tower.msgpack"))
    with open(os.path.join(output_dir, "clip_config.json"), "w") as f:
        json.dump({"text_hash_dim": text_hash_dim,
                   "hash_scheme": "crc32-word12gram-v1"}, f, indent=2)
    metrics = {"final_loss": float(np.mean(losses[-20:])),
               "first_loss": float(np.mean(losses[:20])),
               "final_batch_retrieval_acc": float(np.mean(accs[-20:]))}
    logger.info("graphclip pretraining done: %s", metrics)
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
