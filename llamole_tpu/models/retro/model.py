"""Retro predictor: text-conditioned GIN classifying reaction templates,
plus the fingerprint cost MLP.

Parity with the reference GraphPredictor/GNNRetrosynthsizer/CostMLP
(graph_predictor/model.py:34-423): per-layer AdaLN text conditioning
(SiLU -> Linear(text,3H) -> shift/scale/gate), non-affine layer norms,
virtual-node feedback, add-pool + MLP decoder over num_task template
labels; CostMLP = Linear(2048,128) -> ReLU -> Linear(128,1) -> softplus.

Template application itself (rdchiral in the reference) lives in
chem/reaction.py; sample_templates here only produces the label
distribution — the composite model marries the two.
"""

import gzip
import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.gin import gin_conv_apply, gin_conv_init, masked_add_pool, masked_max_pool
from ...ops.nn import dense, dense_init, embedding_init, layer_norm, layer_norm_init


@dataclass
class GraphPredictorConfig:
    num_layer: int = 5
    hidden_size: int = 300
    drop_ratio: float = 0.0
    out_dim: int = 100          # number of reaction-template labels
    text_input_size: int = 768


class GraphPredictor:
    def __init__(self, cfg: GraphPredictorConfig,
                 label_to_template: Optional[Dict[int, str]] = None,
                 available: Optional[List[str]] = None,
                 dtype=jnp.float32):
        if cfg.num_layer < 2:
            raise ValueError("Number of GNN layers must be greater than 1.")
        self.cfg = cfg
        self.dtype = dtype
        self.label_to_template = label_to_template or {}
        # canonicalization boundary: inventory files are written by
        # external tools (the reference ships RDKit-canonical
        # available.csv.gz, loader.py:279-284) — re-spell every entry in
        # OUR canonical space so planner is_known / '(available)'
        # membership hits; dedup preserves first-seen order
        if available is not None:
            from ...chem import recanonicalize
            available = list(dict.fromkeys(
                recanonicalize(s) for s in available))
        self.available = available
        self.text_input_size = cfg.text_input_size
        self.text_drop = cfg.drop_ratio

    def init(self, key: jax.Array) -> Dict:
        cfg = self.cfg
        h = cfg.hidden_size
        keys = jax.random.split(key, 8 + 4 * cfg.num_layer)
        params: Dict = {
            "atom_encoder": embedding_init(keys[0], 118, h, dtype=self.dtype)["weight"],
            "virtualnode": jnp.zeros((h,), self.dtype),
            "text_dropping": embedding_init(keys[1], 1, cfg.text_input_size,
                                            dtype=self.dtype)["weight"],
            "convs": [], "adapters": [], "vn_mlps": [],
            "decoder": {
                "fc1": dense_init(keys[2], h, 4 * h, dtype=self.dtype),
                "norm": layer_norm_init(4 * h, affine=True, dtype=self.dtype),
                "fc2": dense_init(keys[3], 4 * h, cfg.out_dim, dtype=self.dtype),
            },
        }
        for layer in range(cfg.num_layer):
            base = 8 + 4 * layer
            params["convs"].append(gin_conv_init(keys[base], h, self.dtype))
            # AdaLN adapter zero-init on the output layer => identity gates
            # (parity: graph_predictor/model.py:296-297)
            params["adapters"].append({
                "w": jnp.zeros((cfg.text_input_size, 3 * h), self.dtype),
                "b": jnp.zeros((3 * h,), self.dtype),
            })
            if layer < cfg.num_layer - 1:
                k1, k2 = jax.random.split(keys[base + 1])
                params["vn_mlps"].append({
                    "fc1": dense_init(k1, h, 4 * h, dtype=self.dtype),
                    "norm": layer_norm_init(4 * h, affine=True, dtype=self.dtype),
                    "fc2": dense_init(k2, 4 * h, h, dtype=self.dtype),
                })
        return params

    def __call__(self, params, atom_codes, edge_classes, node_mask,
                 c: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Template logits [B, out_dim]; c = text conditioning [B, text_dim]
        or None for the learned dropped-text embedding
        (graph_predictor/model.py:306-353 forward)."""
        cfg = self.cfg
        b = atom_codes.shape[0]
        mask_f = node_mask.astype(self.dtype)
        pair = node_mask[:, :, None] & node_mask[:, None, :]
        adj = ((edge_classes > 0) & pair).astype(self.dtype)

        if c is None:
            c = jnp.broadcast_to(params["text_dropping"][0][None, :],
                                 (b, cfg.text_input_size))
        c = c.astype(self.dtype)

        h_prev = params["atom_encoder"][atom_codes] * mask_f[..., None]
        vn = jnp.broadcast_to(params["virtualnode"][None, :], (b, cfg.hidden_size))
        for layer in range(cfg.num_layer):
            h_in = h_prev + vn[:, None, :] * mask_f[..., None]
            ada = dense(params["adapters"][layer], jax.nn.silu(c))
            shift, scale, gate = jnp.split(ada, 3, axis=-1)  # [B, H] each
            h = gin_conv_apply(params["convs"][layer], h_in, edge_classes, adj)
            h = layer_norm(h)  # non-affine
            h = h * (1.0 + scale[:, None, :]) + shift[:, None, :]
            if layer < cfg.num_layer - 1:
                h = jax.nn.gelu(h, approximate=False)
            h = gate[:, None, :] * h + h_in
            if layer < cfg.num_layer - 1:
                pool = masked_max_pool(h_in, node_mask)
                m = params["vn_mlps"][layer]
                vn = vn + dense(m["fc2"], jax.nn.gelu(
                    layer_norm(dense(m["fc1"], pool), m["norm"]), approximate=False))
            h_prev = h

        g = masked_add_pool(h_prev * mask_f[..., None], node_mask)
        d = params["decoder"]
        # fp32 fidelity (tiny module, parity requirement)
        with jax.default_matmul_precision("float32"):
            out = dense(d["fc1"], g)
            out = layer_norm(out, d["norm"])
            out = jax.nn.gelu(out, approximate=False)
            return dense(d["fc2"], out)

    def template_probs(self, params, atom_codes, edge_classes, node_mask,
                       c: Optional[jnp.ndarray]) -> jnp.ndarray:
        """softmax over template labels (graph_predictor/model.py:174-177;
        the reference computes a drop-mixed logits tensor and then discards
        it — we keep only the live softmax(logits_main) path)."""
        logits = self(params, atom_codes, edge_classes, node_mask, c)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    def sample_templates(
        self, params, product_graph, c, product_smiles: str, topk: int = 10,
    ) -> Tuple[List[str], List[float], List[str]]:
        """Top-k template labels -> apply to the product -> merged reactant
        proposals (parity: graph_predictor/model.py:164-228 sample_templates
        incl. per-outcome score split, duplicate merging by sorted reactant
        key, and final score normalization)."""
        import numpy as np
        from collections import defaultdict
        from ...chem.reaction import apply_retro_template

        # bucket the node count to 8 so repeated calls share one compiled
        # program per size class (the planner calls this per expansion)
        k = product_graph.n_nodes
        n = ((k + 7) // 8) * 8
        atoms_np = np.zeros((1, n), np.int32)
        atoms_np[0, :k] = product_graph.atom_types
        edges_np = np.zeros((1, n, n), np.int32)
        edges_np[0, :k, :k] = product_graph.edge_classes
        mask_np = np.zeros((1, n), bool)
        mask_np[0, :k] = True
        atoms = jnp.asarray(atoms_np)
        edges = jnp.asarray(edges_np)
        mask = jnp.asarray(mask_np)
        if c is not None and c.ndim == 1:
            c = c[None, :]
        probs = np.asarray(self.template_probs(params, atoms, edges, mask, c))[0]
        k = min(topk, probs.shape[0])
        top_idx = np.argsort(-probs)[:k]

        reactants_d = defaultdict(list)
        for idx in top_idx:
            template = self.label_to_template.get(int(idx))
            if template is None:
                continue
            outcomes = apply_retro_template(template, product_smiles)
            if not outcomes:
                continue
            outcomes = sorted(outcomes)
            for reactant in outcomes:
                key = ".".join(sorted(reactant.strip().split(".")))
                reactants_d[key].append(
                    (float(probs[idx]) / len(outcomes), template))
        if not reactants_d:
            return [], [], []

        merged = []
        for reactant, entries in reactants_d.items():
            scores, templates = zip(*entries)
            merged.append((reactant, sum(scores), templates[0]))
        merged.sort(key=lambda item: item[1], reverse=True)
        reactants, scores, templates = map(list, zip(*merged))
        total = sum(scores)
        scores = [s / total for s in scores]
        return reactants, scores, templates

    # -- persistence ---------------------------------------------------------
    def save_pretrained(self, params: Dict, output_dir: str) -> None:
        from ...utils.serialization import save_pytree
        os.makedirs(output_dir, exist_ok=True)
        save_pytree(params, os.path.join(output_dir, "model.msgpack"))
        with open(os.path.join(output_dir, "model_config.json"), "w") as f:
            json.dump({
                "num_layer": self.cfg.num_layer,
                "hidden_size": self.cfg.hidden_size,
                "drop_ratio": self.cfg.drop_ratio,
                "num_task": self.cfg.out_dim,
                "text_input_size": self.cfg.text_input_size,
            }, f, indent=2)
        if self.label_to_template:
            with gzip.open(os.path.join(output_dir, "label_to_template.csv.gz"),
                           "wt") as f:
                f.write("rule_label,retro_templates\n")
                for k, v in self.label_to_template.items():
                    f.write(f'{k},"{v}"\n')
        if self.available is not None:
            with gzip.open(os.path.join(output_dir, "available.csv.gz"), "wt") as f:
                f.write("smiles\n")
                for s in self.available:
                    f.write(s + "\n")

    @classmethod
    def from_pretrained(cls, model_dir: str, dtype=jnp.float32):
        import csv
        from ...utils.serialization import load_pytree
        with open(os.path.join(model_dir, "model_config.json")) as f:
            raw = json.load(f)
        cfg = GraphPredictorConfig(
            num_layer=raw.get("num_layer", 5),
            hidden_size=raw.get("hidden_size", 300),
            drop_ratio=raw.get("drop_ratio", 0.0),
            out_dim=raw.get("num_task", raw.get("out_dim", 100)),
            text_input_size=raw.get("text_input_size", 768),
        )
        l2t = {}
        l2t_path = os.path.join(model_dir, "label_to_template.csv.gz")
        if os.path.exists(l2t_path):
            with gzip.open(l2t_path, "rt") as f:
                for row in csv.DictReader(f):
                    l2t[int(row["rule_label"])] = row["retro_templates"]
        available = None
        av_path = os.path.join(model_dir, "available.csv.gz")
        if os.path.exists(av_path):
            with gzip.open(av_path, "rt") as f:
                available = [row["smiles"] for row in csv.DictReader(f)]
        model = cls(cfg, l2t, available, dtype=dtype)
        params = load_pytree(os.path.join(model_dir, "model.msgpack"))
        return model, params


# provenance marker for CostMLP checkpoints: this package's Morgan bits
# (chem/fingerprint.py, first-party hash) are NOT RDKit-bit-compatible,
# so a cost model is only valid with the feature scheme it was trained on
COST_FEATURE_SCHEME = "llamole-tpu-morgan-r2-v1"


class CostMLP:
    """Fingerprint -> synthesis-cost regressor
    (graph_predictor/model.py:356-391)."""

    def __init__(self, n_layers: int = 1, fp_dim: int = 2048,
                 latent_dim: int = 128, dtype=jnp.float32):
        self.n_layers = n_layers
        self.fp_dim = fp_dim
        self.latent_dim = latent_dim
        self.dtype = dtype

    def init(self, key: jax.Array) -> Dict:
        keys = jax.random.split(key, self.n_layers + 1)
        layers = [dense_init(keys[0], self.fp_dim, self.latent_dim, dtype=self.dtype)]
        for i in range(self.n_layers - 1):
            layers.append(dense_init(keys[i + 1], self.latent_dim,
                                     self.latent_dim, dtype=self.dtype))
        layers.append(dense_init(keys[-1], self.latent_dim, 1, dtype=self.dtype))
        return {"layers": layers}

    def __call__(self, params, fps: jnp.ndarray) -> jnp.ndarray:
        x = fps.astype(self.dtype)
        for p in params["layers"][:-1]:
            x = jax.nn.relu(dense(p, x))
        x = dense(params["layers"][-1], x)
        return jnp.log1p(jnp.exp(x))  # softplus (model.py:390)

    def estimate_cost(self, params, smiles: str) -> float:
        from ...chem.fingerprint import morgan_fingerprint
        fp = morgan_fingerprint(smiles, radius=2, n_bits=self.fp_dim)
        if fp is None:
            raise ValueError(f"Invalid SMILES string: {smiles}")
        out = self(params, jnp.asarray(fp[None, :], jnp.float32))
        return float(out.reshape(()))

    def estimate_costs(self, params, smiles_list) -> List[float]:
        """Batched variant for the planner's batch_value_fn: one device
        call for all fingerprints; invalid SMILES cost 0 (they fail
        check_valid downstream anyway)."""
        from ...chem.fingerprint import morgan_fingerprint
        fps, rows = [], []
        for i, s in enumerate(smiles_list):
            fp = morgan_fingerprint(s, radius=2, n_bits=self.fp_dim)
            if fp is not None:
                fps.append(fp)
                rows.append(i)
        out = [0.0] * len(smiles_list)
        if fps:
            vals = self(params, jnp.asarray(np.asarray(fps), jnp.float32))
            for i, v in zip(rows, np.asarray(vals).reshape(-1)):
                out[i] = float(v)
        return out

    def save_pretrained(self, params: Dict, output_dir: str) -> None:
        from ...utils.serialization import save_pytree
        os.makedirs(output_dir, exist_ok=True)
        save_pytree(params, os.path.join(output_dir, "cost_model.msgpack"))
        with open(os.path.join(output_dir, "cost_config.json"), "w") as f:
            json.dump({"n_layers": self.n_layers, "fp_dim": self.fp_dim,
                       "latent_dim": self.latent_dim,
                       "feature_scheme": COST_FEATURE_SCHEME}, f, indent=2)

    @classmethod
    def from_pretrained(cls, model_dir: str, dtype=jnp.float32):
        """Load a cost model trained on THIS package's Morgan features.
        Refuses checkpoints without the matching feature_scheme marker:
        the reference's CostMLP consumes RDKit Morgan bits
        (graph_predictor/model.py:375-385) which our first-party hash
        does not reproduce — mismatched features give silently wrong
        costs, so the mismatch is a hard error."""
        from ...utils.serialization import load_pytree
        cfg_path = os.path.join(model_dir, "cost_config.json")
        raw = {}
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                raw = json.load(f)
        scheme = raw.get("feature_scheme")
        if scheme != COST_FEATURE_SCHEME:
            raise ValueError(
                f"cost model at {model_dir} was trained on feature scheme "
                f"{scheme!r}, not this package's first-party Morgan bits "
                f"({COST_FEATURE_SCHEME!r}). RDKit-feature CostMLP weights "
                "(e.g. the reference's cost_model.pt) would produce wrong "
                "synthesis costs silently. Retrain with "
                "llamole_tpu.train.pretrain.pretrain_cost_mlp.")
        model = cls(n_layers=raw.get("n_layers", 1),
                    fp_dim=raw.get("fp_dim", 2048),
                    latent_dim=raw.get("latent_dim", 128), dtype=dtype)
        params = load_pytree(os.path.join(model_dir, "cost_model.msgpack"))
        return model, params
