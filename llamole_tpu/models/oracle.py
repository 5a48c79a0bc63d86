"""First-party property oracle: GIN trunk + linear head over the 10
MolQA property channels (BBBP,HIV,BACE binary; CO2,N2,O2,FFV,TC,SC,SA
continuous — eval/dataset.py channel order, utils.constants
MOL_PROPERTIES).

The paper scores property fidelity of generated molecules with
external oracle predictors (arXiv 2410.04223 §5; the reference repo
ships no oracle code — results are scored offline). This is the
offline-trainable analog: train it on the corpus labels
(train/pretrain.pretrain_property_oracle), point
ModelArguments.property_oracle_path at the artifact, and the eval
summary gains per-channel accuracy (binary, threshold 0.5) and MAE
(continuous) of generated molecules against their requested
conditions.

Continuous targets are standardized with corpus statistics stored on
the checkpoint; predictions de-standardize on the way out, so callers
always see raw property units.
"""

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import MOL_PROPERTIES, NO_LABEL_INDEX
from .graphclip.model import GraphCLIP, GraphCLIPConfig

# channel split (MOL_PROPERTIES order)
BINARY_CHANNELS: Tuple[int, ...] = (0, 1, 2)        # BBBP, HIV, BACE
CONTINUOUS_CHANNELS: Tuple[int, ...] = tuple(range(3, 10))


@dataclass
class PropertyOracleConfig:
    num_layer: int = 3
    hidden_size: int = 128


class PropertyOracle:
    """[B,N] atom codes + [B,N,N] edge classes -> [B,10] predictions
    (binary channels return probabilities, continuous return raw
    property units)."""

    def __init__(self, cfg: PropertyOracleConfig):
        self.cfg = cfg
        self._trunk = GraphCLIP(GraphCLIPConfig(
            num_layer=cfg.num_layer, hidden_size=cfg.hidden_size))

    def init(self, key: jax.Array, y_mean=None, y_std=None) -> Dict:
        from ..ops.nn import dense_init
        k1, k2 = jax.random.split(key)
        return {
            "trunk": self._trunk.init(k1),
            "head": dense_init(k2, self.cfg.hidden_size,
                               len(MOL_PROPERTIES)),
            "y_mean": jnp.asarray(
                y_mean if y_mean is not None
                else np.zeros(len(MOL_PROPERTIES)), jnp.float32),
            "y_std": jnp.asarray(
                y_std if y_std is not None
                else np.ones(len(MOL_PROPERTIES)), jnp.float32),
        }

    def _raw(self, params, atom_codes, edge_classes, node_mask):
        from ..ops.nn import dense
        feats = self._trunk.encode(params["trunk"], atom_codes,
                                   edge_classes, node_mask)
        return dense(params["head"], feats).astype(jnp.float32)  # [B,10]

    def __call__(self, params, atom_codes, edge_classes, node_mask):
        raw = self._raw(params, atom_codes, edge_classes, node_mask)
        out = raw * params["y_std"][None, :] + params["y_mean"][None, :]
        bin_mask = np.zeros(len(MOL_PROPERTIES), bool)
        bin_mask[list(BINARY_CHANNELS)] = True
        return jnp.where(jnp.asarray(bin_mask)[None, :],
                         jax.nn.sigmoid(raw), out)

    def loss(self, params, atom_codes, edge_classes, node_mask, targets):
        """Masked multi-task loss: BCE on labeled binary channels, MSE
        on standardized labeled continuous channels. targets [B,10] with
        NO_LABEL_INDEX marking absent labels."""
        raw = self._raw(params, atom_codes, edge_classes, node_mask)
        # a NaN label (json NaN-for-absent, the eval-side convention)
        # must mask out like NO_LABEL_INDEX — multiplication would
        # propagate it through the whole batch loss
        labeled = (targets > float(NO_LABEL_INDEX) + 1.0) \
            & jnp.isfinite(targets)
        safe = jnp.where(labeled, targets, 0.0)
        bin_mask = np.zeros(len(MOL_PROPERTIES), bool)
        bin_mask[list(BINARY_CHANNELS)] = True
        bin_mask = jnp.asarray(bin_mask)[None, :]

        # binary: BCE with logits
        y = jnp.clip(safe, 0.0, 1.0)
        bce = (jnp.maximum(raw, 0.0) - raw * y
               + jnp.log1p(jnp.exp(-jnp.abs(raw))))
        # continuous: MSE in standardized space. The stats are dataset
        # constants riding the param tree for persistence — freeze them
        # (optimizing them lets the net shrink its own target scale)
        z = (safe - jax.lax.stop_gradient(params["y_mean"])[None, :]) \
            / jnp.clip(jax.lax.stop_gradient(params["y_std"])[None, :], 1e-6)
        mse = (raw - z) ** 2

        per = jnp.where(labeled, jnp.where(bin_mask, bce, mse), 0.0)
        return per.sum() / jnp.clip(labeled.sum(), 1.0)

    # -- persistence --------------------------------------------------------
    def save_pretrained(self, params: Dict, output_dir: str) -> None:
        from ..utils.serialization import save_pytree
        os.makedirs(output_dir, exist_ok=True)
        save_pytree(params, os.path.join(output_dir, "model.msgpack"))
        with open(os.path.join(output_dir, "model_config.json"), "w") as f:
            json.dump({"oracle_num_layer": self.cfg.num_layer,
                       "oracle_hidden_size": self.cfg.hidden_size,
                       "properties": list(MOL_PROPERTIES)}, f, indent=2)

    @classmethod
    def from_pretrained(cls, model_dir: str):
        from ..utils.serialization import load_pytree
        with open(os.path.join(model_dir, "model_config.json")) as f:
            raw = json.load(f)
        if raw.get("properties") != list(MOL_PROPERTIES):
            raise ValueError(
                f"oracle at {model_dir} was trained for channels "
                f"{raw.get('properties')} — this build expects "
                f"{list(MOL_PROPERTIES)}")
        model = cls(PropertyOracleConfig(
            num_layer=raw.get("oracle_num_layer", 3),
            hidden_size=raw.get("oracle_hidden_size", 128)))
        params = load_pytree(os.path.join(model_dir, "model.msgpack"))
        return model, params

    # -- convenience --------------------------------------------------------
    def predict_smiles(self, params, smiles_list: List[str]
                       ) -> List[Optional[np.ndarray]]:
        """Per-molecule [10] predictions; None for unparseable inputs.
        Featurizes through the canonical spelling (ingest boundary)."""
        from ..chem.featurize import pad_graph_batch, smiles_to_graph
        from ..chem.smiles import canonical_smiles

        graphs, where = [], []
        for i, s in enumerate(smiles_list):
            can = canonical_smiles(s) if s else None
            g = smiles_to_graph(can) if can else None
            if g is not None:
                graphs.append(g)
                where.append(i)
        out: List[Optional[np.ndarray]] = [None] * len(smiles_list)
        if not graphs:
            return out
        n = max(g.n_nodes for g in graphs)
        n = ((n + 7) // 8) * 8
        padded = pad_graph_batch(graphs, n)
        preds = np.asarray(self(
            params, jnp.asarray(padded["atom_types"]),
            jnp.asarray(padded["edge_classes"]),
            jnp.asarray(padded["node_mask"])))
        for row, i in enumerate(where):
            out[i] = preds[row]
        return out
