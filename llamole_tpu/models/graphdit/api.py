"""GraphDiT: multi-conditional discrete graph diffusion decoder.

Public surface parity with the reference GraphDiT
(graph_decoder/diffusion_model.py:27-399): a training loss over noised
graphs and a reverse-diffusion sampler that emits SMILES. TPU-first
divergences:

  * transition products run in factored O(n·d²) form (diffusion.py)
  * classifier-free guidance runs as ONE denoiser call on a doubled
    batch (the unconditioned half carries NaN conditioning, which the
    embedders already interpret as "dropped") instead of two calls
  * the whole T-step reverse loop is a single lax.scan under jit —
    one XLA program, no host round-trips until SMILES assembly
"""

import functools
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...chem.assemble import check_valid as _check_valid
from ...chem.assemble import graph_to_smiles as _graph_to_smiles
from ...utils.constants import NO_LABEL_INDEX
from .config import DataInfo, GraphDiTConfig
from .denoiser import apply_denoiser, init_denoiser
from .diffusion import (
    NoiseSchedule,
    TransitionParts,
    apply_noise,
    one_hot_graph,
    sample_limit_dist,
    sample_n_nodes,
    train_loss,
)


class GraphDiT:
    """Stateless model wrapper: params live in caller-owned pytrees."""

    def __init__(self, cfg: GraphDiTConfig, data_info: DataInfo,
                 dtype=jnp.float32):
        cfg.Xdim = len(data_info.active_atoms)
        cfg.max_n_nodes = data_info.max_n_nodes
        self.cfg = cfg
        self.data_info = data_info
        self.dtype = dtype
        self.schedule = NoiseSchedule.create(cfg.diffusion_steps)
        self.parts = TransitionParts.from_data_info(data_info)
        self.atom_decoder = list(data_info.active_atoms)
        self._active_index = jnp.asarray(data_info.active_index, jnp.int32)
        self._nodes_hist = jnp.asarray(
            np.asarray(data_info.n_nodes_dist, dtype=np.float64)
            / max(np.asarray(data_info.n_nodes_dist).sum(), 1e-12),
            jnp.float32,
        )
        self.text_input_size = cfg.text_dim
        self.hidden_size = cfg.hidden_size

    # -- params -----------------------------------------------------------
    def init(self, key: jax.Array) -> Dict:
        return init_denoiser(key, self.cfg, self.dtype)

    # -- featurization bridge ----------------------------------------------
    def codes_to_onehot(self, atom_codes, edge_classes, node_mask):
        """118-space atom codes -> active-space one-hot (+ masked edges).

        parity: diffusion_model.py:152-155 one_hot(x,118)[:, active_index];
        atoms outside the active set become all-zero rows, which the
        masked CE then ignores.
        """
        X = (atom_codes[..., None] == self._active_index[None, None, :]).astype(jnp.float32)
        X = X * node_mask[..., None]
        pair = (node_mask[:, :, None] & node_mask[:, None, :])[..., None]
        E = jax.nn.one_hot(edge_classes, self.cfg.Edim, dtype=jnp.float32) * pair
        return X, E

    # -- training ------------------------------------------------------------
    def loss(
        self,
        params: Dict,
        rng: jax.Array,
        atom_codes: jnp.ndarray,    # [B, N] int (z-2 codes)
        edge_classes: jnp.ndarray,  # [B, N, N] int
        node_mask: jnp.ndarray,     # [B, N] bool
        properties: jnp.ndarray,    # [B, ydim], NO_LABEL_INDEX = absent
        text_emb: jnp.ndarray,      # [B, text_dim]
        train: bool = True,
    ) -> jnp.ndarray:
        """λ-weighted node/edge CE on one noise level per sample
        (parity: diffusion_model.py:148-172 forward)."""
        y = jnp.where(properties == NO_LABEL_INDEX, jnp.nan, properties)
        X, E = self.codes_to_onehot(atom_codes, edge_classes, node_mask)
        k_noise, k_den = jax.random.split(rng)
        noisy = apply_noise(k_noise, X, E, node_mask, self.schedule, self.parts,
                            train=train)
        pred_X, pred_E = apply_denoiser(
            params, self.cfg, noisy["X_t"], noisy["E_t"], node_mask,
            y, text_emb, noisy["t"], train=train, rng=k_den)
        return train_loss(pred_X, pred_E, X, E, tuple(self.cfg.lambda_train))

    # -- generation -----------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0,))
    def _sample_jit(self, params, rng, y, text_emb):
        """Full reverse diffusion as one lax.scan. Returns collapsed
        (atom_idx [B,N] int32 in active space, edge_cls [B,N,N], n_nodes)."""
        b = y.shape[0]
        n = self.cfg.max_n_nodes
        k_n, k_init, k_loop = jax.random.split(rng, 3)
        n_nodes = sample_n_nodes(k_n, self._nodes_hist, b)
        node_mask = jnp.arange(n)[None, :] < n_nodes[:, None]

        Xc, Ec = sample_limit_dist(k_init, self.parts, node_mask)
        X, E = one_hot_graph(Xc, Ec, self.cfg.Xdim, self.cfg.Edim, node_mask)

        use_cfg = self.cfg.guide_scale is not None and self.cfg.guide_scale != 1
        y_nan = jnp.full_like(y, jnp.nan)
        txt_nan = jnp.full_like(text_emb, jnp.nan)

        def denoise_fn(X_t, E_t, t_norm, unconditioned):
            if use_cfg:
                # doubled batch: [conditioned ‖ unconditioned]
                X2 = jnp.concatenate([X_t, X_t], 0)
                E2 = jnp.concatenate([E_t, E_t], 0)
                m2 = jnp.concatenate([node_mask, node_mask], 0)
                y2 = jnp.concatenate([y, y_nan], 0)
                txt2 = jnp.concatenate([text_emb, txt_nan], 0)
                t2 = jnp.concatenate([t_norm, t_norm], 0)
                lX, lE = apply_denoiser(params, self.cfg, X2, E2, m2, y2, txt2, t2)
                return (lX[:b], lE[:b]), (lX[b:], lE[b:])
            lX, lE = apply_denoiser(
                params, self.cfg, X_t, E_t, node_mask, y, text_emb, t_norm)
            return (lX, lE), None

        from .diffusion import posterior_unnormalized

        def step(carry, ts):
            t_int, s_int = ts
            X_t, E_t, key = carry
            key, sub = jax.random.split(key)
            a_s = jnp.broadcast_to(self.schedule.alpha_bar(s_int), (b,))
            a_t = jnp.broadcast_to(self.schedule.alpha_bar(t_int), (b,))
            # effective one-jump noise t -> s: exact when s = t-1, the
            # family-closure approximation under striding (config note)
            beta_t = jnp.broadcast_to(
                1.0 - self.schedule.alpha_bar(t_int)
                / jnp.clip(self.schedule.alpha_bar(s_int), 1e-12, None), (b,))
            t_norm = jnp.full((b,), t_int.astype(jnp.float32) / self.schedule.timesteps)

            cond, uncond = denoise_fn(X_t, E_t, t_norm, False)

            def to_probs(logits):
                lX, lE = logits
                pX = jax.nn.softmax(lX.astype(jnp.float32), -1)
                pE = jax.nn.softmax(lE.astype(jnp.float32), -1)
                uX, uE = posterior_unnormalized(
                    X_t, E_t, pX, pE, beta_t, a_s, a_t, self.parts)
                uX = jnp.where(jnp.sum(uX, -1, keepdims=True) == 0.0, 1e-5, uX)
                uE = jnp.where(jnp.sum(uE, -1, keepdims=True) == 0.0, 1e-5, uE)
                return (uX / uX.sum(-1, keepdims=True),
                        uE / uE.sum(-1, keepdims=True))

            prob_X, prob_E = to_probs(cond)
            if use_cfg:
                g = self.cfg.guide_scale
                un_X, un_E = to_probs(uncond)
                prob_X = un_X * (prob_X / jnp.clip(un_X, 1e-5, None)) ** g
                prob_E = un_E * (prob_E / jnp.clip(un_E, 1e-5, None)) ** g
                prob_X = prob_X / jnp.clip(prob_X.sum(-1, keepdims=True), 1e-5, None)
                prob_E = prob_E / jnp.clip(prob_E.sum(-1, keepdims=True), 1e-5, None)

            from .diffusion import sample_discrete_features
            Xs, Es = sample_discrete_features(sub, prob_X, prob_E, node_mask)
            Xh, Eh = one_hot_graph(Xs, Es, self.cfg.Xdim, self.cfg.Edim, node_mask)
            return (Xh, Eh, key), None

        T = self.schedule.timesteps
        n_steps = self.cfg.sampling_steps or T
        n_steps = max(1, min(n_steps, T))
        # time grid T = t_0 > t_1 > ... > t_n = 0; scan over (t_k, t_{k+1})
        grid = np.unique(np.round(np.linspace(T, 0, n_steps + 1))
                         .astype(np.int32))[::-1].copy()
        ts = jnp.asarray(np.stack([grid[:-1], grid[1:]], axis=1))
        (X, E, _), _ = jax.lax.scan(step, (X, E, k_loop), ts)

        atom_idx = jnp.argmax(X, axis=-1).astype(jnp.int32)
        edge_cls = jnp.argmax(E, axis=-1).astype(jnp.int32)
        pair = node_mask[:, :, None] & node_mask[:, None, :]
        edge_cls = jnp.where(pair, edge_cls, 0)
        return atom_idx, edge_cls, n_nodes

    def generate(
        self,
        params: Dict,
        rng: jax.Array,
        properties: jnp.ndarray,  # [B, ydim]; NO_LABEL_INDEX or NaN = absent
        text_emb: jnp.ndarray,    # [B, text_dim]
        mesh=None,                # optional jax.sharding.Mesh with a 'dp' axis
    ) -> List[Optional[str]]:
        """Sample molecules and assemble SMILES on the host
        (parity: diffusion_model.py:252-304 generate).

        With `mesh`, the batch shards over the 'dp' axis and params
        replicate — the whole reverse scan partitions via GSPMD, the
        v5e-8 molecules/min scale-out path (BASELINE.md north star)."""
        y = jnp.where(properties == NO_LABEL_INDEX, jnp.nan, properties)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            dp = mesh.shape.get("dp", 1)
            b = y.shape[0]
            pad_rows = (-b) % dp
            if pad_rows:
                y = jnp.concatenate([y, y[:pad_rows]], axis=0)
                text_emb = jnp.concatenate([text_emb, text_emb[:pad_rows]], 0)
            y = jax.device_put(y, NamedSharding(mesh, P("dp", None)))
            text_emb = jax.device_put(text_emb, NamedSharding(mesh, P("dp", None)))
            # place params once per (tree, mesh) — re-transferring the
            # depth-28 tree every eval batch costs hundreds of MB over
            # the tunnel. Identity (`is`) keys on live references we
            # retain, so recycled id()s can never alias a new tree.
            if (getattr(self, "_placed_src", None) is not params
                    or getattr(self, "_placed_mesh", None) is not mesh):
                self._placed_params = jax.device_put(
                    params, NamedSharding(mesh, P()))
                self._placed_src = params
                self._placed_mesh = mesh
            params = self._placed_params
            with jax.set_mesh(mesh):
                atom_idx, edge_cls, n_nodes = self._sample_jit(
                    params, rng, y, text_emb)
            if pad_rows:
                atom_idx = atom_idx[:b]
                edge_cls = edge_cls[:b]
                n_nodes = n_nodes[:b]
        else:
            atom_idx, edge_cls, n_nodes = self._sample_jit(params, rng, y, text_emb)
        atom_idx = np.asarray(atom_idx)
        edge_cls = np.asarray(edge_cls)
        n_nodes = np.asarray(n_nodes)
        mols = []
        for i in range(atom_idx.shape[0]):
            k = int(n_nodes[i])
            mols.append((atom_idx[i, :k], edge_cls[i, :k, :k]))
        return _graph_to_smiles(mols, self.atom_decoder)

    def check_valid(self, smiles: Optional[str]) -> bool:
        return _check_valid(smiles)

    # -- persistence -----------------------------------------------------------
    def save_pretrained(self, params: Dict, output_dir: str) -> None:
        from ...utils.serialization import save_pytree
        os.makedirs(output_dir, exist_ok=True)
        save_pytree(params, os.path.join(output_dir, "model.msgpack"))
        self.cfg.to_yaml(os.path.join(output_dir, "model_config.yaml"))
        self.data_info.save(output_dir)

    @classmethod
    def from_pretrained(cls, model_dir: str, dtype=jnp.float32):
        from ...utils.serialization import load_pytree
        data_info = DataInfo.load(model_dir)
        cfg = GraphDiTConfig.from_yaml(os.path.join(model_dir, "model_config.yaml"))
        model = cls(cfg, data_info, dtype=dtype)
        params = load_pytree(os.path.join(model_dir, "model.msgpack"))
        return model, params
