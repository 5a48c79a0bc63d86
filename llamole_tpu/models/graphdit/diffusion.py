"""Discrete graph diffusion math, TPU-first.

The reference materializes the joint transition matrix
Q = α·I + (1-α)·U over the (Xdim + n·Edim)-dim joint feature space
(diffusion_utils.py:273-349 MarginalTransition) and runs O(n·D²)
matmuls per step, D = Xdim + n·Edim (≈516 for n=100).

U is block-tiled from four tiny matrices:

        U = [[ u_x          u_xe ⊗ 1ₙᵀ ]
             [ 1ₙ ⊗ u_ex    1ₙₙ ⊗ u_e  ]]

so for a joint row v = [x ‖ e₁ … eₙ] with S = Σⱼ eⱼ:

    (vU)_X  = x·u_x  + S·u_ex
    (vU)_Eⱼ = x·u_xe + S·u_e          (identical for every j)

This module computes all transition products (forward q(x_t|x_0),
posterior numerator/denominator, transposed variants) in that
factored O(n·d²) form — exactly equal to the reference's dense result,
with no giant matrix in memory. Verified against a dense construction
in tests/test_graphdit.py.
"""

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import DataInfo

# ---------------------------------------------------------------------------
# Noise schedule (cosine, parity: diffusion_utils.py:364-373)
# ---------------------------------------------------------------------------

def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 2
    x = np.linspace(0, steps, steps)
    ac = np.cos(0.5 * np.pi * ((x / steps) + s) / (1 + s)) ** 2
    ac = ac / ac[0]
    alphas = ac[1:] / ac[:-1]
    return (1.0 - alphas).squeeze()


@dataclass
class NoiseSchedule:
    betas: jnp.ndarray       # [T+1]
    alphas_bar: jnp.ndarray  # [T+1]
    timesteps: int

    @classmethod
    def create(cls, timesteps: int) -> "NoiseSchedule":
        betas = np.clip(cosine_beta_schedule(timesteps), 0.0, 1.0)
        alphas_bar = np.exp(np.cumsum(np.log(np.clip(1.0 - betas, 1e-30, None))))
        return cls(
            betas=jnp.asarray(betas, dtype=jnp.float32),
            alphas_bar=jnp.asarray(alphas_bar, dtype=jnp.float32),
            timesteps=timesteps,
        )

    def beta(self, t_int: jnp.ndarray) -> jnp.ndarray:
        return self.betas[t_int]

    def alpha_bar(self, t_int: jnp.ndarray) -> jnp.ndarray:
        return self.alphas_bar[t_int]


# ---------------------------------------------------------------------------
# Structured marginal transition
# ---------------------------------------------------------------------------

@dataclass
class TransitionParts:
    """The four block generators of U (all f32)."""

    u_x: jnp.ndarray   # [dx, dx] rows = x_marginals
    u_e: jnp.ndarray   # [de, de] rows = e_marginals
    u_xe: jnp.ndarray  # [dx, de]
    u_ex: jnp.ndarray  # [de, dx]

    @classmethod
    def from_data_info(cls, info: DataInfo) -> "TransitionParts":
        x_marg, e_marg, xe, ex = info.marginals()
        dx, de = len(x_marg), len(e_marg)
        return cls(
            u_x=jnp.asarray(np.tile(x_marg[None, :], (dx, 1)), jnp.float32),
            u_e=jnp.asarray(np.tile(e_marg[None, :], (de, 1)), jnp.float32),
            u_xe=jnp.asarray(xe, jnp.float32),
            u_ex=jnp.asarray(ex, jnp.float32),
        )

    def transpose(self) -> "TransitionParts":
        """Parts of Uᵀ (block-transpose swaps the off-diagonal tiles)."""
        return TransitionParts(
            u_x=self.u_x.T, u_e=self.u_e.T, u_xe=self.u_ex.T, u_ex=self.u_xe.T
        )

    def limit_dist(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.u_x[0], self.u_e[0]


def apply_Q(
    X: jnp.ndarray,      # [B, N, dx]
    E: jnp.ndarray,      # [B, N, N, de]
    coef: jnp.ndarray,   # [B] or [B,1]: α (identity weight)
    parts: TransitionParts,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(X‖E) @ (coef·I + (1-coef)·U) in factored form.

    Equals the reference's X_all @ Q (diffusion_model.py:223-226 /
    diffusion_utils.py:476-492) without materializing Q.
    """
    coef = coef.reshape(-1, 1, 1).astype(jnp.float32)
    Xf = X.astype(jnp.float32)
    Ef = E.astype(jnp.float32)
    S = Ef.sum(axis=2)  # [B, N, de]
    # full f32 MXU passes: these tiny matmuls are numerics-critical and
    # cost nothing, so never let them fall to bf16 multiplies
    hi = jax.lax.Precision.HIGHEST
    mix_x = (jnp.matmul(Xf, parts.u_x, precision=hi)
             + jnp.matmul(S, parts.u_ex, precision=hi))   # [B, N, dx]
    mix_e = (jnp.matmul(Xf, parts.u_xe, precision=hi)
             + jnp.matmul(S, parts.u_e, precision=hi))    # [B, N, de]
    out_X = coef * Xf + (1.0 - coef) * mix_x
    out_E = coef[..., None] * Ef + (1.0 - coef[..., None]) * mix_e[:, :, None, :]
    return out_X, out_E


def posterior_unnormalized(
    X_t: jnp.ndarray, E_t: jnp.ndarray,        # one-hot at step t
    pred_X: jnp.ndarray, pred_E: jnp.ndarray,  # model p(x0) probabilities
    beta_t: jnp.ndarray, alpha_s_bar: jnp.ndarray, alpha_t_bar: jnp.ndarray,
    parts: TransitionParts,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unnormalized p(z_s | z_t, x0≈pred) per class.

    parity: diffusion_utils.py:476-492 reverse_diffusion —
    (X_t Qtᵀ) ⊙ (pred Qsb) / clamp(X_t Qtbᵀ, 1e-5).
    """
    tparts = parts.transpose()
    left_X, left_E = apply_Q(X_t, E_t, 1.0 - beta_t, tparts)
    right_X, right_E = apply_Q(pred_X, pred_E, alpha_s_bar, parts)
    den_X, den_E = apply_Q(X_t, E_t, alpha_t_bar, tparts)
    num_X = left_X * right_X
    num_E = left_E * right_E
    prob_X = num_X / jnp.clip(den_X, 1e-5, None)
    prob_E = num_E / jnp.clip(den_E, 1e-5, None)
    return prob_X, prob_E


# ---------------------------------------------------------------------------
# Sampling primitives
# ---------------------------------------------------------------------------

def sample_discrete_features(
    key: jax.Array,
    probX: jnp.ndarray,      # [B, N, dx] (unnormalized ok)
    probE: jnp.ndarray,      # [B, N, N, de]
    node_mask: jnp.ndarray,  # [B, N] bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Categorical node/edge sampling with masking + upper-tri symmetrization
    (parity: diffusion_utils.py:376-413)."""
    b, n, dx = probX.shape
    de = probE.shape[-1]
    kx, ke = jax.random.split(key)

    probX = jnp.where(node_mask[..., None], probX, 1.0 / dx)
    probX = jnp.clip(probX, 1e-5, None)
    logitsX = jnp.log(probX)
    X = jax.random.categorical(kx, logitsX, axis=-1)  # [B, N]

    pair_mask = node_mask[:, :, None] & node_mask[:, None, :]
    eye = jnp.eye(n, dtype=bool)[None]
    valid = pair_mask & ~eye
    probE = jnp.where(valid[..., None], probE, 1.0 / de)
    probE = jnp.clip(probE, 1e-5, None)
    E = jax.random.categorical(ke, jnp.log(probE), axis=-1)  # [B, N, N]
    upper = jnp.triu(E, k=1)
    E = upper + jnp.swapaxes(upper, 1, 2)

    X = jnp.where(node_mask, X, 0)
    E = jnp.where(valid, E, 0)
    return X, E


def sample_limit_dist(
    key: jax.Array, parts: TransitionParts, node_mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """z_T ~ limit distribution (parity: diffusion_utils.py:495-518)."""
    b, n = node_mask.shape
    x_lim, e_lim = parts.limit_dist()
    probX = jnp.broadcast_to(x_lim[None, None, :], (b, n, x_lim.shape[0]))
    probE = jnp.broadcast_to(e_lim[None, None, None, :], (b, n, n, e_lim.shape[0]))
    return sample_discrete_features(key, probX, probE, node_mask)


def one_hot_graph(X: jnp.ndarray, E: jnp.ndarray, dx: int, de: int,
                  node_mask: jnp.ndarray, dtype=jnp.float32):
    Xh = jax.nn.one_hot(X, dx, dtype=dtype) * node_mask[..., None]
    pair = (node_mask[:, :, None] & node_mask[:, None, :])[..., None]
    Eh = jax.nn.one_hot(E, de, dtype=dtype) * pair
    return Xh, Eh


def sample_n_nodes(key: jax.Array, info_hist: jnp.ndarray, batch: int) -> jnp.ndarray:
    """Sample node counts from the training histogram
    (parity: diffusion_utils.py:143-162 DistributionNodes)."""
    logits = jnp.log(jnp.clip(info_hist, 1e-30, None))
    return jax.random.categorical(key, logits[None, :], axis=-1, shape=(batch,))


# ---------------------------------------------------------------------------
# Forward noising + training loss
# ---------------------------------------------------------------------------

def apply_noise(
    key: jax.Array,
    X: jnp.ndarray, E: jnp.ndarray,  # one-hot f32
    node_mask: jnp.ndarray,
    schedule: NoiseSchedule,
    parts: TransitionParts,
    train: bool = True,
) -> Dict:
    """Sample t and z_t ~ q(z_t | z_0) (parity: diffusion_model.py:197-250)."""
    b = X.shape[0]
    kt, ks = jax.random.split(key)
    lowest = 0 if train else 1
    t_int = jax.random.randint(kt, (b,), lowest, schedule.timesteps + 1)
    alpha_t_bar = schedule.alpha_bar(t_int)
    probX, probE = apply_Q(X, E, alpha_t_bar, parts)
    Xt, Et = sample_discrete_features(ks, probX, probE, node_mask)
    Xh, Eh = one_hot_graph(Xt, Et, X.shape[-1], E.shape[-1], node_mask)
    return {
        "t_int": t_int,
        "t": t_int.astype(jnp.float32) / schedule.timesteps,
        "X_t": Xh,
        "E_t": Eh,
    }


def train_loss(
    pred_X: jnp.ndarray, pred_E: jnp.ndarray,
    true_X: jnp.ndarray, true_E: jnp.ndarray,
    lambda_train: Tuple[float, float],
) -> jnp.ndarray:
    """λ-weighted CE over valid nodes and edges
    (parity: diffusion_model.py:402-438 TrainLossDiscrete; 'valid' rows are
    those with any nonzero one-hot mass, identical to the reference's mask)."""
    def masked_ce(pred, true):
        pred = pred.reshape(-1, pred.shape[-1]).astype(jnp.float32)
        true = true.reshape(-1, true.shape[-1]).astype(jnp.float32)
        mask = jnp.any(true != 0.0, axis=-1)
        target = jnp.argmax(true, axis=-1)
        logp = jax.nn.log_softmax(pred, axis=-1)
        nll = -jnp.take_along_axis(logp, target[:, None], axis=-1)[:, 0]
        nll = jnp.where(mask, nll, 0.0)
        return nll.sum() / jnp.clip(mask.sum(), 1, None)

    return (lambda_train[0] * masked_ce(pred_X, true_X)
            + lambda_train[1] * masked_ce(pred_E, true_E))


# ---------------------------------------------------------------------------
# Reverse sampling step (used inside lax.scan by api.generate)
# ---------------------------------------------------------------------------

def reverse_step(
    key: jax.Array,
    denoise_fn,                      # (X_t, E_t, t, unconditioned) -> logits
    X_t: jnp.ndarray, E_t: jnp.ndarray,
    s_int: jnp.ndarray,              # scalar int32 (target step s = t-1)
    node_mask: jnp.ndarray,
    schedule: NoiseSchedule,
    parts: TransitionParts,
    guide_scale: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One p(z_s | z_t) sample with classifier-free guidance
    (parity: diffusion_model.py:309-399 sample_p_zs_given_zt)."""
    b = X_t.shape[0]
    t_int = s_int + 1
    beta_t = jnp.broadcast_to(schedule.beta(t_int), (b,))
    alpha_s_bar = jnp.broadcast_to(schedule.alpha_bar(s_int), (b,))
    alpha_t_bar = jnp.broadcast_to(schedule.alpha_bar(t_int), (b,))
    t_norm = jnp.broadcast_to(t_int.astype(jnp.float32) / schedule.timesteps, (b,))

    def probs(unconditioned: bool):
        logits_X, logits_E = denoise_fn(X_t, E_t, t_norm, unconditioned)
        pX = jax.nn.softmax(logits_X.astype(jnp.float32), axis=-1)
        pE = jax.nn.softmax(logits_E.astype(jnp.float32), axis=-1)
        uX, uE = posterior_unnormalized(
            X_t, E_t, pX, pE, beta_t, alpha_s_bar, alpha_t_bar, parts)
        # zero-sum rows -> tiny uniform mass (parity: diffusion_model.py:353-354)
        uX = jnp.where(jnp.sum(uX, -1, keepdims=True) == 0.0, 1e-5, uX)
        uE = jnp.where(jnp.sum(uE, -1, keepdims=True) == 0.0, 1e-5, uE)
        pX = uX / jnp.sum(uX, -1, keepdims=True)
        pE = uE / jnp.sum(uE, -1, keepdims=True)
        return pX, pE

    prob_X, prob_E = probs(False)
    if guide_scale is not None and guide_scale != 1:
        un_X, un_E = probs(True)
        prob_X = un_X * (prob_X / jnp.clip(un_X, 1e-5, None)) ** guide_scale
        prob_E = un_E * (prob_E / jnp.clip(un_E, 1e-5, None)) ** guide_scale
        prob_X = prob_X / jnp.clip(prob_X.sum(-1, keepdims=True), 1e-5, None)
        prob_E = prob_E / jnp.clip(prob_E.sum(-1, keepdims=True), 1e-5, None)

    Xs, Es = sample_discrete_features(key, prob_X, prob_E, node_mask)
    return one_hot_graph(Xs, Es, X_t.shape[-1], E_t.shape[-1], node_mask)
