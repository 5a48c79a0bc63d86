"""Custom optimizer factory: GaLore, LoRA+, BAdam analogs.

TPU-native counterparts of the reference's optimizer factory
(src/train/trainer_utils.py:184-366, create_custom_optimzer:369),
expressed as optax gradient transformations instead of torch optimizer
subclasses + post-accumulate hooks:

  GaLore  — low-rank gradient projection (arXiv 2403.03507): 2D grads
            are projected onto a rank-r subspace refreshed by SVD every
            `update_interval` steps; Adam moments live in the low-rank
            space (the memory win), updates are projected back and
            scaled. jax.lax.cond keeps the SVD off the hot path.
  LoRA+   — higher learning rate for the LoRA "B" matrices
            (trainer_utils.py:271-305): a path-keyed update scaler.
  BAdam   — block-coordinate descent (trainer_utils.py:308-366 layer
            mode): only one block of parameters receives updates per
            window, cycling every `switch_interval` steps.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class GaLoreState(NamedTuple):
    count: jnp.ndarray
    proj: Any    # per-leaf projection matrices (or None)
    inner: Any   # inner optimizer state over projected grads


def _galore_eligible(x, rank: int) -> bool:
    return hasattr(x, "ndim") and x.ndim == 2 and min(x.shape) > rank


def galore(
    inner: optax.GradientTransformation,
    rank: int = 16,
    update_interval: int = 200,
    scale: float = 0.25,
) -> optax.GradientTransformation:
    """Project 2D gradients to rank-`rank` before the inner optimizer.

    Parity: galore_rank / galore_update_interval / galore_scale /
    proj_type "std" (finetuning_args; trainer_utils.py:201-206). Leaves
    with ndim != 2 (or too small to profit) get the plain inner
    optimizer, like the reference's non-galore param groups."""
    return optax.multi_transform(
        {"galore": _galore_core(inner, rank, update_interval, scale),
         "plain": inner},
        lambda params: jax.tree.map(
            lambda x: "galore" if _galore_eligible(x, rank) else "plain",
            params))


def _galore_core(
    inner: optax.GradientTransformation,
    rank: int,
    update_interval: int,
    scale: float,
) -> optax.GradientTransformation:
    """The projected path; every leaf it sees is 2D and > rank."""

    def project_matrix(g):
        """SVD-refreshed orthonormal basis (proj_type='std': project the
        SHORTER side, like the galore_torch reference)."""
        m, n = g.shape
        if m <= n:
            u, _, _ = jnp.linalg.svd(g.astype(jnp.float32), full_matrices=False)
            return u[:, :rank]                     # [m, r] left basis
        _, _, vt = jnp.linalg.svd(g.astype(jnp.float32), full_matrices=False)
        return vt[:rank, :].T                      # [n, r] right basis

    def down(g, p):
        m, n = g.shape
        if m <= n:
            return p.T.astype(g.dtype) @ g         # [r, n]
        return g @ p.astype(g.dtype)               # [m, r]

    def up(u, p, like):
        m, n = like.shape
        if m <= n:
            return p.astype(u.dtype) @ u
        return u @ p.T.astype(u.dtype)

    def init(params):
        proj = jax.tree.map(lambda x: project_matrix(jnp.zeros_like(x)),
                            params)
        projected = jax.tree.map(down, params, proj)
        return GaLoreState(count=jnp.zeros((), jnp.int32),
                           proj=proj, inner=inner.init(projected))

    def update(grads, state, params=None):
        refresh = (state.count % update_interval) == 0
        proj = jax.tree.map(
            lambda g, p: jax.lax.cond(refresh,
                                      lambda: project_matrix(g), lambda: p),
            grads, state.proj)
        low = jax.tree.map(down, grads, proj)
        low_updates, inner_state = inner.update(low, state.inner, None)
        updates = jax.tree.map(
            lambda u, p, g: (scale * up(u, p, g)).astype(g.dtype),
            low_updates, proj, grads)
        return updates, GaLoreState(count=state.count + 1, proj=proj,
                                    inner=inner_state)

    return optax.GradientTransformation(init, update)


def scale_lora_b(ratio: float) -> optax.GradientTransformation:
    """LoRA+ (trainer_utils.py:271-305): LoRA 'b' matrices step `ratio`x
    faster than 'a'. Keyed off the trainable-bundle path: any leaf whose
    path contains a 'lora' segment and ends in 'b'."""

    def is_lora_b(path) -> bool:
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        return any("lora" in str(k) for k in keys) and keys[-1] == "b"

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        updates = jax.tree_util.tree_map_with_path(
            lambda path, u: u * ratio if is_lora_b(path) else u, updates)
        return updates, state

    return optax.GradientTransformation(init, update)


class BAdamState(NamedTuple):
    count: jnp.ndarray


def badam(n_blocks: int = 4, switch_interval: int = 50,
          start_block: int = 0) -> optax.GradientTransformation:
    """Layer-mode BAdam (trainer_utils.py:330-352): leaves are
    partitioned round-robin into `n_blocks` groups by tree order; only
    the active block's updates pass through, cycling every
    `switch_interval` steps ('ascending' switch mode)."""

    def init(params):
        return BAdamState(count=jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        active = (start_block + state.count // switch_interval) % n_blocks
        leaves, treedef = jax.tree.flatten(updates)
        gated = [jnp.where(i % n_blocks == active, leaf, jnp.zeros_like(leaf))
                 for i, leaf in enumerate(leaves)]
        return (jax.tree.unflatten(treedef, gated),
                BAdamState(count=state.count + 1))

    return optax.GradientTransformation(init, update)


def build_custom_optimizer(args, schedule,
                           finetuning_args) -> optax.GradientTransformation:
    """create_custom_optimzer analog (trainer_utils.py:369-381): builds
    the AdamW-family chain with the factory flags from FinetuningArguments.

    GaLore wraps a decay-free Adam core; decoupled weight decay applies
    at FULL rank after the back-projection (GaLoreAdamW semantics), and
    the learning-rate scale comes last so LoRA+ can rescale per-leaf."""
    adam_core = optax.scale_by_adam(
        b1=args.adam_beta1, b2=args.adam_beta2, eps=args.adam_epsilon)
    if getattr(finetuning_args, "use_galore", False):
        core = galore(adam_core,
                      rank=finetuning_args.galore_rank,
                      update_interval=finetuning_args.galore_update_interval,
                      scale=finetuning_args.galore_scale)
    else:
        core = adam_core
    parts = [core]
    if args.weight_decay:
        parts.append(optax.add_decayed_weights(args.weight_decay))
    if getattr(finetuning_args, "use_badam", False):
        parts.append(badam(
            n_blocks=max(finetuning_args.badam_n_blocks, 1),
            switch_interval=finetuning_args.badam_switch_interval,
            start_block=finetuning_args.badam_start_block))
    ratio = getattr(finetuning_args, "loraplus_lr_ratio", None)
    if ratio:
        parts.append(scale_lora_b(ratio))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def wants_custom_optimizer(finetuning_args) -> bool:
    return bool(finetuning_args is not None and (
        getattr(finetuning_args, "use_galore", False)
        or getattr(finetuning_args, "use_badam", False)
        or getattr(finetuning_args, "loraplus_lr_ratio", None)))
