"""Misc parity utilities (reference: src/extras/misc.py, env.py)."""

import platform
import sys
from typing import Any, Dict, Tuple

import jax
import numpy as np


def count_parameters(params: Any) -> Tuple[int, int]:
    """(trainable?, all) — with functional pytrees every leaf counts as
    trainable when it sits in the trainable bundle; callers pass the
    bundles separately (misc.py:87 analog)."""
    total = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params)
                if hasattr(x, "shape"))
    return total, total


def get_current_device() -> str:
    """Primary accelerator description (misc.py:116 analog)."""
    d = jax.devices()[0]
    return f"{d.platform}:{d.id} ({d.device_kind})"


def env_info() -> Dict[str, str]:
    """Environment dump (extras/env.py:32-75 analog)."""
    import llamole_tpu
    info = {
        "llamole_tpu": llamole_tpu.__version__,
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "jax": jax.__version__,
        "devices": ", ".join(str(d) for d in jax.devices()),
        "default_backend": jax.default_backend(),
    }
    try:
        from ..chem import _native
        info["chemkit_native"] = str(_native.available())
    except Exception:
        info["chemkit_native"] = "False"
    return info


def print_supervised_dataset_example(example: Dict, tokenizer) -> None:
    """Debug dump of one encoded record
    (mmsupervised.py:316-335 parity)."""
    from .constants import IGNORE_INDEX
    valid_labels = [t for t in example["labels"] if t != IGNORE_INDEX]
    print("input_ids:\n{}".format(example["input_ids"]))
    print("inputs:\n{}".format(
        tokenizer.decode(example["input_ids"], skip_special_tokens=False)))
    print("label_ids:\n{}".format(example["labels"]))
    print("labels:\n{}".format(
        tokenizer.decode(valid_labels, skip_special_tokens=False)))
    print("molecule_ids:\n{}".format(example.get("molecule_ids")))
    print("molecule_properties:\n{}".format(example.get("molecule_properties")))
    print("retro_labels:\n{}".format(example.get("retro_labels")))
    print("retro_product_ids:\n{}".format(example.get("retro_product_ids")))
