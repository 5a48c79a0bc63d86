"""Single-example interactive pipeline backing the web UI
(parity: src/webui/workflow.py:47-121 — one-off model load +
process_input + generate)."""

from typing import Any, Dict

import jax
import numpy as np

from ..config import get_infer_args
from ..data.template import get_template
from ..eval.dataset import MolQADataset
from ..models.composite import GenerationSettings
from ..models.loader import build_graph_lm
from ..utils.logging import get_logger

logger = get_logger(__name__)


def load_model_and_tokenizer(args: Any = None):
    model_args, data_args, training_args, finetuning_args, generating_args = (
        get_infer_args(args))
    model, frozen, trainable, tokenizer = build_graph_lm(
        model_args, data_args, finetuning_args, generate_mode=True,
        load_adapter=bool(model_args.adapter_name_or_path))
    template = get_template(data_args.template, tokenizer)
    state = {
        "model": model, "frozen": frozen, "trainable": trainable,
        "tokenizer": tokenizer, "template": template,
        "data_args": data_args, "generating_args": generating_args,
    }
    return state


def process_input(state: Dict, instruction: str,
                  property_dict: Dict[str, float]) -> Dict[str, np.ndarray]:
    """One record -> padded prompt batch of size 1
    (parity: webui/workflow.py:60-72)."""
    record = {"instruction": instruction, "input": "",
              "property": property_dict}
    ds = MolQADataset([record], state["tokenizer"], state["template"],
                      state["data_args"].cutoff_len)
    item = ds[0]
    return {k: v[None, ...] for k, v in item.items()}


def generate(state: Dict, batch: Dict[str, np.ndarray], seed: int = 0,
             do_retrosynthesis: bool = True) -> Dict[str, Any]:
    """Fused design + retro generation for one example
    (parity: webui/workflow.py:74-121)."""
    g = state["generating_args"]
    gen = GenerationSettings(
        max_new_tokens=g.max_new_tokens, temperature=g.temperature,
        top_p=g.top_p, do_sample=g.do_sample,
        speculative_tokens=g.speculative_tokens,
        speculative_ngram=g.speculative_ngram)
    return state["model"].generate(
        state["frozen"], state["trainable"], jax.random.PRNGKey(seed),
        batch["input_ids"], batch["attention_mask"],
        molecule_properties=batch["property"],
        do_molecular_design=True, do_retrosynthesis=do_retrosynthesis,
        rollback=True, gen=gen)
