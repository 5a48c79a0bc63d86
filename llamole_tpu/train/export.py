"""Adapter export: merge LoRA into base weights and save
(parity: src/train/tuner.py:40-115 merge_adapter)."""

import os
from typing import Any

from ..config import get_infer_args
from ..models.loader import build_graph_lm
from ..utils.logging import get_logger
from ..utils.serialization import save_pytree

logger = get_logger(__name__)


def merge_adapter(args: Any = None, export_dir: str = None) -> str:
    model_args, data_args, training_args, finetuning_args, _ = get_infer_args(args)
    export_dir = export_dir or getattr(model_args, "export_dir", None)
    if export_dir is None:
        if isinstance(args, dict):
            export_dir = args.get("export_dir")
        if export_dir is None:
            raise ValueError("export_dir is required for export.")

    model, frozen, trainable, tokenizer = build_graph_lm(
        model_args, data_args, finetuning_args,
        load_adapter=bool(model_args.adapter_name_or_path))

    from ..models.gllm import merge_lora
    merged = merge_lora(frozen["llm"], trainable["lora"], model.lora_scale)
    os.makedirs(export_dir, exist_ok=True)
    save_pytree(merged, os.path.join(export_dir, "model.msgpack"))
    model.save_pretrained(trainable, export_dir)

    # HF-format checkpoint alongside (reference tuner.py:68-103 exports
    # "{export_size}GB"-sharded HF weights): the merged fine-tune flows
    # back into the torch/transformers ecosystem directly
    from ..models.gllm.convert import export_hf_weights
    export_hf_weights(merged, model.llm.cfg, export_dir,
                      shard_gb=float(getattr(model_args, "export_size", 5)))
    if hasattr(tokenizer, "save_pretrained"):
        tokenizer.save_pretrained(export_dir)
    logger.info("Merged model exported to %s", export_dir)
    return export_dir
