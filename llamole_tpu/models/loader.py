"""Model assembly from config args.

Counterpart of src/model/loader.py:88-364 + GraphLLMForCausalMLM
.from_pretrained (modeling_llamole.py:102-286): build tokenizer, LLM,
three graph modules and the composite, loading local weights when the
given paths exist and falling back to documented-default random init
otherwise (this environment has no network; the reference auto-downloads
from HF at the same points).
"""

import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import DataArguments, FinetuningArguments, ModelArguments
from ..data.tokenizer import load_tokenizer
from ..utils.constants import SPECIAL_TOKENS
from ..utils.logging import get_logger
from .composite import GraphLM
from .gllm import LLM, LLMConfig
from .graphclip import GraphCLIP, GraphCLIPConfig
from .graphdit import GraphDiT, GraphDiTConfig
from .graphdit.config import build_data_info_from_smiles
from .retro import GraphPredictor, GraphPredictorConfig

logger = get_logger(__name__)

_FALLBACK_SMILES = [
    "CCO", "c1ccccc1", "CC(=O)O", "CCN", "C1CC1", "c1ccncc1",
    "CC(N)C(=O)O", "COC", "CS", "C=CC=C", "CC(=O)Oc1ccccc1C(=O)O",
    "c1cc[nH]c1", "CCCl", "CBr", "CF", "CCCCCC", "C1CCCCC1",
]


def resolve_llm_config(model_args: ModelArguments) -> LLMConfig:
    path = model_args.model_name_or_path or ""
    cfg_file = os.path.join(path, "config.json") if path else ""
    if cfg_file and os.path.exists(cfg_file):
        with open(cfg_file) as f:
            return LLMConfig.from_hf_config(json.load(f))
    name = path.lower()
    if "llama" in name:
        return LLMConfig.llama3_8b()
    if "qwen3" in name:
        return LLMConfig.qwen3_8b()
    if "qwen" in name:
        return LLMConfig.qwen2_7b()
    if "mistral" in name:
        return LLMConfig.mistral_7b()
    if "gemma-3" in name or "gemma3" in name:
        return LLMConfig.gemma3_12b()
    if "gemma" in name:
        return LLMConfig.gemma2_9b()
    logger.warning("No local weights/config for %r — using tiny config "
                   "(random init)", path)
    return LLMConfig.tiny()


def load_llm(model_args: ModelArguments, tokenizer,
             rng: jax.Array) -> Tuple[LLM, Dict]:
    cfg = resolve_llm_config(model_args)
    cfg.vocab_size = max(cfg.vocab_size, tokenizer.vocab_size)
    cfg.shift_attn = bool(getattr(model_args, "shift_attn", False))
    if getattr(model_args, "num_experts", 0) and cfg.num_experts == 0:
        # from-scratch MoE config (checkpoints carry their own value)
        cfg.num_experts = int(model_args.num_experts)
        cfg.num_experts_per_tok = int(model_args.num_experts_per_tok)
    if getattr(model_args, "moe_aux_loss_coef", None) is not None:
        cfg.moe_aux_loss_coef = float(model_args.moe_aux_loss_coef)
    kv_dtype = getattr(model_args, "kv_cache_dtype", "compute") or "compute"
    if kv_dtype not in ("compute", "int8"):
        raise ValueError(f"kv_cache_dtype must be 'compute' or 'int8', "
                         f"got {kv_dtype!r}")
    cfg.kv_cache_dtype = kv_dtype
    dtype = jnp.bfloat16 if model_args.compute_dtype == "bfloat16" else jnp.float32
    llm = LLM(cfg, dtype=dtype)
    path = model_args.model_name_or_path or ""
    params = None
    if path and os.path.isdir(path):
        from .gllm.convert import load_hf_weights
        try:
            params = load_hf_weights(path, cfg, dtype)
            logger.info("Loaded LLM weights from %s", path)
        except FileNotFoundError:
            logger.warning("No safetensors under %s; random init", path)
    if params is None:
        params = llm.init(rng)
    if getattr(model_args, "scan_layers", False):
        from .gllm.stacked import stack_layers
        params = stack_layers(params)
        logger.info("LLM params stacked for scan-over-layers")
    qbit = getattr(model_args, "quantization_bit", None)
    scheme = getattr(model_args, "quantization_scheme", "weight_only")
    if scheme not in ("weight_only", "w8a8"):
        raise ValueError(f"quantization_scheme={scheme!r} unsupported "
                         "(weight_only or w8a8)")
    if qbit in (4, 8):
        from .gllm.quantize import quantize_llm_params
        params = quantize_llm_params(params, bits=qbit,
                                     act_int8=(scheme == "w8a8"))
        logger.info("LLM projections quantized to int%d (%s)", qbit, scheme)
    elif scheme == "w8a8":
        raise ValueError("quantization_scheme=w8a8 requires "
                         "quantization_bit=8")
    elif qbit is not None:
        raise ValueError(
            f"quantization_bit={qbit} unsupported (4 or 8; the reference's "
            "bnb 2/3-bit and gptq/awq loaders are GPU-library paths, "
            "model_utils/quantization.py:102-205)")
    return llm, params


def load_graph_decoder(model_args, rng) -> Tuple[GraphDiT, Dict]:
    path = model_args.graph_decoder_path
    stride = getattr(model_args, "diffusion_sampling_steps", None)
    if path and os.path.exists(os.path.join(path, "model.msgpack")):
        model, params = GraphDiT.from_pretrained(path)
        if stride:
            model.cfg.sampling_steps = stride
        return model, params
    logger.warning("graph_decoder_path missing (%s); tiny random init", path)
    info = build_data_info_from_smiles(_FALLBACK_SMILES, max_n_nodes=16)
    cfg = GraphDiTConfig(hidden_size=64, depth=2, num_heads=4,
                         diffusion_steps=20, text_dim=768,
                         sampling_steps=stride)
    model = GraphDiT(cfg, info)
    return model, model.init(rng)


_FALLBACK_TEMPLATES = {
    # crude generic disconnections so random-init smoke runs can propose
    # reactions (real deployments load the trained template library)
    0: "[C:1](=[O:2])-[O:3]-[C:4]>>[C:1](=[O:2])-[OH].[OH]-[C:4]",
    1: "[C:1](=[O:2])-[NH:3]>>[C:1](=[O:2])-[OH].[NH2:3]",
    2: "[c:1]-[O:2]-[CH3;D1:3]>>[c:1]-[OH:2].[CH3:3]-I",
    3: "[C:1]-[OH;D1:2]>>[C:1]=[O:2]",
    4: "[c:1]-[Br;D1:2]>>[c:1].[Br:2]",
    5: "[C:1]-[C:2]-[OH;D1:3]>>[C:1]=[C:2].[OH2:3]",
}


def make_fallback_predictor(num_layer: int = 2, hidden_size: int = 64,
                            out_dim: int = 16,
                            text_input_size: int = 768) -> GraphPredictor:
    """Random-init predictor wired with the built-in generic template
    table + purchasable set — the smoke/bench stand-in for the trained
    GNNPredictor checkpoint (public: bench.py and tests reuse it)."""
    cfg = GraphPredictorConfig(num_layer=num_layer, hidden_size=hidden_size,
                               out_dim=out_dim,
                               text_input_size=text_input_size)
    return GraphPredictor(cfg, label_to_template=dict(_FALLBACK_TEMPLATES),
                          available=list(_FALLBACK_SMILES))


def load_graph_predictor(model_args, rng) -> Tuple[GraphPredictor, Dict]:
    path = model_args.graph_predictor_path
    if path and os.path.exists(os.path.join(path, "model.msgpack")):
        return GraphPredictor.from_pretrained(path)
    logger.warning("graph_predictor_path missing (%s); tiny random init", path)
    model = make_fallback_predictor()
    return model, model.init(rng)


def load_graph_encoder(model_args, rng) -> Tuple[GraphCLIP, Dict]:
    path = model_args.graph_encoder_path
    if path and os.path.exists(os.path.join(path, "model.msgpack")):
        return GraphCLIP.from_pretrained(path)
    logger.warning("graph_encoder_path missing (%s); tiny random init", path)
    model = GraphCLIP(GraphCLIPConfig(num_layer=2, hidden_size=64))
    return model, model.init(rng)


def resolve_adapter_dir(adapter_dir: str) -> str:
    """A trained-adapter dir, or — when the run died before its final
    save — the newest committed checkpoint-N inside it. Periodic
    checkpoint-N dirs carry the same save_pretrained layout as the final
    save (train/workflow.py save_fn), so evals can always resume from
    whatever the trainer last committed (parser.py:267-283 analog)."""
    if os.path.isdir(os.path.join(adapter_dir, "connector")):
        return adapter_dir
    from ..train.trainer import find_last_checkpoint
    ckpt = find_last_checkpoint(adapter_dir)
    if ckpt is None or not os.path.isdir(os.path.join(ckpt, "connector")):
        raise FileNotFoundError(
            f"no trained weights under {adapter_dir}: neither a final "
            "save (connector/) nor a committed checkpoint-N")
    logger.info("adapter dir has no final save; using %s", ckpt)
    return ckpt


def build_graph_lm(
    model_args: ModelArguments,
    data_args: DataArguments,
    finetuning_args: FinetuningArguments,
    seed: int = 0,
    generate_mode: bool = False,
    load_adapter: bool = False,
) -> Tuple[GraphLM, Dict, Dict, Any]:
    """Returns (model, frozen_params, trainable_params, tokenizer)."""
    tokenizer = load_tokenizer(model_args, generate_mode=generate_mode)
    keys = jax.random.split(jax.random.PRNGKey(seed), 6)
    llm, llm_params = load_llm(model_args, tokenizer, keys[0])
    graph_decoder, gd_params = load_graph_decoder(model_args, keys[1])
    graph_predictor, gp_params = load_graph_predictor(model_args, keys[2])
    graph_encoder, ge_params = load_graph_encoder(model_args, keys[3])

    specials = model_args.special_token_list() or SPECIAL_TOKENS
    token_id_dict = {t: tokenizer.token_to_id(t) for t in specials}

    # optional fingerprint->cost value model next to the predictor
    # weights (reference value_model; modeling_llamole.py:891-939)
    cost_mlp = cost_mlp_params = None
    gp_path = model_args.graph_predictor_path
    if gp_path and os.path.exists(os.path.join(gp_path,
                                               "cost_model.msgpack")):
        from .retro import CostMLP
        try:
            cost_mlp, cost_mlp_params = CostMLP.from_pretrained(gp_path)
            logger.info("Loaded CostMLP value model from %s", gp_path)
        except ValueError as e:
            # an incompatible sidecar (e.g. legacy/foreign features) must
            # not take down the whole composite build — the planner just
            # runs without the molecule cost term
            logger.warning("Ignoring cost model at %s: %s", gp_path, e)

    model = GraphLM(
        llm=llm, graph_decoder=graph_decoder, graph_predictor=graph_predictor,
        graph_encoder=graph_encoder, tokenizer=tokenizer,
        token_id_dict=token_id_dict,
        num_body_tokens=data_args.learned_query_size,
        loss_weight_lm=finetuning_args.loss_weight_lm,
        loss_weight_design=finetuning_args.loss_weight_design,
        loss_weight_retro=finetuning_args.loss_weight_retro,
        lora_rank=finetuning_args.lora_rank,
        lora_alpha=finetuning_args.lora_alpha,
        finetuning_type=finetuning_args.finetuning_type,
        use_rslora=getattr(finetuning_args, "use_rslora", False),
        use_dora=getattr(finetuning_args, "use_dora", False),
        pissa=getattr(finetuning_args, "pissa_init", False),
        cost_mlp=cost_mlp,
        cost_mlp_params=cost_mlp_params,
    )
    frozen = {
        "llm": llm_params,
        "graph_decoder": gd_params,
        "graph_predictor": gp_params,
        "graph_encoder": ge_params,
    }
    if load_adapter and model_args.adapter_name_or_path:
        adapter_dir = model_args.adapter_name_or_path
        if isinstance(adapter_dir, (list, tuple)):
            adapter_dir = adapter_dir[0]
        adapter_dir = resolve_adapter_dir(adapter_dir)
        trainable = model.load_trainable(adapter_dir)
        logger.info("Loaded adapter + connectors from %s", adapter_dir)
        if "llm" in trainable:
            frozen.pop("llm", None)
    else:
        trainable = model.init_trainable(keys[4], frozen)
    # Disk-loaded trees (msgpack/safetensors) come back as NUMPY: left
    # that way, every jitted call re-uploads them host->device — over the
    # axon tunnel that turns a ~50 ms train step into seconds (measured,
    # r5 mmsft). Commit both trees once; mesh users re-place afterwards.
    frozen = jax.device_put(frozen)
    trainable = jax.device_put(trainable)
    if model.cost_mlp_params is not None:
        model.cost_mlp_params = jax.device_put(model.cost_mlp_params)
    return model, frozen, trainable, tokenizer
