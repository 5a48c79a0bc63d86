"""llamole_tpu — a TPU-native (JAX/XLA/Pallas) framework for multimodal
inverse molecular design with retrosynthetic planning.

Re-designed from scratch with the capabilities of the Llamole reference
(liugangcode/Llamole): a base LLM with LoRA + three graph modules
(GraphDiT diffusion decoder, GraphCLIP GIN encoder, GIN retro predictor)
joined by MLP connectors, plus an A*-style retrosynthesis planner.

Layering (bottom-up):
  utils/    logging, constants, registries
  config/   argument dataclasses + YAML/CLI parsing
  chem/     host-side chemistry runtime (SMILES, valence, fingerprints)
  ops/      Pallas kernels + dense graph ops
  parallel/ device mesh + sharding rules
  models/   JAX model definitions (LLM, GraphDiT, GIN encoder/predictor)
  data/     MolQA data pipeline (aligner, processor, collator, templates)
  train/    optax training loop (mmsft)
  eval/     MolQA two-phase evaluation
  planner/  Retro*-style AND-OR search (host-side, dependency-injected)
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API: the convenient names without paying their
    import cost (jax tracing, chemkit build) at `import llamole_tpu`.

        GraphLM, GenerationSettings   models.composite
        build_graph_lm                models.loader
        DesignServer, ContinuousDesignServer, serve_jsonl, serve_tcp
                                      serve
        run_mmsft / run_eval          train.workflow / eval.workflow
    """
    lazy = {
        "GraphLM": ("llamole_tpu.models.composite", "GraphLM"),
        "GenerationSettings": ("llamole_tpu.models.composite",
                               "GenerationSettings"),
        "build_graph_lm": ("llamole_tpu.models.loader", "build_graph_lm"),
        "DesignServer": ("llamole_tpu.serve", "DesignServer"),
        "ContinuousDesignServer": ("llamole_tpu.serve",
                                   "ContinuousDesignServer"),
        "serve_jsonl": ("llamole_tpu.serve", "serve_jsonl"),
        "serve_tcp": ("llamole_tpu.serve", "serve_tcp"),
        "run_mmsft": ("llamole_tpu.train.workflow", "run_mmsft"),
        "run_eval": ("llamole_tpu.eval.workflow", "run_eval"),
    }
    if name in lazy:
        import importlib
        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'llamole_tpu' has no attribute {name!r}")
