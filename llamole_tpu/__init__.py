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
