#!/usr/bin/env python
"""Train a tiny-but-real Llamole stack end to end and capture the first
learned-weights operating point.

One command, no downloads: synthesizes a verified-solvable MolQA corpus
(data/synthetic.py), pretrains every graph module with the framework's
own pretraining (train/pretrain.py), trains the LLM + connectors with
mmsft (full finetuning of a small from-scratch transformer over the
ByteTokenizer), then runs the reference-protocol two-phase MolQA eval
(eval/workflow.run_molqa: design + per-molecule 30 s planning wall) and
writes OPERATING_POINT.json with the full metric table.

The reference ships its graph modules pretrained (src/model/loader.py:
226-331 auto-downloads) and trains only the composite; this script is
the offline-complete analog: every weight in the final stack was
learned here.

Usage:
  python scripts/train_tiny_stack.py                 # full run (TPU, ~1 h)
  python scripts/train_tiny_stack.py --tiny          # CPU smoke (~3 min)
  python scripts/train_tiny_stack.py --stages eval   # re-run one stage
"""

import argparse
import json
import os
import sys
import time

# must precede jaxlib load: persistent-cache AOT loads E-log a spurious
# machine-feature mismatch per entry (see tests/conftest.py)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAGES = ["corpus", "graphdit", "predictor", "cost_mlp", "graphclip",
          "oracle", "llm_config", "mmsft", "eval"]


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stack-dir", default="saves/synth-stack")
    p.add_argument("--tiny", action="store_true",
                   help="CPU-smoke sizes (tests use this)")
    p.add_argument("--stages", default=None,
                   help="comma-separated subset of: " + ",".join(STAGES))
    p.add_argument("--train-records", type=int, default=None)
    p.add_argument("--eval-records", type=int, default=None)
    p.add_argument("--epochs", type=float, default=None)
    p.add_argument("--graphdit-steps", type=int, default=None,
                   help="override GraphDiT pretrain steps (validity is "
                        "the metric that rides this knob)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def sizes(tiny: bool):
    """Stage hyperparameters: CPU-smoke vs the real chip run."""
    if tiny:
        return {
            "train_records": 24, "eval_records": 3,
            "graphdit": dict(hidden_size=32, depth=2, num_heads=4,
                             diffusion_steps=12, steps=8, batch_size=8),
            "predictor": dict(hidden_size=32, num_layer=2, steps=8,
                              batch_size=8),
            "cost_mlp": dict(steps=8, batch_size=16),
            "graphclip": dict(steps=8, batch_size=8, hidden_size=32,
                              num_layer=2, text_hash_dim=256),
            "oracle": dict(hidden_size=32, num_layer=2, steps=8,
                           batch_size=8),
            "llm": dict(hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2),
            "mmsft": dict(cutoff_len=256, per_device_train_batch_size=2,
                          num_train_epochs=1.0, max_steps=2,
                          learning_rate=1e-3),
            "eval": dict(per_device_eval_batch_size=2, max_new_tokens=16,
                         expansion_topk=10, iterations=3,
                         max_planning_time=3.0),
        }
    return {
        "train_records": 2000, "eval_records": 64,
        "graphdit": dict(hidden_size=256, depth=6, num_heads=8,
                         diffusion_steps=100, steps=4000, batch_size=64,
                         learning_rate=2e-4),
        "predictor": dict(hidden_size=128, num_layer=3, steps=2000,
                          batch_size=64),
        "cost_mlp": dict(steps=600, batch_size=128),
        "graphclip": dict(steps=1200, batch_size=64),
        "oracle": dict(hidden_size=128, num_layer=3, steps=2000,
                       batch_size=64),
        "llm": dict(hidden_size=256, intermediate_size=768,
                    num_hidden_layers=6, num_attention_heads=8,
                    num_key_value_heads=4),
        "mmsft": dict(cutoff_len=1024, per_device_train_batch_size=8,
                      num_train_epochs=8.0, learning_rate=3e-4),
        # reference eval budgets (src/eval/workflow.py:172-173)
        "eval": dict(per_device_eval_batch_size=8, max_new_tokens=256,
                     expansion_topk=50, iterations=100,
                     max_planning_time=30.0),
    }


def main():
    args = parse_args()
    import jax
    if args.tiny and not os.environ.get("LLAMOLE_STACK_DEVICE"):
        # smoke runs pin CPU (the axon tunnel pays 20-40 s per compile;
        # tests and CI boxes have no chip anyway)
        jax.config.update("jax_platforms", "cpu")
    from llamole_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    cfg = sizes(args.tiny)
    if args.train_records:
        cfg["train_records"] = args.train_records
    if args.eval_records:
        cfg["eval_records"] = args.eval_records
    if args.epochs:
        cfg["mmsft"]["num_train_epochs"] = args.epochs
    if args.graphdit_steps:
        cfg["graphdit"]["steps"] = args.graphdit_steps
    run_stages = (args.stages.split(",") if args.stages else STAGES)
    for s in run_stages:
        if s not in STAGES:
            raise SystemExit(f"unknown stage {s!r} (known: {STAGES})")

    d = os.path.abspath(args.stack_dir)
    data_dir = os.path.join(d, "data")
    corpus_train = os.path.join(data_dir, "corpus_train.json")
    corpus_eval = os.path.join(data_dir, "corpus_eval.json")
    paths = {k: os.path.join(d, k) for k in
             ("graphdit", "predictor", "graphclip", "oracle", "llm",
              "mmsft", "eval")}
    report = {"tiny": bool(args.tiny), "stack_dir": d, "stages": {}}
    report_path = os.path.join(d, "OPERATING_POINT.json")
    if os.path.exists(report_path):
        with open(report_path) as f:
            try:
                report = json.load(f)
            except ValueError:
                pass
        report["tiny"] = bool(args.tiny)

    def record(stage, metrics, t0):
        metrics = dict(metrics or {})
        metrics["wall_s"] = round(time.time() - t0, 1)
        report["stages"][stage] = metrics
        os.makedirs(d, exist_ok=True)
        with open(report_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"[stack] {stage}: {metrics}", flush=True)

    # ---- 1. corpus -------------------------------------------------------
    if "corpus" in run_stages:
        t0 = time.time()
        from llamole_tpu.data.synthetic import write_corpus
        m_train = write_corpus(corpus_train, cfg["train_records"],
                               seed=args.seed)
        m_eval = write_corpus(corpus_eval, cfg["eval_records"],
                              seed=args.seed + 100)
        record("corpus", {"train": m_train, "eval": m_eval}, t0)

    # ---- 2-6. graph-module pretraining ------------------------------------
    if "graphdit" in run_stages:
        t0 = time.time()
        from llamole_tpu.train.pretrain import pretrain_graphdit
        m = pretrain_graphdit(corpus_train, paths["graphdit"],
                              seed=args.seed, **cfg["graphdit"])
        record("graphdit", m, t0)
    if "predictor" in run_stages:
        t0 = time.time()
        from llamole_tpu.train.pretrain import pretrain_predictor
        m = pretrain_predictor(corpus_train, paths["predictor"],
                               seed=args.seed, **cfg["predictor"])
        record("predictor", m, t0)
    if "cost_mlp" in run_stages:
        t0 = time.time()
        from llamole_tpu.train.pretrain import pretrain_cost_mlp
        # cost model rides the predictor dir: build_graph_lm discovers
        # cost_model.msgpack next to the predictor weights
        m = pretrain_cost_mlp(corpus_train, paths["predictor"],
                              seed=args.seed, **cfg["cost_mlp"])
        record("cost_mlp", m, t0)
    if "graphclip" in run_stages:
        t0 = time.time()
        from llamole_tpu.train.pretrain import pretrain_graphclip
        m = pretrain_graphclip(corpus_train, paths["graphclip"],
                               seed=args.seed, **cfg["graphclip"])
        record("graphclip", m, t0)
    if "oracle" in run_stages:
        t0 = time.time()
        from llamole_tpu.train.pretrain import pretrain_property_oracle
        m = pretrain_property_oracle(corpus_train, paths["oracle"],
                                     seed=args.seed, **cfg["oracle"])
        record("oracle", m, t0)

    # ---- 7. from-scratch LLM config ---------------------------------------
    if "llm_config" in run_stages:
        t0 = time.time()
        os.makedirs(paths["llm"], exist_ok=True)
        llm_cfg = {
            "model_type": "llama",
            "vocab_size": 320,  # ByteTokenizer + specials; loader takes max
            "max_position_embeddings": 2048,
            "rope_theta": 10000.0,
            "rms_norm_eps": 1e-5,
            "tie_word_embeddings": True,
            **cfg["llm"],
        }
        with open(os.path.join(paths["llm"], "config.json"), "w") as f:
            json.dump(llm_cfg, f, indent=1)
        record("llm_config", llm_cfg, t0)

    model_args_common = {
        "model_name_or_path": paths["llm"],
        "graph_decoder_path": paths["graphdit"],
        "graph_predictor_path": paths["predictor"],
        "graph_encoder_path": paths["graphclip"],
    }

    # ---- 8. mmsft: LLM + connectors over the frozen graph modules ----------
    if "mmsft" in run_stages:
        t0 = time.time()
        from llamole_tpu.train.workflow import run_mmsft
        m = run_mmsft({
            **model_args_common,
            "dataset": "corpus_train",
            "dataset_dir": data_dir,
            "template": "default",
            "learned_query_size": 8,
            "do_train": True,
            "output_dir": paths["mmsft"],
            "overwrite_output_dir": True,
            "finetuning_type": "full",
            "gradient_accumulation_steps": 1,
            "lr_scheduler_type": "cosine",
            "warmup_ratio": 0.03,
            "logging_steps": 25,
            "save_steps": 250,  # periodic: sessions can die mid-run
            "val_size": 0.0,
            "plot_loss": True,
            "seed": args.seed,
            **cfg["mmsft"],
        })
        record("mmsft", m, t0)

    # ---- 9. reference-protocol two-phase eval ------------------------------
    if "eval" in run_stages:
        t0 = time.time()
        from llamole_tpu.config import get_infer_args
        from llamole_tpu.eval.workflow import run_molqa
        ev = cfg["eval"]
        infer = get_infer_args({
            **model_args_common,
            "adapter_name_or_path": paths["mmsft"],
            "property_oracle_path": paths["oracle"],
            "dataset": "corpus_eval",
            "dataset_dir": data_dir,
            "template": "default",
            "learned_query_size": 8,
            "do_train": False,
            "output_dir": paths["eval"],
            "per_device_eval_batch_size": ev["per_device_eval_batch_size"],
            "max_new_tokens": ev["max_new_tokens"],
            "temperature": 0.6,
            "top_p": 0.9,
            "finetuning_type": "full",
            "seed": args.seed,
        })
        run_molqa(*infer,
                  expansion_topk=ev["expansion_topk"],
                  iterations=ev["iterations"],
                  max_planning_time=ev["max_planning_time"],
                  share_planning_wall=False)
        with open(os.path.join(paths["eval"], "molqa_results.json")) as f:
            summary = json.load(f)["summary"]
        record("eval", summary, t0)
        print(json.dumps({"operating_point": summary}), flush=True)

    print(f"[stack] report: {report_path}", flush=True)


if __name__ == "__main__":
    main()
