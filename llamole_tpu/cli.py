"""CLI dispatcher (parity: reference main.py:26-66).

Installed as the `llamole` console script; the repo-root main.py is a
thin shim over this module so `python main.py ...` keeps working.

Usage:
    python main.py train  config/train/llama_lora.yaml
    python main.py eval   config/generate/llama_drug.yaml
    python main.py export config/export.yaml
    python main.py serve  config/generate/llama_drug.yaml
    python main.py pretrain {graphdit|predictor|cost_mlp|graphclip|oracle}
                   <corpus.json> <output_dir> [key=value ...]
    python main.py download_data

`pretrain` is beyond-reference surface: the reference ships its graph
modules pretrained with no training code (loader.py:226-331
auto-downloads); here every module is trainable from a MolQA corpus.
"""

import sys


USAGE = ("usage: python main.py {train|eval|export|serve|pretrain|"
         "parity|validate_data|env|download_data} <config.yaml>")


def run_parity_cli(argv) -> None:
    """`python main.py parity --ckpt-dir ckpt/ [...]` — the one-command
    12-metric parity eval (eval/parity.py; runbook §§2-4 collapsed)."""
    import argparse

    from llamole_tpu.eval.parity import run_parity
    p = argparse.ArgumentParser(prog="llamole parity", description=(
        "Convert reference checkpoints, run the two-phase MolQA eval "
        "with the reference budgets, emit the 12-metric parity table."))
    p.add_argument("--ckpt-dir", help="directory holding the reference "
                   "HF checkout(s); kinds are discovered by content")
    p.add_argument("--base-llm", help="HF safetensors dir of the base LLM")
    p.add_argument("--graphdit")
    p.add_argument("--encoder")
    p.add_argument("--predictor")
    p.add_argument("--adapter")
    p.add_argument("--oracle", help="trained property-oracle dir")
    p.add_argument("--oracle-corpus", help="MolQA corpus to train the "
                   "property oracle on (when --oracle is absent)")
    p.add_argument("--dataset", default="molqa_drug_examples")
    p.add_argument("--dataset-dir", default="data")
    p.add_argument("--out", default="saves/parity")
    p.add_argument("--records", type=int, default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--template", default="default")
    p.add_argument("--iterations", type=int, default=100)
    p.add_argument("--topk", type=int, default=50)
    p.add_argument("--max-planning-time", type=float, default=30.0)
    args = p.parse_args(argv)
    if not args.ckpt_dir and not (args.graphdit and args.encoder
                                  and args.predictor):
        p.error("pass --ckpt-dir or explicit --graphdit/--encoder/"
                "--predictor paths")
    run_parity(
        args.ckpt_dir, base_llm=args.base_llm, graphdit=args.graphdit,
        encoder=args.encoder, predictor=args.predictor,
        adapter=args.adapter, oracle=args.oracle,
        oracle_corpus=args.oracle_corpus, dataset=args.dataset,
        dataset_dir=args.dataset_dir, output_dir=args.out,
        records=args.records, batch_size=args.batch,
        template=args.template, expansion_topk=args.topk,
        iterations=args.iterations,
        max_planning_time=args.max_planning_time)


def run_pretrain(argv) -> None:
    """Dispatch `python main.py pretrain <kind> <corpus> <outdir>
    [key=value ...]` — extra args pass through as typed kwargs
    (steps=500 batch_size=16 learning_rate=3e-4 ...)."""
    from llamole_tpu.train import pretrain as pt
    kinds = {"graphdit": pt.pretrain_graphdit,
             "predictor": pt.pretrain_predictor,
             "cost_mlp": pt.pretrain_cost_mlp,
             "graphclip": pt.pretrain_graphclip,
             "oracle": pt.pretrain_property_oracle}
    if len(argv) < 3 or argv[0] not in kinds:
        raise SystemExit(
            "usage: python main.py pretrain "
            f"{{{'|'.join(sorted(kinds))}}} <corpus.json> <output_dir> "
            "[key=value ...]")
    kind, corpus, outdir, *rest = argv
    kwargs = {}
    for item in rest:
        if "=" not in item:
            raise SystemExit(f"expected key=value, got {item!r}")
        key, value = item.split("=", 1)
        try:
            kwargs[key] = int(value)
        except ValueError:
            try:
                kwargs[key] = float(value)
            except ValueError:
                kwargs[key] = value
    metrics = kinds[kind](corpus, outdir, **kwargs)
    print(metrics)


def download_data() -> None:
    """Fetch the full MolQA dataset (parity: reference main.py download_data
    pulls liuganghuggingface/Llamole-MolQA from the HF hub). Falls back to
    the shipped synthetic examples in offline environments."""
    import os
    target = os.path.join("data")
    try:
        from huggingface_hub import snapshot_download
        snapshot_download(repo_id="liuganghuggingface/Llamole-MolQA",
                          repo_type="dataset", local_dir=target)
        print(f"MolQA downloaded to {target}/")
    except Exception as e:
        print(f"Download unavailable ({e}).")
        print("Offline fallback: regenerate the synthetic examples with "
              "`python scripts/make_example_data.py` — dataset names "
              "molqa_{train,drug,material}_examples work immediately.")


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(USAGE)
    from llamole_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    command = sys.argv.pop(1)
    if command == "train":
        from llamole_tpu.train.workflow import run_mmsft
        run_mmsft(sys.argv[1] if len(sys.argv) > 1 else None)
    elif command == "eval":
        from llamole_tpu.eval.workflow import run_eval
        run_eval(sys.argv[1] if len(sys.argv) > 1 else None)
    elif command == "export":
        from llamole_tpu.train.export import merge_adapter
        merge_adapter(sys.argv[1] if len(sys.argv) > 1 else None)
    elif command == "serve":
        # JSONL request/response loop over stdin/stdout, or TCP with
        # --tcp [PORT] (batched design serving — llamole_tpu/serve.py)
        args = sys.argv[1:]
        if "--tcp" in args:
            i = args.index("--tcp")
            port = 7733
            if i + 1 < len(args) and args[i + 1].isdigit():
                port = int(args.pop(i + 1))
            args.pop(i)
            from llamole_tpu.serve import serve_tcp
            serve_tcp(args[0] if args else None, port=port)
        else:
            from llamole_tpu.serve import serve_jsonl
            serve_jsonl(args[0] if args else None)
    elif command == "pretrain":
        run_pretrain(sys.argv[1:])
    elif command == "parity":
        run_parity_cli(sys.argv[1:])
    elif command == "validate_data":
        # MolQA corpus preflight (run before training on real data —
        # scripts/REAL_WEIGHTS_RUNBOOK.md step 0)
        import json as _json
        from llamole_tpu.data.validate import validate_molqa
        if len(sys.argv) < 2:
            raise SystemExit("usage: python main.py validate_data "
                             "<corpus.json>")
        report = validate_molqa(sys.argv[1])
        print(_json.dumps(report, indent=1))
        if not report["ok"]:
            raise SystemExit(2)
    elif command == "env":
        # environment dump for bug reports (reference extras/env.py:32-75)
        from llamole_tpu.utils.misc import env_info
        for key, value in env_info().items():
            print(f"{key}: {value}")
    elif command == "download_data":
        download_data()
    else:
        raise SystemExit(f"unknown command {command!r}\n{USAGE}")


if __name__ == "__main__":
    main()
