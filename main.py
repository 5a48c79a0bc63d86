"""CLI entry point (parity: reference main.py:26-66).

Usage:
    python main.py train  config/train/llama_lora.yaml
    python main.py eval   config/generate/llama_drug.yaml
    python main.py export config/export.yaml
"""

import sys


USAGE = "usage: python main.py {train|eval|export} <config.yaml>"


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(USAGE)
    command = sys.argv.pop(1)
    if command == "train":
        from llamole_tpu.train.workflow import run_mmsft
        run_mmsft(sys.argv[1] if len(sys.argv) > 1 else None)
    elif command == "eval":
        from llamole_tpu.eval.workflow import run_molqa
        run_molqa(sys.argv[1] if len(sys.argv) > 1 else None)
    elif command == "export":
        from llamole_tpu.train.export import merge_adapter
        merge_adapter(sys.argv[1] if len(sys.argv) > 1 else None)
    else:
        raise SystemExit(f"unknown command {command!r}\n{USAGE}")


if __name__ == "__main__":
    main()
