"""CLI entry point — thin shim over llamole_tpu.cli (the installed
`llamole` console script). Kept so `python main.py ...` works from a
repo checkout exactly as the reference's main.py does."""

from llamole_tpu.cli import USAGE, download_data, main, run_pretrain

__all__ = ["USAGE", "download_data", "main", "run_pretrain"]

if __name__ == "__main__":
    main()
