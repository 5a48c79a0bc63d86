"""Persistent XLA compilation cache.

First compile over the axon tunnel costs 20-40s per program; the cache
makes repeat CLI invocations (train/eval/bench) start warm. Enabled by
entry points via enable_compilation_cache(); opt out with
LLAMOLE_NO_COMPILE_CACHE=1 or redirect with LLAMOLE_COMPILE_CACHE_DIR.
"""

import os

_DEFAULT = os.path.expanduser("~/.cache/llamole_tpu/xla")


def enable_compilation_cache() -> None:
    if os.environ.get("LLAMOLE_NO_COMPILE_CACHE"):
        return
    # silence the spurious per-entry machine-feature mismatch E-logs on
    # AOT cache loads (see tests/conftest.py) — only effective when set
    # before jaxlib loads, harmless otherwise
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import jax
    cache_dir = os.environ.get("LLAMOLE_COMPILE_CACHE_DIR", _DEFAULT)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — older jax knob names
        pass
