"""The checked-in XLA compilation-cache seed must match the installed
jaxlib (ADVICE r4: cache keys embed jaxlib version + flags, so a jax
upgrade silently turns the ~15 MB fixture into dead repo weight while
the fast lane quietly runs cold). This canary fails loudly instead;
SEED_INFO.json documents the regeneration recipe."""

import json
import os

import jaxlib

_SEED_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "fixtures", "xla_cache_seed")


def test_seed_matches_installed_jaxlib():
    with open(os.path.join(_SEED_DIR, "SEED_INFO.json")) as f:
        info = json.load(f)
    assert info["jaxlib_version"] == jaxlib.__version__, (
        f"xla_cache_seed was generated under jaxlib "
        f"{info['jaxlib_version']} but {jaxlib.__version__} is installed: "
        f"every seeded entry now misses. Regenerate the snapshot "
        f"(recipe in SEED_INFO.json) or prune the fixture.")


def test_seed_has_entries():
    entries = [f for f in os.listdir(_SEED_DIR) if f.endswith("-cache")]
    assert len(entries) > 50, "seed fixture unexpectedly empty"
