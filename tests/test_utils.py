"""Utility module tests: misc, profiling, serialization, cache."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from llamole_tpu.utils.misc import count_parameters, env_info, get_current_device
from llamole_tpu.utils.profiling import PhaseTimer, trace
from llamole_tpu.utils.serialization import (
    load_pytree,
    load_state,
    save_pytree,
    save_state,
)


def test_count_parameters():
    params = {"a": jnp.ones((3, 4)), "b": {"c": jnp.ones((5,))}}
    trainable, total = count_parameters(params)
    assert trainable == total == 17


def test_env_info_keys():
    info = env_info()
    assert {"llamole_tpu", "jax", "devices", "chemkit_native"} <= set(info)
    assert "cpu" in get_current_device() or "tpu" in get_current_device()


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] >= 0


def test_trace_noop_without_dir():
    with trace(None):
        pass  # must be a clean no-op


def test_serialization_roundtrip(tmp_path):
    tree = {"x": jnp.arange(6).reshape(2, 3), "y": {"z": jnp.ones(4)}}
    save_pytree(tree, str(tmp_path / "t.msgpack"))
    back = load_pytree(str(tmp_path / "t.msgpack"))
    np.testing.assert_array_equal(np.asarray(back["x"]), np.arange(6).reshape(2, 3))
    # tuple-bearing state
    state = ({"m": jnp.zeros(3)}, (jnp.ones(2), {"n": jnp.full(1, 7.0)}))
    save_state(state, str(tmp_path / "s.msgpack"))
    restored = load_state(state, str(tmp_path / "s.msgpack"))
    np.testing.assert_array_equal(np.asarray(restored[1][1]["n"]), [7.0])


def test_compile_cache_opt_out(monkeypatch, tmp_path):
    from llamole_tpu.utils.cache import enable_compilation_cache
    monkeypatch.setenv("LLAMOLE_NO_COMPILE_CACHE", "1")
    enable_compilation_cache()  # must not raise nor create dirs
    monkeypatch.delenv("LLAMOLE_NO_COMPILE_CACHE")
    monkeypatch.setenv("LLAMOLE_COMPILE_CACHE_DIR", str(tmp_path / "xla"))
    enable_compilation_cache()
    assert (tmp_path / "xla").is_dir()
