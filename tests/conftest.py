"""Test bootstrap: force CPU with 8 virtual devices so sharding tests
exercise multi-chip layouts without TPU hardware (SURVEY.md §4e).

Note: the env var alone is not enough under the axon TPU plugin; the
explicit config.update is what actually pins the platform.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# must be set BEFORE jaxlib loads: every persistent-cache AOT load
# E-logs a spurious machine-feature mismatch ("+prefer-no-scatter" etc.
# are XLA tuning preferences, not ISA features, so the loader can't
# match them against the host list); hundreds of those lines drown real
# failure output. Python-level errors surface as exceptions regardless.
if not os.environ.get("LLAMOLE_NO_COMPILE_CACHE"):
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache for the test lane (VERDICT r3 item 7:
# the fast lane must stay <5 min from a cold process). XLA:CPU compiles
# of the deep programs (composite train step, spec-decode while loops)
# dominate suite wall time on this 1-core box; caching them on disk
# makes every run after the first start warm. Separate directory from
# the TPU entry-point cache (different platform, different programs).
if not os.environ.get("LLAMOLE_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "LLAMOLE_TEST_COMPILE_CACHE_DIR",
        os.path.expanduser("~/.cache/llamole_tpu/xla-cpu-tests"))
    os.makedirs(_cache_dir, exist_ok=True)
    # cold-box warm start (VERDICT r3 item 7): seed the cache from the
    # checked-in fixture snapshot so the FIRST run on a fresh machine
    # already skips the heavy AOT compiles. Version-mismatched entries
    # just miss (the key embeds jaxlib version + flags) — harmless.
    _seed_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "fixtures", "xla_cache_seed")
    if os.path.isdir(_seed_dir):
        import shutil
        for _f in os.listdir(_seed_dir):
            _dst = os.path.join(_cache_dir, _f)
            if not os.path.exists(_dst):
                try:
                    shutil.copyfile(os.path.join(_seed_dir, _f), _dst)
                except OSError:  # read-only checkout etc. — run cold
                    break
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover — older jax knob names
        pass

# XLA:CPU compilation of the deepest programs (spec-decode double
# while_loop, full composite train step) has segfaulted inside
# backend_compile_and_load on this box — consistent with a recursive
# compiler pass exhausting the default 8 MB stack (the main thread's
# stack grows on demand up to the soft limit).
from llamole_tpu.utils.rlimits import raise_stack_soft_limit  # noqa: E402

raise_stack_soft_limit()

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_jit_mappings_per_module():
    """Prevent vm.max_map_count exhaustion across the full suite.

    Every XLA:CPU compiled program holds ~15-200 small JIT code/data
    mmaps that are never unmapped while the executable stays cached;
    the full suite accumulates past the kernel's 65530 map limit near
    its ~270th test and LLVM segfaults on the failed mmap (diagnosed
    2026-08: /proc/<pid>/maps grew 1.4k -> 53k over half the suite;
    the two observed full-suite SIGSEGVs in backend_compile_and_load
    land exactly where the limit is crossed). clear_caches + gc drops
    the mappings back to baseline (measured 2259 -> 468). Clearing only
    when the count actually climbs keeps cross-module jit-cache hits
    (clearing every module cost the fast lane ~30 s of recompiles)."""
    yield
    try:
        with open("/proc/self/maps") as f:
            n_maps = sum(1 for _ in f)
    except OSError:
        n_maps = 1 << 30  # can't tell — clear defensively
    if n_maps > 30_000:
        import gc

        jax.clear_caches()
        gc.collect()


# ---------------------------------------------------------------------------
# Suite-time budget (VERDICT r2 item 8): the fast lane `-m "not slow"` must
# stay under ~5 min on this 1-core box or it stops being re-run. Every test
# below was measured >5.5s of compile-dominated call time (pytest
# --durations, 2026-08); they are auto-marked slow here so the fast lane
# keeps one curated smoke per subsystem (composite design e2e, spec
# exactness + guard trip, ring attention [2-64-4-16], MoE fwd+aux,
# GraphDiT sampler, predictor, converter, tokenizer) while the full
# suite (`pytest tests/`) still runs everything.
_SLOW_BUDGET = {
    # continuous decoding: slot_reuse (3s) stays as the fast-lane smoke
    "test_continuous.py::test_greedy_parity_with_generate",
    "test_continuous.py::test_oracle_loss_survives_nan_label",
    "test_continuous.py::test_sliding_window_slot_parity",
    "test_oracle.py::test_frechet_graphclip_distance_properties",
    "test_gemma.py::test_gemma1_logit_parity_vs_hf",
    "test_continuous.py::test_fuzz_random_schedules_match_generate",
    "test_continuous.py::test_shared_prefix_parity_and_fallback",
    "test_continuous.py::test_int8_kv_slot_parity",
    "test_continuous.py::test_tp_sharded_slot_decode_parity",
    "test_continuous.py::test_staggered_admission_does_not_change_outputs",
    "test_composite.py::test_three_term_loss",
    "test_llm.py::test_kv_cache_matches_full_forward",
    "test_speculative.py::test_guard_continuation_boundary_stop_matches_scan",
    "test_speculative.py::test_greedy_matches_scan[1-1]",
    "test_pipeline.py::test_pipeline_with_dp",
    "test_quantize.py::test_generation_runs_quantized",
    "test_speculative.py::test_spec_with_rep_penalty_falls_back",
    "test_multichip.py::test_graft_entry_contract",
    "test_moe.py::test_composite_loss_with_moe_llm",
    "test_ring_attention.py::test_ring_is_differentiable",
    "test_composite.py::test_gradients_only_on_trainable",
    "test_finetuning_types.py::test_freeze_trains_connectors_only",
    "test_moe.py::test_tp_and_ep_shardings_coexist",
    "test_moe.py::test_moe_ep_sharded_matches_unsharded",
    "test_fused_attention.py::test_denoiser_train_path_unchanged",
    "test_finetuning_types.py::test_full_trains_llm",
    "test_graphdit.py::test_loss_finite_and_differentiable",
    "test_speculative.py::test_composite_design_with_speculation",
    "test_graphdit.py::test_strided_sampling",
    "test_pipeline.py::test_pipeline_loss_and_grads_match",
    "test_moe.py::test_moe_grads_flow_router_and_experts",
    "test_ring_attention.py::test_ring_respects_padding",
    "test_finetuning_types.py::test_full_generation_works",
    "test_speculative.py::test_spec_accepts_on_cyclic_continuation",
    "test_speculative.py::test_sampled_marginals_match[0.9-0]",
    "test_graphdit.py::test_int8_quantized_denoiser",
    "test_s2_attention.py::test_forward_uses_s2_only_in_training",
    "test_speculative.py::test_sampled_marginals_match[1.0-8]",
    "test_finetuning_types.py::test_pissa_through_build",
    "test_llm.py::test_generate_under_tp_mesh",
    "test_speculative.py::test_spec_with_int8_kv_cache",
    "test_speculative.py::test_sampled_marginals_match[1.0-0]",
    "test_moe.py::test_quantize_llm_params_moe_safe",
    "test_finetuning_types.py::test_dora_init_and_forward",
    "test_multichip.py::test_dp_sharded_generate",
    "test_stacked.py::test_generation_equivalence",
    "test_graphdit.py::test_denoiser_shapes_and_symmetry",
    "test_gin_models.py::test_clip_padding_invariance",
    "test_llm.py::test_int8_kv_cache_generation",
    "test_ring_attention.py::test_mesh_with_sp_axis",
    "test_llm.py::test_generate_return_trigger",
    "test_speculative.py::test_greedy_defaults_to_speculation",
    "test_speculative.py::test_greedy_matches_scan_with_eos",
    "test_moe.py::test_moe_generate_runs",
    "test_ring_attention.py::test_ring_matches_full_attention[1-128-2-8]",
    "test_moe.py::test_aux_loss_matches_hf_magnitude",
    "test_graphdit.py::test_sampler_determinism",
    "test_speculative.py::test_acceptance_guard_keeps_good_drafting",
    "test_moe.py::test_padding_excluded_from_routing",
    "test_llm.py::test_inputs_embeds_splice",
    "test_speculative.py::test_greedy_repetitive_prompt",
    "test_speculative.py::test_spec_respects_max_new_tokens",
    "test_gin_models.py::test_clip_embeddings_unit_norm",
    "test_llm.py::test_left_padding_equivalence",
    "test_stacked.py::test_remat_grads_through_scan",
    "test_moe.py::test_single_expert_equals_dense_mlp",
    "test_graphdit.py::test_sample_discrete_features_masking",
    "test_llm.py::test_tp_sharded_forward_matches_single",
    "test_finetuning_types.py::test_pissa_init_preserves_forward",
    "test_speculative.py::test_greedy_matches_scan[3-2]",
    "test_speculative.py::test_greedy_matches_scan[4-3]",
    "test_hf_tokenizer.py::test_load_and_specials",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        short = item.nodeid.split("/")[-1]
        if short in _SLOW_BUDGET:
            item.add_marker(pytest.mark.slow)
