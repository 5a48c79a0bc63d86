"""Benchmark harness — prints ONE JSON line for the driver.

Default (driver) metric: the BASELINE.json north star — TWO-PHASE MolQA
molecules/min (Phase-1 design THEN Phase-2 retrosynthesis through
eval.workflow.run_molqa at the reference's eval budgets) with an
8B-shape int8 LLM on the chip (/root/reference/src/eval/
workflow.py:155-204). The Phase-1-only design throughput lives behind
--mode e2e; the persistent XLA compilation cache (utils/cache.py) keeps
repeat invocations inside a driver-safe budget (first-ever run on a
cold cache pays ~8 min of tunnel compiles).

--mode denoise: GraphDiT reverse-diffusion denoise steps/sec at the
REFERENCE denoiser shape (depth 28, hidden 1024, heads 16, 50-node
graphs — /root/reference/src/model/graph_decoder/transformer.py:24-36),
the hot inner loop of molecule generation (diffusion_model.py:279-289:
T denoiser forwards per molecule, 2x under CFG).

vs_baseline: the reference publishes no numeric baselines (BASELINE.md)
— both metrics divide by FROZEN constants so round-over-round progress
is comparable:
  * denoise: 20.0 graph-steps/s (torch eager V100-class, batch-1
    sequential sampling; frozen since round 1)
  * e2e: 8.0 molecules/min (A100-class batch-1 estimate: 128 tok @
    ~30 tok/s HF bf16 8B + 100 diffusion steps @ ~30 ms + re-forward;
    frozen from round 2 on)

--mode molqa: the TWO-PHASE metric — design + retrosynthesis through
eval.workflow.run_molqa with the reference's eval budgets (topk=50,
iterations=100, max_planning_time=30 s/mol); frozen baseline 1.6
molecules/min (see bench_molqa docstring).

Usage: python bench.py [--tiny] [--mode denoise|e2e|molqa|retro|serve|train]
       [--batch N] [--steps T] [--quant] [--kv8|--no-kv8]
"""

import argparse
import json
import os
import sys
import time


def bench_denoise(args) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llamole_tpu.models.graphdit import GraphDiT, GraphDiTConfig
    from llamole_tpu.models.graphdit.config import build_data_info_from_smiles

    if args.tiny:
        batch = args.batch or 4
        steps = args.steps or 10
        cfg = GraphDiTConfig(hidden_size=64, depth=2, num_heads=4,
                             diffusion_steps=steps, guide_scale=2.0,
                             text_dim=768)
        max_nodes = 16
    else:
        # reference denoiser shape (transformer.py:28-30: depth 28,
        # hidden 1024, heads 16, max 50 nodes); 50 steps keeps the run
        # inside the driver budget — steps/sec is step-count invariant
        # batch 128 measured +1.8% over 64 (256 pays compile > budget)
        batch = args.batch or 128
        steps = args.steps or 50
        cfg = GraphDiTConfig(hidden_size=1024, depth=28, num_heads=16,
                             diffusion_steps=steps, guide_scale=2.0,
                             text_dim=768)
        max_nodes = 50

    corpus = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "C1CC1", "c1ccncc1",
              "CC(N)C(=O)O", "COC", "CS", "C=CC=C",
              "CC(=O)Oc1ccccc1C(=O)O", "c1cc[nH]c1"]
    info = build_data_info_from_smiles(corpus, max_n_nodes=max_nodes)
    dtype = jnp.bfloat16 if jax.devices()[0].platform != "cpu" else jnp.float32
    model = GraphDiT(cfg, info, dtype=dtype)
    params = model.init(jax.random.PRNGKey(0))
    if args.quant:
        from llamole_tpu.models.graphdit.denoiser import quantize_denoiser_params
        params = quantize_denoiser_params(params)

    y = jnp.full((batch, cfg.ydim), jnp.nan, jnp.float32)
    txt = jnp.zeros((batch, cfg.text_dim), jnp.float32)

    # compile (np.asarray forces real completion — block_until_ready does
    # not synchronize over the axon device tunnel)
    out = model._sample_jit(params, jax.random.PRNGKey(1), y, txt)
    np.asarray(out[0])

    # timed runs with forced host sync per run
    n_rep = 2
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = model._sample_jit(params, jax.random.PRNGKey(2 + i), y, txt)
        np.asarray(out[0])
    elapsed = time.perf_counter() - t0

    # each reverse step runs the denoiser on 2*batch graphs (CFG)
    denoise_steps = n_rep * steps
    steps_per_sec = denoise_steps / elapsed
    graph_steps_per_sec = steps_per_sec * batch

    baseline_graph_steps = 20.0  # FROZEN (see module docstring)
    return {
        "metric": "graphdit_denoise_graph_steps_per_sec",
        "value": round(graph_steps_per_sec, 3),
        "unit": "graph-denoise-steps/s",
        "vs_baseline": round(graph_steps_per_sec / baseline_graph_steps, 3),
    }


def _build_phase_model(args, new_tokens=128):
    """Shared 8B-int8-LLM + graph-module stack for e2e/retro benches."""
    import jax
    import jax.numpy as jnp

    from llamole_tpu.config import ModelArguments
    from llamole_tpu.data.tokenizer import load_tokenizer
    from llamole_tpu.models.composite import GraphLM
    from llamole_tpu.models.gllm import LLM, LLMConfig
    from llamole_tpu.models.gllm.quantize import init_params_quantized
    from llamole_tpu.models.graphclip.model import GraphCLIP, GraphCLIPConfig
    from llamole_tpu.models.graphdit import GraphDiT, GraphDiTConfig
    from llamole_tpu.models.graphdit.config import build_data_info_from_smiles
    from llamole_tpu.models.loader import make_fallback_predictor
    from llamole_tpu.utils.constants import SPECIAL_TOKENS

    diffusion_steps = args.steps or 100
    on_tpu = jax.devices()[0].platform != "cpu"
    if args.tiny or not on_tpu:
        llm_cfg = LLMConfig.tiny(320)
        dit = GraphDiTConfig(hidden_size=64, depth=2, num_heads=4,
                             diffusion_steps=8, text_dim=768)
        new_tokens = 16
    else:
        llm_cfg = LLMConfig.llama3_8b()
        dit = GraphDiTConfig(hidden_size=1024, depth=28, num_heads=16,
                             diffusion_steps=diffusion_steps, text_dim=768)
    if args.kv8:
        llm_cfg.kv_cache_dtype = "int8"

    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    tokenizer = load_tokenizer(ModelArguments(model_name_or_path=""),
                               generate_mode=True)
    llm = LLM(llm_cfg, dtype=dtype)
    llm_params = init_params_quantized(jax.random.PRNGKey(7), llm_cfg, dtype)

    corpus = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "C1CC1", "c1ccncc1",
              "CC(N)C(=O)O", "COC", "CS", "C=CC=C", "c1cc[nH]c1"]
    info = build_data_info_from_smiles(corpus, max_n_nodes=dit.max_n_nodes)
    graph_decoder = GraphDiT(dit, info, dtype=dtype)
    graph_predictor = make_fallback_predictor()
    graph_encoder = GraphCLIP(GraphCLIPConfig(num_layer=2, hidden_size=64))

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    frozen = {
        "llm": llm_params,
        "graph_decoder": graph_decoder.init(keys[0]),
        "graph_predictor": graph_predictor.init(keys[1]),
        "graph_encoder": graph_encoder.init(keys[2]),
    }
    token_id_dict = {t: tokenizer.token_to_id(t) for t in SPECIAL_TOKENS}
    model = GraphLM(llm=llm, graph_decoder=graph_decoder,
                    graph_predictor=graph_predictor,
                    graph_encoder=graph_encoder, tokenizer=tokenizer,
                    token_id_dict=token_id_dict, finetuning_type="freeze")
    trainable = model.init_trainable(keys[3], frozen)
    return model, frozen, trainable, tokenizer, new_tokens


# e2e OOM fallback ladder: step DOWN THROUGH the measured sweet spots
# (96 -> 64 -> 32 ...) rather than halving — halving from 96 would land
# at 48, worse than the known-safe 64.
_E2E_LADDER = (128, 96, 64, 32, 16, 8)


def _is_oom(e: Exception) -> bool:
    msg = str(e)
    return ("RESOURCE_EXHAUSTED" in msg or "Ran out of memory" in msg
            or "ResourceExhausted" in msg)


def _teardown_jax_client() -> None:
    """Best-effort PJRT client teardown (see _reexec_at_batch). Separate
    so tests can stub it — clearing live backends inside a pytest
    process would invalidate every array other tests still hold."""
    try:
        import gc

        import jax
        import jax._src.xla_bridge as _xb
        gc.collect()
        jax.clear_caches()
        _xb._clear_backends()
        gc.collect()
    except Exception:
        pass  # best effort — the post-exec sleep still covers us


def _reexec_at_batch(nxt: int, extra_env: dict | None = None) -> None:
    """OOM fallback = a FRESH PROCESS at the smaller batch.

    In-process retry after an axon-tunnel OOM does not work: the failed
    execution's device buffers stay resident server-side even after the
    client drops every reference and clears the jit caches (measured in
    battery r4 — after one b64 OOM every smaller batch, and finally a
    bare PRNGKey transfer, kept OOMing while a fresh process on the same
    chip could allocate 15.5 GB). exec tears the tunnel client down,
    which is the only reliable release.

    Two race guards (measured: a re-exec'd b32 run OOMed even though
    b32 passes clean on a quiet chip):
    * tear the PJRT client down EXPLICITLY before exec — exec does not
      close inherited non-CLOEXEC fds, so the tunnel connection (and
      with it the dead run's buffers) can otherwise survive into the
      new process's lifetime;
    * the new process sleeps (LLAMOLE_OOM_REEXEC_SLEEP, set below;
      honored in main()) before touching the device, giving the server
      time to reap the old client."""
    _teardown_jax_client()
    argv = list(sys.argv)
    if "--batch" in argv:
        i = argv.index("--batch")
        del argv[i:i + 2]
    argv += ["--batch", str(nxt)]
    print(f"# OOM: re-exec at batch {nxt}", file=sys.stderr, flush=True)
    sys.stdout.flush()
    # pass the reap-delay via a COPIED environment (not os.environ —
    # mutating the live env would leak into any in-process caller)
    env = dict(os.environ, LLAMOLE_OOM_REEXEC_SLEEP="45",
               **(extra_env or {}))
    os.execve(sys.executable, [sys.executable] + argv, env)


def bench_e2e(args) -> dict:
    """Phase-1 design pipeline molecules/min with an 8B int8 LLM.

    OOM resilience: the driver's chip may have less free HBM than ours
    (other tenants); on RESOURCE_EXHAUSTED the run retries at the next
    smaller ladder batch rather than failing the round's headline
    metric."""
    # battery s4: b128 kv8 = 435.6 vs b96 428 — default 128 now that an
    # OOM re-execs cleanly down the ladder (96 next)
    batch = args.batch or 128
    try:
        # the ~8.5 GB weight load sits inside the ladder too: a transient
        # OOM during model build (server still reaping a dead client)
        # re-execs the same as a mid-run one
        prebuilt = _build_phase_model(args, new_tokens=128)
        return _bench_e2e_at(args, batch, prebuilt)
    except Exception as e:
        if not _is_oom(e) or batch <= 8:
            raise
        lower = [b for b in _E2E_LADDER if b < batch]
        _reexec_at_batch(lower[0] if lower else batch // 2)


def _bench_e2e_at(args, batch: int, prebuilt) -> dict:
    import jax
    import numpy as np

    from llamole_tpu.models.composite import GenerationSettings

    # int8-KV batch scaling (battery s4): 96 -> 427.7, 128 -> 435.6
    # mol/min; b128 only fits with kv8 (bf16 KV OOMed by 42 MB in r3).
    # The caller defaults to 128 and the re-exec ladder degrades through
    # the measured sweet spots (96, 64, ...) on OOM.
    # new_tokens budget: config/generate/llama_drug.yaml:27
    model, frozen, trainable, tokenizer, new_tokens = prebuilt

    prompt = ("Can you design a drug-like molecule that inhibits HIV "
              "and is synthesizable? Please describe it.")
    enc = tokenizer.encode(prompt)
    ids = np.tile(np.asarray(enc, np.int32)[None, :], (batch, 1))
    mask = np.ones_like(ids)
    props = np.full((batch, 10), np.nan, np.float32)
    props[:, 1] = 1.0  # HIV active
    gen = GenerationSettings(max_new_tokens=new_tokens, do_sample=True)

    # warm-up / compile pass
    t0 = time.perf_counter()
    model.design_molecule(frozen, trainable, jax.random.PRNGKey(1),
                          ids, mask, props, gen=gen)
    compile_s = time.perf_counter() - t0

    from llamole_tpu.chem.assemble import collect_assembly_stats

    n_rep = 2
    valid = 0
    with collect_assembly_stats() as stats:
        t0 = time.perf_counter()
        for i in range(n_rep):
            _, smiles = model.design_molecule(
                frozen, trainable, jax.random.PRNGKey(2 + i),
                ids, mask, props, gen=gen)
            valid += sum(s is not None for s in smiles)
        elapsed = time.perf_counter() - t0

    mol_per_min = n_rep * batch / elapsed * 60.0
    failures = {k: v for k, v in sorted(stats.items()) if k != "ok"}
    print(f"# e2e: compile {compile_s:.1f}s, {elapsed:.2f}s for "
          f"{n_rep}x{batch} molecules, valid {valid}/{n_rep * batch}, "
          f"assembly failures {failures or '{}'}",
          file=sys.stderr, flush=True)
    baseline_mol_min = 8.0  # FROZEN (see module docstring)
    return {
        "metric": "e2e_design_molecules_per_min",
        "value": round(mol_per_min, 3),
        "unit": "molecules/min",
        "vs_baseline": round(mol_per_min / baseline_mol_min, 3),
    }


def bench_retro(args) -> dict:
    """Phase-2 retrosynthesis engine throughput: node expansions/min.

    One expansion = LLM 512-token analysis decode + retro-query
    re-forward + predictor template classification + host template
    application (eval/workflow.py:155-204 Phase 2;
    modeling_llamole.py:784-889 one_step_reaction). Batched frontier
    expansion (frontier_width = --batch, default 8) is the SURVEY §7.7
    architectural divergence — the reference expands ONE node per LLM
    call. Route success needs trained weights; throughput of the engine
    does not, so this measures the machinery honestly on random weights.

    vs_baseline: 3.0 expansions/min FROZEN (reference-style sequential
    expansion: 512 analysis tokens at ~25 tok/s HF eager 8B ≈ 20.5 s
    per expansion, V100-class)."""
    import jax
    import numpy as np

    from llamole_tpu.models.composite import GenerationSettings
    from llamole_tpu.planner import retro_star_search

    width = args.batch or 8
    model, frozen, trainable, tokenizer, _ = _build_phase_model(args)
    gen = GenerationSettings(max_new_tokens=16 if args.tiny else 128,
                             do_sample=True)
    targets = ["CC(=O)Oc1ccccc1C(=O)O", "CCOC(=O)c1ccccc1",
               "CC(N)C(=O)OCC", "c1ccc(COC(C)=O)cc1"]
    # targets must not be purchasable or the search ends with zero work
    available = set(model.graph_predictor.available) - set(targets)
    rng_box = {"k": jax.random.PRNGKey(11)}
    count = {"n": 0}

    def batch_expand(smiles_list):
        rng_box["k"], sub = jax.random.split(rng_box["k"])
        count["n"] += len(smiles_list)
        return model.batched_one_step_reaction(
            frozen, trainable, sub, smiles_list, topk=50, gen=gen,
            analysis_tokens=16 if args.tiny else None)

    def expand(s):
        return batch_expand([s])[0]

    def value_fn(s, parent_reaction):
        return 0.0

    # planner smoke (untimed): the full search loop drives the engine
    retro_star_search(targets[0], available, expand, value_fn,
                      iterations=1, expansion_width=width,
                      batch_expand_fn=batch_expand)

    # timed: full-width expansion batches over distinct products — the
    # steady state of a production search (topk=50 proposals fill the
    # frontier from iteration 2 on; random weights starve it, so timing
    # the planner loop here would measure an artifact, width-1 batches)
    frontier = (targets * ((width + len(targets) - 1) // len(targets)))[:width]
    t0 = time.perf_counter()
    batch_expand(frontier)      # compile pass for this width bucket
    compile_s = time.perf_counter() - t0
    count["n"] = 0
    n_rep = 1 if args.tiny else 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        batch_expand(frontier)
    elapsed = time.perf_counter() - t0
    expansions_per_min = count["n"] / elapsed * 60.0
    print(f"# retro: compile {compile_s:.1f}s, {count['n']} expansions "
          f"in {elapsed:.2f}s (width {width})", file=sys.stderr, flush=True)
    baseline = 3.0  # FROZEN (see docstring)
    return {
        "metric": "retro_expansions_per_min",
        "value": round(expansions_per_min, 3),
        "unit": "expansions/min",
        "vs_baseline": round(expansions_per_min / baseline, 3),
    }


def bench_molqa(args) -> dict:
    """TWO-PHASE MolQA eval throughput — the literal BASELINE.json north
    star: prompt -> Phase-1 design (AR decode + body re-forward +
    GraphDiT sampling + assembly) THEN Phase-2 retrosynthesis over the
    designed molecules, run through eval.workflow.run_molqa itself with
    the reference's eval budgets (expansion_topk=50, iterations=100,
    max_planning_time=30 s/molecule — /root/reference/src/eval/
    workflow.py:155-204,172-173). Phase 2 uses the interleaved
    cross-target frontier search (width = --batch) — the SURVEY §7.7
    divergence; parity is route success rate, not identical routes.

    The stderr line reports validity, route-found rate, planner
    expansions/molecule, and the design/retro phase split; the JSON
    metric is end-to-end molecules/min over both phases.

    Timing protocol matches the e2e mode: a warm-up run_molqa pass with
    IDENTICAL shapes and budgets compiles every device program (Phase-1
    decode/extension/diffusion, Phase-2 expansion decode + bucketed
    value scoring), then the timed pass measures steady-state
    throughput. Without it the single-batch metric is ~80% XLA compile
    time (measured: 183 s compile vs 3.4 s/cycle at b8).

    Phase-2 planning wall: max_planning_time is per-molecule, spent
    CONCURRENTLY by the interleaved cross-target search
    (composite.retrosynthesize_batch share_planning_wall=True) — every
    tree is active from t=0 under one shared 30 s wall, vs the
    reference's sequential 30 s/molecule. This is a THROUGHPUT metric:
    per-molecule engine time inside the wall shrinks with the batch
    (the expansions/mol stderr count makes the delivered effort
    checkable — at real-weight engine rates it exceeds the reference's
    dedicated-wall effort; a min_expansions_per_mol=2 floor lets
    starved trees run overtime, capped at 2x the wall, so delivered
    effort never drops below the reference's ~1.5/mol).
    Quality evals that need the reference's exact engine budget use
    share_planning_wall=False (the `llamole parity` CLI does).

    vs_baseline: 1.6 molecules/min FROZEN (A100-class reference
    two-phase estimate: Phase-1 at the e2e frozen constant 8.0 mol/min
    = 7.5 s/molecule, plus Phase-2 sequential node expansion at the
    retro frozen constant 3.0 expansions/min — at that engine rate the
    100-iteration budget is unreachable, so the reference saturates its
    30 s/molecule planning wall — 60 / (7.5 + 30) = 1.6)."""
    batch = args.batch or (8 if args.tiny else 32)
    # default 32: the 512-token MolQA prompts make the per-row KV cache
    # ~4x the e2e bench's short-prompt rows, so the e2e default 96 does
    # NOT carry over (b64 measured ~0.5 GB past the 15.5 GB budget)
    try:
        # model build inside the ladder (see bench_e2e)
        prebuilt = _build_phase_model(args, new_tokens=128)
        return _bench_molqa_at(args, batch, prebuilt)
    except Exception as e:
        if not _is_oom(e) or batch <= 4:
            raise
        _reexec_at_batch(batch // 2)


def _bench_molqa_at(args, batch: int, prebuilt) -> dict:
    import json as _json
    import tempfile

    from llamole_tpu.config import (DataArguments, FinetuningArguments,
                                    GeneratingArguments, TrainingArguments)
    from llamole_tpu.eval.workflow import run_molqa

    model, frozen, trainable, tokenizer, new_tokens = prebuilt

    # tile the in-repo MolQA examples out to the requested record count
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "data", "molqa_drug_examples.json")) as f:
        examples = _json.load(f)
    records = [dict(examples[i % len(examples)]) for i in range(batch)]

    with tempfile.TemporaryDirectory() as tmp:
        data_dir = os.path.join(tmp, "data")
        os.makedirs(data_dir)
        with open(os.path.join(data_dir, "molqa_bench.json"), "w") as f:
            _json.dump(records, f)
        out_dir = os.path.join(tmp, "out")

        from llamole_tpu.config import ModelArguments
        common = dict(
            model_args=ModelArguments(model_name_or_path=""),
            data_args=DataArguments(dataset="molqa_bench",
                                    dataset_dir=data_dir,
                                    template="default",
                                    cutoff_len=64 if args.tiny else 512,
                                    learned_query_size=8),
            finetuning_args=FinetuningArguments(),
            generating_args=GeneratingArguments(
                max_new_tokens=new_tokens, temperature=0.6,
                top_p=0.9, do_sample=True,
                # frontier width sizes the Phase-2 expansion decode's
                # KV cache (512 analysis tokens per row, pow2 rows) —
                # cap it at 32 so the record batch can grow without the
                # expansion stage OOMing (W=64 alone costs ~3.5 GB kv8)
                frontier_width=min(batch, 32)),
            # throughput mode: one shared concurrent per-molecule wall
            # (run_molqa defaults to the reference's sequential
            # per-molecule protocol; the bench opts in explicitly).
            # min_expansions_per_mol=2 is the EFFORT FLOOR: trees the
            # shared wall starved below the reference's delivered
            # ~1.5 expansions/mol keep running in overtime (lagging
            # trees only, capped at 2x the wall) — so the throughput
            # protocol can never under-spend the reference's per-
            # molecule planner effort at the same 30 s knob
            share_planning_wall=True,
            min_expansions_per_mol=2,
            prebuilt=(model, frozen, trainable, tokenizer))
        budgets = ({"expansion_topk": 10, "iterations": 2,
                    "max_planning_time": 2.0} if args.tiny else {})
        if not args.tiny:
            # warm-up pass: identical shapes AND budgets (a full 30 s
            # planning wall reaches deeper into the bucketed Phase-2
            # value/expansion shapes) — compiles every device program so
            # the timed pass measures throughput, not XLA compile time
            # (see docstring)
            print("# molqa: warm-up pass (compiles) ...", file=sys.stderr,
                  flush=True)
            run_molqa(training_args=TrainingArguments(
                          per_device_eval_batch_size=batch,
                          output_dir="", seed=1),
                      score=False,  # warm-up needs compiles, not metrics
                      **common)
        run_molqa(training_args=TrainingArguments(
                      per_device_eval_batch_size=batch,
                      output_dir=out_dir, seed=0),
                  **budgets, **common)
        with open(os.path.join(out_dir, "molqa_results.json")) as f:
            summary = _json.load(f)["summary"]

    mol_per_min = summary["molecules_per_min"]
    print(f"# molqa: {summary['num_records']} records, validity "
          f"{summary['validity']:.2f}, route-found "
          f"{summary['retro_success']:.2f}, design {summary['design_time_s']:.1f}s"
          f" + retro {summary['retro_time_s']:.1f}s, "
          f"{summary.get('retro_expansions_per_mol') or 0.0:.1f} "
          f"expansions/mol in ONE shared wall, effort floor "
          f"{summary.get('min_expansions_per_mol')} (reference: "
          f"~1.5/mol, one dedicated 30s wall PER molecule, "
          f"~20.5s/expansion at its engine rate)",
          file=sys.stderr, flush=True)
    baseline = 1.6  # FROZEN (see docstring)
    return {
        "metric": "molqa_two_phase_molecules_per_min",
        "value": round(mol_per_min, 3),
        "unit": "molecules/min",
        "vs_baseline": round(mol_per_min / baseline, 3),
    }


def bench_serve(args) -> dict:
    """OOM-resilient wrapper around _bench_serve_run.

    The serve config (slots=8, 8B int8 weights) is measured-safe on a
    quiet chip, so a RESOURCE_EXHAUSTED here is usually TRANSIENT: the
    tunnel server asynchronously reaping a prior battery leg's client
    while this process loads ~8.5 GB of weights (observed battery s5:
    serve OOMed 2 min after the b128 e2e leg exited; an identical rerun
    passed). Retry policy mirrors _reexec_at_batch semantics (fresh
    process is the ONLY reliable release): attempt 1 re-execs the SAME
    config after the 45 s reap delay, attempt 2 halves the slot count,
    attempt 3 raises."""
    try:
        return _bench_serve_run(args)
    except Exception as e:
        if not _is_oom(e):
            raise
        tries = int(os.environ.get("LLAMOLE_SERVE_OOM_TRIES", "0") or 0)
        slots = args.batch or 8
        if tries >= 2 or slots <= 1:
            raise
        nxt = slots if tries == 0 else max(slots // 2, 1)
        _reexec_at_batch(nxt,
                         extra_env={"LLAMOLE_SERVE_OOM_TRIES": str(tries + 1)})


def _bench_serve_run(args) -> dict:
    """Decode-serving throughput under VARIABLE-length requests:
    continuous slot-pool scheduling (gllm/continuous.SlotDecoder) vs
    full-batch generate() cycles on the same stochastic stop process.

    Both modes decode the same requests with the same broad stop-token
    set, so each row stops after a geometrically-distributed number of
    tokens (the trained-weight regime: analyses end at a trigger token
    after a few dozen tokens with high variance). Full-batch pays the
    slowest row of every batch; the slot pool retires rows as they
    stop. The stderr line reports both modes + observed mean length.

    vs_baseline: 50.0 requests/min FROZEN (reference-style sequential
    serving: one request at a time through HF eager 8B bf16 at ~30
    tok/s, ~25-token mean analysis + prefill ≈ 1.2 s/request)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llamole_tpu.config import ModelArguments
    from llamole_tpu.data.tokenizer import load_tokenizer
    from llamole_tpu.models.gllm import LLM, LLMConfig
    from llamole_tpu.models.gllm.continuous import SlotDecoder
    from llamole_tpu.models.gllm.quantize import init_params_quantized

    on_tpu = jax.devices()[0].platform != "cpu"
    if args.tiny or not on_tpu:
        cfg = LLMConfig.tiny(320)
        n_requests, slots, max_new = 12, 2, 16
        lens = (8, 20, 40)
    else:
        cfg = LLMConfig.llama3_8b()
        n_requests = 64
        slots = args.batch or 8
        max_new = 128
        lens = (48, 120, 250, 400)
    if args.kv8:
        cfg.kv_cache_dtype = "int8"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    tokenizer = load_tokenizer(ModelArguments(model_name_or_path=""),
                               generate_mode=True)
    llm = LLM(cfg, dtype=dtype)
    params = init_params_quantized(jax.random.PRNGKey(7), cfg, dtype)

    # broad stop set => geometric stop lengths, same process both modes
    stop_frac = 25
    eos = tuple(range(3, 3 + max(cfg.vocab_size // stop_frac, 1)))
    rng = np.random.default_rng(0)
    lo = max(3 + len(eos), cfg.vocab_size // 2)   # prompts avoid the eos set
    prompts = [rng.integers(lo, cfg.vocab_size - 1,
                            size=int(rng.choice(lens))).tolist()
               for _ in range(n_requests)]
    buckets = tuple(sorted({((max(L, 8) + 63) // 64) * 64
                            for L in lens})) or (64,)

    # ONE decoder for warm-up and timed runs: the jitted slot programs
    # are cached per instance (static self), so a fresh decoder per run
    # would recompile inside the timed region
    decoder = SlotDecoder(
        llm, params, slots=slots,
        cache_len=max(buckets) + max_new, max_new_tokens=max_new,
        eos_ids=eos, pad_id=tokenizer.pad_token_id, temperature=0.6,
        top_p=0.9, do_sample=True, chunk_steps=8,
        prompt_buckets=buckets, seed=1)

    def run_continuous():
        for p in prompts:
            decoder.submit(p)
        t0 = time.perf_counter()
        results = decoder.drain()
        dt = time.perf_counter() - t0
        return dt, results

    def run_fullbatch():
        pad = tokenizer.pad_token_id
        total_tokens = []
        t0 = time.perf_counter()
        for start in range(0, n_requests, slots):
            group = prompts[start:start + slots]
            group = group + [group[-1]] * (slots - len(group))
            need = max(len(g) for g in group)
            L = min((b for b in buckets if b >= need),
                    default=max(buckets))
            ids = np.full((slots, L), pad, np.int32)
            mask = np.zeros((slots, L), np.int32)
            for i, g in enumerate(group):
                ids[i, -len(g):] = g[-L:]
                mask[i, -len(g):] = 1
            out, _ = llm.generate(
                params, jax.random.PRNGKey(100 + start),
                jnp.asarray(ids), jnp.asarray(mask),
                max_new_tokens=max_new, temperature=0.6, top_p=0.9,
                do_sample=True, eos_ids=eos, pad_id=pad, spec_tokens=0)
            total_tokens.append(np.asarray(out))
        dt = time.perf_counter() - t0
        return dt, total_tokens

    # compile passes (excluded from timing): tiny warm-up of each mode
    run_continuous()
    run_fullbatch()

    cont_s, results = run_continuous()
    full_s, _ = run_fullbatch()
    mean_len = float(np.mean([len(t) for t, _ in results.values()]))
    cont_rpm = n_requests / cont_s * 60.0
    full_rpm = n_requests / full_s * 60.0
    print(f"# serve: continuous {cont_rpm:.1f} req/min vs full-batch "
          f"{full_rpm:.1f} req/min ({cont_rpm / full_rpm:.2f}x), mean "
          f"analysis length {mean_len:.1f} tokens, slots={slots}",
          file=sys.stderr, flush=True)
    baseline = 50.0  # FROZEN (see docstring)
    return {
        "metric": "serve_requests_per_min",
        "value": round(cont_rpm, 3),
        "unit": "requests/min",
        "vs_baseline": round(cont_rpm / baseline, 3),
    }


def bench_train(args) -> dict:
    """8B LoRA SFT step throughput (tokens/s) on ONE chip.

    The reference's headline training workflow is LoRA SFT of the 8B
    LLM on an 80 GB A100 (README.md:138, config/train/llama_lora.yaml).
    Here the frozen 8B body is int8 on-chip (8.56 GB), adapters + Adam
    moments train in bf16/f32, and the jitted step (fwd + bwd through
    the int8 matmuls + optimizer update) is timed by scan-length
    difference with forced d2h sync (scripts/prove_8b_train.py is the
    long-form proof; this is the driver-visible mode). Measures the
    plain LM step — the dominant cost of the composite mmsft loss; the
    graph towers add <2% FLOPs at the reference shapes.

    vs_baseline: 2500 tokens/s FROZEN (A100-80G HF Trainer bf16 LoRA
    8B estimate: 312 TFLOP/s peak x ~40% achievable MFU / ~48 GFLOP
    per token fwd+bwd)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from llamole_tpu.models.gllm import LLMConfig
    from llamole_tpu.models.gllm.lora import init_lora
    from llamole_tpu.models.gllm.model import forward, lm_loss
    from llamole_tpu.models.gllm.quantize import init_params_quantized
    from llamole_tpu.models.gllm.stacked import stack_layers
    from llamole_tpu.utils.constants import IGNORE_INDEX

    on_tpu = jax.devices()[0].platform != "cpu"
    if args.tiny or not on_tpu:
        cfg = LLMConfig.tiny(320)
        B, S = args.batch or 2, 128
    else:
        cfg = LLMConfig.llama3_8b()
        cfg.remat = True
        B, S = args.batch or 4, getattr(args, "seq_len", None) or 1024

    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = init_params_quantized(jax.random.PRNGKey(7), cfg, dtype)
    lora = stack_layers(init_lora(jax.random.PRNGKey(1), cfg, rank=8,
                                  dtype=dtype))
    tx = optax.adamw(1e-4)
    opt_state = tx.init(lora)

    gen = np.random.default_rng(0)
    ids = jnp.asarray(gen.integers(100, cfg.vocab_size - 100, (B, S)),
                      jnp.int32)
    labels = jnp.where(jnp.arange(S)[None, :] < S // 4, IGNORE_INDEX, ids)

    def loss_fn(lr, frozen, batch_ids, batch_labels):
        logits, _, _ = forward(frozen, cfg, input_ids=batch_ids, lora=lr,
                               train=True)
        return lm_loss(logits, batch_labels, IGNORE_INDEX)

    # frozen params MUST be jit arguments — a closure bakes 8.56 GB of
    # constants into the lowered program (NOTES_ROUND3.md gotcha)
    @jax.jit
    def train_step(lr, opt, frozen, batch_ids, batch_labels):
        loss, grads = jax.value_and_grad(loss_fn)(lr, frozen, batch_ids,
                                                  batch_labels)
        updates, opt = tx.update(grads, opt, lr)
        return optax.apply_updates(lr, updates), opt, loss

    def timed(n_steps):
        lr, opt = lora, opt_state
        t0 = time.perf_counter()
        for _ in range(n_steps):
            lr, opt, loss = train_step(lr, opt, params, ids, labels)
        np.asarray(loss)  # forced d2h sync (axon tunnel)
        return time.perf_counter() - t0

    timed(1)  # compile
    t1 = min(timed(1) for _ in range(2))
    t4 = min(timed(4) for _ in range(2))
    step_s = (t4 - t1) / 3
    tok_s = B * S / step_s
    print(f"# train: batch {B} seq {S} rank 8 remat={cfg.remat} "
          f"step {step_s:.3f}s", file=sys.stderr, flush=True)
    baseline = 2500.0  # FROZEN (see docstring)
    return {
        "metric": "lora_sft_tokens_per_s",
        "value": round(tok_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tok_s / baseline, 3),
    }


def main() -> None:
    # OOM re-exec handoff: give the tunnel server time to reap the dead
    # client's buffers before this fresh process touches the device
    # (see _reexec_at_batch)
    delay = os.environ.pop("LLAMOLE_OOM_REEXEC_SLEEP", "")
    if delay:
        try:
            delay_s = float(delay)
        except ValueError:
            delay_s = 0.0
        if delay_s > 0:
            print(f"# OOM re-exec: sleeping {delay_s:.0f}s for "
                  "server-side buffer reap", file=sys.stderr, flush=True)
            time.sleep(delay_s)
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true",
                        help="CPU-friendly sizes (smoke test)")
    parser.add_argument("--mode", choices=("denoise", "e2e", "retro",
                                           "serve", "train", "molqa"),
                        default="molqa")
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--steps", type=int, default=None,
                        help="diffusion/denoise step count (denoise, e2e)")
    parser.add_argument("--seq-len", type=int, default=None,
                        help="training sequence length (train mode only; "
                             "default 1024 — the frozen 2500 tok/s "
                             "baseline assumes this length)")
    parser.add_argument("--quant", action="store_true",
                        help="int8-quantize the denoiser gemms (serving)")
    parser.add_argument("--kv8", dest="kv8", action="store_true",
                        default=None,
                        help="int8 KV cache for the LLM decode (halves "
                             "cache HBM + footprint). PER-MODE defaults, "
                             "each measured on the chip: ON for e2e/molqa/"
                             "retro (428.9 vs 415.8 mol/min at b96, logit "
                             "error <2%%, greedy parity on the tiny model); "
                             "OFF for serve (re-measured r4 on the "
                             "round-trip-free slot pool: kv8 380.1 vs "
                             "bf16 434.8 continuous req/min — the "
                             "quant/dequant VPU passes cost more than the "
                             "halved cache traffic saves at serving "
                             "lengths)")
    parser.add_argument("--no-kv8", dest="kv8", action="store_false",
                        help="bf16 KV cache (parity/debug)")
    args = parser.parse_args()
    if args.quant and args.mode != "denoise":
        parser.error("--quant only applies to --mode denoise")
    if args.steps is not None and args.mode == "train":
        parser.error("--steps does not apply to --mode train; "
                     "use --seq-len for the training sequence length")
    if args.kv8 is None:
        args.kv8 = args.mode != "serve"

    from llamole_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    result = {"denoise": bench_denoise, "e2e": bench_e2e,
              "retro": bench_retro, "serve": bench_serve,
              "train": bench_train, "molqa": bench_molqa}[args.mode](args)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
