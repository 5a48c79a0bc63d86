"""Phase-split profile of the e2e Phase-1 design pipeline (the
BASELINE.json north star) on the real chip.

Replicates GraphLM.design_molecule's stage sequence (composite.py:456)
with a forced device->host sync between stages so each phase's wall
time is real (block_until_ready does not synchronize over the axon
tunnel — CLAUDE.md). The composite path itself stays fully async; this
script exists only to show where a design cycle's time goes:

  decode      AR analysis decode (128 new tokens, sampled, int8 KV)
  extend      <design_start>+body query extension off the decode cache
  host-tok    pad stripping + token surgery (host Python)
  diffuse     connector + 100-step GraphDiT reverse scan (CFG doubled)
  assemble    graph -> SMILES on the host (chem/assemble.py)

Usage: python scripts/profile_e2e.py [--batch 96] [--steps 100]
       python scripts/profile_e2e.py --molqa --batch 8   # run_molqa Phase-1
                                                         # replica inputs

--molqa swaps the synthetic identical-short-prompt workload for the
EXACT inputs bench --mode molqa feeds run_molqa: the in-repo MolQA
records tiled to --batch, rendered through the default template and
MolQADataset (left-padded to cutoff 512), with per-record property
vectors — isolating whether a molqa Phase-1 slowdown comes from the
input shapes or from the workflow around them.
"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--molqa", action="store_true")
    ap.add_argument("--kv8", dest="kv8", action="store_true", default=True)
    ap.add_argument("--no-kv8", dest="kv8", action="store_false",
                    help="profile the bf16 KV-cache configuration")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _build_phase_model
    from llamole_tpu.models.composite import GenerationSettings
    from llamole_tpu.ops.nn import dense

    model, frozen, trainable, tokenizer, new_tokens = _build_phase_model(
        args, new_tokens=128)
    batch = args.batch

    if args.molqa:
        import json
        import os
        from llamole_tpu.data.template import get_template
        from llamole_tpu.eval.dataset import MolQADataset
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "data",
                               "molqa_drug_examples.json")) as f:
            examples = json.load(f)
        records = [dict(examples[i % len(examples)]) for i in range(batch)]
        template = get_template("default", tokenizer)
        dataset = MolQADataset(records, tokenizer, template, 512)
        batch_data, _ = next(dataset.batches(batch))
        ids = batch_data["input_ids"]
        mask = batch_data["attention_mask"]
        props = batch_data["property"]
    else:
        prompt = ("Can you design a drug-like molecule that inhibits HIV "
                  "and is synthesizable? Please describe it.")
        enc = tokenizer.encode(prompt)
        ids = np.tile(np.asarray(enc, np.int32)[None, :], (batch, 1))
        mask = np.ones_like(ids)
        props = np.full((batch, 10), np.nan, np.float32)
        props[:, 1] = 1.0
    gen = GenerationSettings(max_new_tokens=new_tokens, do_sample=True,
                             reuse_decode_cache=True)

    def cycle(rng, timings=None):
        def mark(name, t0):
            if timings is not None:
                timings[name] = timings.get(name, 0.0) + (
                    time.perf_counter() - t0)
            return time.perf_counter()

        rng, k_gen, k_diff = jax.random.split(rng, 3)
        t = time.perf_counter()
        toks, _, state = model._generate_tokens(
            frozen, trainable, ids, mask, k_gen, gen, model._eos_ids(),
            want_state=True)
        analysis = np.asarray(toks)  # forced sync
        t = mark("decode", t)

        ext = np.full((batch, 1 + model.num_body_tokens),
                      model.token_id_dict["<design_body>"], np.int32)
        ext[:, 0] = model.token_id_dict["<design_start>"]
        design_hidden = model._body_hidden_extend_jit(
            frozen, trainable, state["cache"], state["kv_valid"],
            jnp.asarray(ext), grow=False)
        np.asarray(design_hidden[..., :1])  # forced sync
        state = None
        t = mark("extend", t)

        prompts = [model._strip_pads(ids[i]) for i in range(batch)]
        analyses = [model._strip_pads(analysis[i]) for i in range(batch)]
        ds = model.token_id_dict["<design_start>"]
        body = model.token_id_dict["<design_body>"]
        seqs = [list(p) + list(a) + [ds] + [body] * model.num_body_tokens
                for p, a in zip(prompts, analyses)]
        t = mark("host-tok", t)

        cond = jax.nn.silu(dense(
            trainable["connectors"]["lm_to_graph_decoder"], design_hidden))
        gd = model.graph_decoder
        y = jnp.asarray(props, jnp.float32)
        atom_idx, edge_cls, n_nodes = gd._sample_jit(
            frozen["graph_decoder"], k_diff, y, cond.astype(jnp.float32))
        atom_idx = np.asarray(atom_idx)
        edge_cls = np.asarray(edge_cls)
        n_nodes = np.asarray(n_nodes)
        t = mark("diffuse", t)

        from llamole_tpu.models.graphdit.api import _graph_to_smiles
        mols = [(atom_idx[i, :int(n_nodes[i])],
                 edge_cls[i, :int(n_nodes[i]), :int(n_nodes[i])])
                for i in range(batch)]
        smiles = _graph_to_smiles(mols, gd.atom_decoder)
        mark("assemble", t)
        return smiles

    print(f"# compile pass (batch {batch}) ...", flush=True)
    t0 = time.perf_counter()
    cycle(jax.random.PRNGKey(0))
    print(f"# compile+first cycle: {time.perf_counter() - t0:.1f}s",
          flush=True)

    timings = {}
    n_rep = 3
    t0 = time.perf_counter()
    n_valid = 0
    for i in range(n_rep):
        smiles = cycle(jax.random.PRNGKey(10 + i), timings)
        n_valid += sum(s is not None for s in smiles)
    total = time.perf_counter() - t0

    print(f"\nbatch={batch} steps={args.steps} reps={n_rep} "
          f"valid={n_valid}/{n_rep * batch}")
    for k, v in timings.items():
        print(f"  {k:<9} {v / n_rep * 1e3:9.1f} ms/cycle "
              f"({100 * v / total:5.1f}%)")
    per_min = 60.0 * batch * n_rep / total
    print(f"  total     {total / n_rep * 1e3:9.1f} ms/cycle -> "
          f"{per_min:.1f} mol/min (phase-split harness; the bench's "
          f"async pipeline overlaps host work)")


if __name__ == "__main__":
    main()
