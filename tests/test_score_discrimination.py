"""Score-discrimination regression (VERDICT r4 #8): the eval scoring
surface must MOVE IN THE RIGHT DIRECTION once its models are trained —
FGD must score an in-distribution molecule set closer than an
out-of-distribution one, and a trained property oracle must beat a
random-init one on held-out labels. Until round 5 these metrics had
only ever scored degenerate random-weights output (schema-tested, not
discrimination-tested).
"""

import random

import numpy as np
import pytest

from llamole_tpu.data.synthetic import (
    generate_corpus, structural_properties, write_corpus)
from llamole_tpu.eval.scoring import frechet_graphclip_distance
from llamole_tpu.utils.constants import MOL_PROPERTIES


def _targets(corpus):
    out = []
    for rec in corpus:
        t = rec["output"].split("<mol_start>")[1].split("<mol_end>")[0]
        out.append(t)
    return out


# far outside the synthetic corpus distribution: long unbranched chains
# and perhalogenated blobs (the corpus is drug-like aromatics/esters)
_JUNK = (["C" * n for n in range(8, 28)]
         + ["FC(F)(F)C(F)(F)C(F)(F)C(F)(F)F", "ClCCl", "BrCBr",
            "CCCCCCCCCCCCCCCCCCCCCCCCCC", "C(F)(F)F",
            "ICCCCCCCCCCI", "CCCCCCCCCCCCCCCCCCCCO"])


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    """Corpus + briefly trained graphclip/oracle (CPU, tiny sizes)."""
    d = tmp_path_factory.mktemp("score_disc")
    corpus_path = str(d / "corpus.json")
    write_corpus(corpus_path, 80, seed=5)
    from llamole_tpu.train.pretrain import (
        pretrain_graphclip, pretrain_property_oracle)
    clip_metrics = pretrain_graphclip(
        corpus_path, str(d / "clip"), num_layer=2, hidden_size=32,
        text_hash_dim=256, steps=150, batch_size=16, seed=0)
    oracle_metrics = pretrain_property_oracle(
        corpus_path, str(d / "oracle"), num_layer=2, hidden_size=32,
        steps=300, batch_size=32, seed=0)
    return {"dir": d, "corpus_path": corpus_path,
            "clip_metrics": clip_metrics, "oracle_metrics": oracle_metrics}


@pytest.mark.slow
def test_training_reduced_losses(stack):
    assert stack["clip_metrics"]["final_loss"] < \
        stack["clip_metrics"]["first_loss"]
    assert stack["oracle_metrics"]["final_loss"] < \
        stack["oracle_metrics"]["first_loss"]


@pytest.mark.slow
def test_fgd_separates_in_from_out_of_distribution(stack):
    from llamole_tpu.models.graphclip import GraphCLIP

    encoder, params = GraphCLIP.from_pretrained(str(stack["dir"] / "clip"))
    corpus = generate_corpus(80, seed=5)
    targets = list(dict.fromkeys(_targets(corpus)))
    rng = random.Random(0)
    rng.shuffle(targets)
    half = len(targets) // 2
    ref, gen_good = targets[:half], targets[half:]

    fgd_good = frechet_graphclip_distance(encoder, params, gen_good, ref)
    fgd_junk = frechet_graphclip_distance(encoder, params, _JUNK, ref)
    assert fgd_good is not None and fgd_junk is not None
    # in-distribution generations must sit strictly (and clearly) closer
    assert fgd_junk > 2.0 * fgd_good, (fgd_good, fgd_junk)


@pytest.mark.slow
def test_trained_oracle_beats_random_on_held_out(stack):
    from llamole_tpu.models.oracle import PropertyOracle

    oracle, params = PropertyOracle.from_pretrained(
        str(stack["dir"] / "oracle"))
    # held-out molecules from a DIFFERENT seed, labels from the same
    # deterministic ground truth the corpus was built with
    held = generate_corpus(30, seed=77)
    smiles = list(dict.fromkeys(_targets(held)))
    truths = [structural_properties(s) for s in smiles]

    import jax
    rand_params = oracle.init(jax.random.PRNGKey(123))

    def mae(ps):
        preds = oracle.predict_smiles(ps, smiles)
        errs = []
        for pred, truth in zip(preds, truths):
            if pred is None or truth is None:
                continue
            for ch in ("SA", "SC"):
                errs.append(abs(float(pred[MOL_PROPERTIES.index(ch)])
                                - truth[ch]))
        assert errs
        return float(np.mean(errs))

    mae_trained = mae(params)
    mae_random = mae(rand_params)
    assert mae_trained < mae_random, (mae_trained, mae_random)
    # and usefully accurate in absolute terms on the 1-5 scale
    assert mae_trained < 1.0, mae_trained
