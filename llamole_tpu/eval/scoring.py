"""Generation-quality scoring for the MolQA eval summary.

The reference repo saves raw results and leaves metric computation to
offline paper scripts (eval/workflow.py:110-218 writes results only);
this module computes the offline-computable metric surface directly so
`molqa_results.json` carries the full summary: validity and retro
success (computed in workflow.py), plus uniqueness, novelty vs the
gold corpus molecules, BLEU-4/ROUGE against gold responses, and —
when a trained first-party oracle is supplied — per-channel property
fidelity of the generated molecules (models/oracle.py)."""

from typing import Any, Dict, List, Optional

import numpy as np

from ..chem.smiles import canonical_smiles
from ..data.aligner import extract_all_smiles
from ..utils.constants import MOL_PROPERTIES
from ..utils.logging import get_logger

logger = get_logger(__name__)


def generation_set_metrics(results: List[Dict[str, Any]],
                           records: List[Dict[str, Any]]
                           ) -> Dict[str, Any]:
    """uniqueness (distinct canonical / valid), novelty (distinct not
    among the gold corpus molecules; None when records carry no gold
    output), BLEU/ROUGE vs gold responses (None likewise)."""
    canon = []
    for r in results:
        smi = r.get("llm_smiles")
        can = canonical_smiles(smi) if smi else None
        if can:
            canon.append(can)
    distinct = set(canon)
    out: Dict[str, Any] = {
        "uniqueness": len(distinct) / len(canon) if canon else None,
    }

    gold_mols = set()
    gold_texts = []
    preds = []
    for rec, res in zip(records, results):
        gold = rec.get("output")
        if not gold:
            continue
        for s in extract_all_smiles(gold):
            can = canonical_smiles(s)
            if can:
                gold_mols.add(can)
        gold_texts.append(gold)
        preds.append(res.get("llm_response", ""))
    out["novelty"] = (sum(1 for c in distinct if c not in gold_mols)
                      / len(distinct)
                      if distinct and gold_mols else None)
    if gold_texts:
        from ..train.metric import compute_text_metrics
        out["text_metrics"] = compute_text_metrics(preds, gold_texts)
    else:
        out["text_metrics"] = None
    return out


def _embed_molecules(encoder, params, smiles_list: List[str],
                     chunk: int = 128) -> np.ndarray:
    """[N, H] GraphCLIP embeddings of the parseable molecules
    (canonical-spelling featurization, unparseable inputs dropped).
    Embeds in fixed-size chunks padded to the CHUNK's max node count:
    one [N_total, n_max, n_max] edge tensor for a full-corpus gold set
    would be GBs on this 1-core host."""
    import jax.numpy as jnp

    from ..chem.featurize import pad_graph_batch, smiles_to_graph

    graphs = []
    for s in smiles_list:
        can = canonical_smiles(s) if s else None
        g = smiles_to_graph(can) if can else None
        if g is not None:
            graphs.append(g)
    if not graphs:
        return np.zeros((0, 0), np.float32)
    outs = []
    for start in range(0, len(graphs), chunk):
        part = graphs[start:start + chunk]
        n = ((max(g.n_nodes for g in part) + 7) // 8) * 8
        padded = pad_graph_batch(part, n)
        outs.append(np.asarray(encoder(
            params, jnp.asarray(padded["atom_types"]),
            jnp.asarray(padded["edge_classes"]),
            jnp.asarray(padded["node_mask"])), np.float32))
    return np.concatenate(outs, axis=0)


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """Fréchet distance between two Gaussians; trace(sqrtm(C1·C2)) via
    the eigenvalues of the (PSD-product) matrix — no iterative sqrtm."""
    eig = np.linalg.eigvals(cov1 @ cov2)
    tr_covmean = float(np.sum(np.sqrt(np.clip(eig.real, 0.0, None))))
    return float(np.sum((mu1 - mu2) ** 2) + np.trace(cov1)
                 + np.trace(cov2) - 2.0 * tr_covmean)


def frechet_graphclip_distance(encoder, params,
                               generated: List[str],
                               reference: List[str],
                               min_samples: int = 2) -> Optional[float]:
    """FGD: the Fréchet distance between GraphCLIP-embedding Gaussians
    of the generated and reference molecule sets — the first-party
    analog of FCD (Fréchet ChemNet Distance, the standard
    generative-chemistry distribution metric; ChemNet itself is not
    available offline). Meaningful with a TRAINED encoder and enough
    samples; with random weights it is only a harness check. Returns
    None when either set has < min_samples embeddable molecules."""
    a = _embed_molecules(encoder, params, generated)
    b = _embed_molecules(encoder, params, reference)
    if a.shape[0] < min_samples or b.shape[0] < min_samples:
        return None
    # small-sample regularization keeps the covariances PSD
    eps = 1e-6 * np.eye(a.shape[1])
    return frechet_distance(a.mean(0), np.cov(a, rowvar=False) + eps,
                            b.mean(0), np.cov(b, rowvar=False) + eps)


def oracle_property_metrics(oracle_path: str,
                            results: List[Dict[str, Any]]
                            ) -> Dict[str, Any]:
    """Score generated molecules against their REQUESTED conditions
    with the trained oracle: accuracy at 0.5 for binary channels,
    MAE in raw property units for continuous ones. Only records that
    requested a channel contribute to it."""
    from ..models.oracle import BINARY_CHANNELS, PropertyOracle

    oracle, params = PropertyOracle.from_pretrained(oracle_path)
    preds = oracle.predict_smiles(
        params, [r.get("llm_smiles") or "" for r in results])

    per_channel: Dict[str, List] = {p: [] for p in MOL_PROPERTIES}
    for r, pred in zip(results, preds):
        if pred is None:
            continue
        for name, want in (r.get("property") or {}).items():
            if name in per_channel:
                per_channel[name].append(
                    (float(pred[MOL_PROPERTIES.index(name)]), float(want)))

    acc: Dict[str, float] = {}
    mae: Dict[str, float] = {}
    counts: Dict[str, int] = {}
    binary_names = {MOL_PROPERTIES[c] for c in BINARY_CHANNELS}
    for name, pairs in per_channel.items():
        if not pairs:
            continue
        counts[name] = len(pairs)
        p = np.asarray([x for x, _ in pairs])
        w = np.asarray([y for _, y in pairs])
        if name in binary_names:
            acc[name] = float(((p > 0.5) == (w > 0.5)).mean())
        else:
            mae[name] = float(np.abs(p - w).mean())
    return {"property_accuracy": acc or None,
            "property_mae": mae or None,
            "property_scored_counts": counts or None}
