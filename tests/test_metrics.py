"""Text metric tests (BLEU-4 / ROUGE / token accuracy)."""

import numpy as np
import pytest

from llamole_tpu.train.metric import (
    bleu4,
    compute_text_metrics,
    rouge_l,
    rouge_n,
    token_accuracy,
)
from llamole_tpu.utils.constants import IGNORE_INDEX


def test_token_accuracy():
    pred = np.asarray([[1, 2, 3, 4]])
    labels = np.asarray([[1, IGNORE_INDEX, 3, 9]])
    assert token_accuracy(pred, labels) == pytest.approx(2 / 3)


def test_bleu_identity():
    toks = "the cat sat on the mat".split()
    assert bleu4(toks, toks) == pytest.approx(1.0)
    assert bleu4([], toks) == 0.0


def test_bleu_orders():
    ref = "the cat sat on the mat".split()
    good = "the cat sat on mat".split()
    bad = "dog runs fast".split()
    assert bleu4(good, ref) > bleu4(bad, ref)


def test_rouge():
    ref = "a b c d".split()
    assert rouge_l(ref, ref) == pytest.approx(1.0)
    assert rouge_n(ref, ref, 2) == pytest.approx(1.0)
    assert rouge_l("a x c y".split(), ref) == pytest.approx(0.5)


def test_compute_text_metrics_keys():
    m = compute_text_metrics(["a b c"], ["a b d"])
    assert set(m) == {"bleu-4", "rouge-1", "rouge-2", "rouge-l"}
    assert 0 <= m["rouge-1"] <= 100
