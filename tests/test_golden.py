"""Golden numerics freeze: a committed Torch-format snapshot + fixed inputs
must keep producing the committed answer ids and (approximately) the
committed select-aggregate scores.  Guards every future refactor of the
model math, the t7 codec and the converter against silent numeric drift —
the in-repo stand-in for the reference's downloadable trained snapshots
(SURVEY.md §4 "golden-file tests")."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from rau_vqa_tpu.config import ModelConfig
from rau_vqa_tpu.eval.predict import compute_answers, predict
from rau_vqa_tpu.utils.torch_convert import convert_snapshot

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_golden_answers():
    with open(os.path.join(GOLDEN, "expected.json")) as f:
        gold = json.load(f)
    cfg = ModelConfig(**gold["config"])
    params = convert_snapshot(os.path.join(GOLDEN, "model.t7"), cfg)
    data = np.load(os.path.join(GOLDEN, "inputs.npz"))

    tab_pred, tab_att = predict(params, cfg,
                                jnp.asarray(data["tokens"]),
                                jnp.asarray(data["lengths"]),
                                jnp.asarray(data["feats"]))
    oe, _ = compute_answers(tab_pred)
    np.testing.assert_array_equal(np.asarray(oe),
                                  np.asarray(gold["oe_answers"]))
    np.testing.assert_allclose(np.asarray(tab_pred[-1, 0]),
                               np.asarray(gold["select_scores_row0"]),
                               rtol=1e-4, atol=1e-5)


def test_golden_answer_normalization():
    """Freeze the official-metric normalization pipeline: these pairs pin
    every quirk (space-aware punctuation, decimal-preserving periods,
    digit-grouping commas, number words, article drop, contraction
    repair, the deliberately-dead 'im'/'ive' keys) across rounds — a
    change here silently changes every reported official accuracy."""
    import json as _json

    from rau_vqa_tpu.eval.vqa_accuracy import normalize_answer

    with open(os.path.join(GOLDEN, "normalization.json")) as f:
        frozen = _json.load(f)
    assert len(frozen) >= 30
    for raw, want in frozen.items():
        assert normalize_answer(raw) == want, (raw, want)
