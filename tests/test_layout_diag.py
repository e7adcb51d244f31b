"""Layout diagnosis: when a real Torch snapshot's nngraph ``parameters()``
order disagrees with the reconstruction in utils.torch_convert, the tools in
utils.layout_diag must detect and repair it (VERDICT r1 next-round #5).

The scenario: scramble the layout lists, export a snapshot flat vector in
that scrambled order (standing in for a released checkpoint with a different
true order), and show the recovery paths work:
  - content alignment against a trusted params tree recovers the true order
  - module-signature search recovers it from a score function alone
"""

import numpy as np
import jax

from rau_vqa_tpu.config import ModelConfig
from rau_vqa_tpu.models.rau import init_params
from rau_vqa_tpu.utils import layout_diag as ld
from rau_vqa_tpu.utils.torch_convert import (
    GROUP_LAYOUTS,
    flat_to_group,
    group_to_flat,
)

CFG = ModelConfig(
    vocab_size=50, answer_size=17, seq_len=9, embed_dim=8, rnn_size=16,
    rnn_layers=2, cnn_dim=12, cnn_w=3, cnn_h=2, multfeat_dim=16,
    attfeat_dim=8, att_rnn_size=16, att_rnn_layers=1, n_hops=3)


def _params():
    return jax.tree.map(np.asarray, init_params(jax.random.PRNGKey(7), CFG))


def _scrambled_mult_layout():
    """Swap the two ambiguous module pairs: att_q <-> att_i and
    h_proj <-> merge (exactly the mismatches size segmentation can't see)."""
    layout = list(GROUP_LAYOUTS["mult"](CFG))
    pos = {e[0]: i for i, e in enumerate(layout)}

    def swap_module(a, b):
        for leaf in ("w", "b"):
            i, j = pos[("mult", a, leaf)], pos[("mult", b, leaf)]
            layout[i], layout[j] = layout[j], layout[i]

    swap_module("att_q", "att_i")
    swap_module("h_proj", "merge")
    return layout


def test_ambiguity_report_names_confusable_entries():
    rep = ld.layout_report(CFG)
    assert "AMBIGUOUS" in rep
    assert "att_q" in rep and "att_i" in rep
    # embed: single tensor, nothing to confuse
    assert "[embed] 1 tensors" in rep


def test_content_alignment_recovers_scrambled_order():
    params = _params()
    scrambled = _scrambled_mult_layout()
    flat = group_to_flat(params["mult"], CFG, "mult",
                         layout=scrambled).astype(np.float32)

    # naive conversion silently mis-assigns the swapped tensors
    naive = flat_to_group(flat, CFG, "mult")
    assert not np.allclose(naive["att_q"]["w"], params["mult"]["att_q"]["w"])

    recovered = ld.align_flat_by_content(flat, CFG, "mult", params["mult"])
    assert [e[0] for e in recovered] == [e[0] for e in scrambled]
    diff = ld.layout_diff(CFG, "mult", recovered)
    assert diff and any("att_q" in d for d in diff)

    repaired = flat_to_group(flat, CFG, "mult", layout=recovered)
    for a, b in zip(jax.tree.leaves(repaired),
                    jax.tree.leaves(params["mult"])):
        np.testing.assert_array_equal(a, b)


def test_content_alignment_identity_when_order_matches():
    params = _params()
    for g in ("embed", "rnn", "mult"):
        flat = group_to_flat(params[g], CFG, g).astype(np.float32)
        recovered = ld.align_flat_by_content(flat, CFG, g, params[g])
        assert [e[0] for e in recovered] == [
            e[0] for e in GROUP_LAYOUTS[g](CFG)]
        assert ld.layout_diff(CFG, g, recovered) == []


def test_content_alignment_rejects_garbage():
    params = _params()
    flat = np.random.RandomState(0).randn(
        sum(int(np.prod(s)) for _, s, _ in GROUP_LAYOUTS["mult"](CFG))
    ).astype(np.float32)
    try:
        ld.align_flat_by_content(flat, CFG, "mult", params["mult"])
        raised = False
    except ValueError as e:
        raised = True
        assert "contents disagree" in str(e)
    assert raised


def test_candidate_layouts_cover_module_swaps():
    cands = ld.candidate_layouts(CFG, "mult")
    ours = GROUP_LAYOUTS["mult"](CFG)
    assert cands[0] == ours                      # null hypothesis first
    scrambled = _scrambled_mult_layout()
    assert any([e[0] for e in c] == [e[0] for e in scrambled]
               for c in cands)
    # embed has no module-level ambiguity
    assert len(ld.candidate_layouts(CFG, "embed")) == 1


def test_candidate_layouts_cover_i2h_h2h_swap():
    """i2h and h2h are SEPARATE torch Linears sharing our per-layer path
    prefix; for every layer with d_in == rnn_size their signatures are
    identical, so the candidate set must include the (wh,bh,wi,bi) order
    — grouping by path prefix alone would hide it."""
    rnn_cands = ld.candidate_layouts(CFG, "rnn")
    ours = GROUP_LAYOUTS["rnn"](CFG)
    assert rnn_cands[0] == ours
    L = CFG.rnn_layers - 1          # last layer always has d_in == R
    prefix = ("rnn", "layers", str(L))
    idx = next(i for i, e in enumerate(ours) if e[0][:3] == prefix)
    others = [e for e in ours if e[0][:3] != prefix]
    wi, bi, wh, bh = [e for e in ours if e[0][:3] == prefix]
    swapped = others[:idx] + [wh, bh, wi, bi] + others[idx:]
    assert any([e[0] for e in c] == [e[0] for e in swapped]
               for c in rnn_cands), \
        f"{len(rnn_cands)} candidates, i2h/h2h swap not among them"


def test_search_recovers_order_from_score_alone():
    """The released-snapshot scenario: no trusted tree, only a scoring
    oracle (stand-in for answer agreement with the released result JSONs)."""
    params = _params()
    scrambled = _scrambled_mult_layout()
    flat = group_to_flat(params["mult"], CFG, "mult",
                         layout=scrambled).astype(np.float32)

    def score(subtree) -> float:
        return -float(sum(
            np.abs(a - b).sum() for a, b in
            zip(jax.tree.leaves(subtree), jax.tree.leaves(params["mult"]))))

    best, best_score = ld.search_layout_by_score(flat, CFG, "mult", score)
    assert best_score == 0.0
    assert [e[0] for e in best] == [e[0] for e in scrambled]
