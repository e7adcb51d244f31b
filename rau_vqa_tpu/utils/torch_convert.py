"""Torch7 snapshot converter.

The reference checkpoints hold three flat parameter vectors —
``checkpoint.params = {embed, rnn, mult}`` produced by ``:getParameters()``
(Ours_SS/LstmAttCtrlGradNoiseDontSelect.lua:322-324, saved at :1188-1197).
This module slices those vectors back into the rau_vqa_tpu parameter pytree
(and the inverse), so released Torch checkpoints can be evaluated through
the TPU pipeline (golden-output strategy, SURVEY.md §4/§5).

Layout facts encoded here:

- Torch ``Linear`` stores ``weight [out, in]`` then ``bias [out]``; our
  convention is ``w [in, out]`` (x @ W), so weights transpose.
- ``SpatialConvolution(cin, cout, 1, 1)`` stores ``[cout, cin, 1, 1]`` —
  identical to a Linear after squeezing, transposed likewise.
- ``LookupTable`` stores ``[V, E]`` row-major.  Torch's 1-based rows are the
  same physical storage rows as our 0-based token ids (ZEROPAD is torch row
  1 == storage row 0 == our id 0), so the matrix maps verbatim.
- Flattening order follows ``module:parameters()``: depth-first over the
  container/graph in construction/topological order.  The per-group orders
  below are reconstructed from the build sequence of the nngraph modules
  (reference :198-320, model/DeepLSTM.lua, model/ATTLSTM.lua).  The order is
  data (one list per group), so a disagreement with a real snapshot is a
  one-line fix validated by the round-trip + answer-distribution tests.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from rau_vqa_tpu.config import ModelConfig

# one layout entry: (destination path in the params pytree,
#                    torch storage shape, needs_transpose)
Entry = Tuple[Tuple[str, ...], Tuple[int, ...], bool]


def embed_layout(cfg: ModelConfig) -> List[Entry]:
    """word_embed = LookupTable(V, E) (reference :203-206)."""
    return [(("embed", "lookup"), (cfg.vocab_size, cfg.embed_dim), False)]


def rnn_layout(cfg: ModelConfig) -> List[Entry]:
    """DeepLSTM: per layer i2h Linear(in, 4R) then h2h Linear(R, 4R)
    (DeepLSTM.lua:43-44), layers in order."""
    R = cfg.rnn_size
    out: List[Entry] = []
    d_in = cfg.embed_dim
    for L in range(cfg.rnn_layers):
        out += [
            (("rnn", "layers", str(L), "wi"), (4 * R, d_in), True),
            (("rnn", "layers", str(L), "bi"), (4 * R,), False),
            (("rnn", "layers", str(L), "wh"), (4 * R, R), True),
            (("rnn", "layers", str(L), "bh"), (4 * R,), False),
        ]
        d_in = R
    return out


def mult_layout(cfg: ModelConfig) -> List[Entry]:
    """The multimodal gModule's parameterized children in topological order
    (reference :291-307): q_embed -> i_embed -> attbycontent -> attbymemory
    -> classifier (which nests feat_attprob, ATTLSTM, merge, score, do_pred
    in its own construction order, :265-283)."""
    S = cfg.cnn_spat
    M = cfg.multfeat_dim
    F = cfg.attfeat_dim
    Ra = cfg.att_rnn_size
    out: List[Entry] = []
    # [q_embed] q_proj then h_proj (:233-234)
    out += [(("mult", "q_proj", "w"), (M, cfg.rnnout_dim), True),
            (("mult", "q_proj", "b"), (M,), False),
            (("mult", "h_proj", "w"), (M, cfg.att_state_dim), True),
            (("mult", "h_proj", "b"), (M,), False)]
    # [i_embed] 1x1 conv cnn_dim -> M (:240)
    out += [(("mult", "i_embed", "w"), (M, cfg.cnn_dim), True),
            (("mult", "i_embed", "b"), (M,), False)]
    # [attbycontent] qfeatatt Linear, ifeatproj conv, attscore conv (:246-251)
    out += [(("mult", "att_q", "w"), (F, M), True),
            (("mult", "att_q", "b"), (F,), False),
            (("mult", "att_i", "w"), (F, M), True),
            (("mult", "att_i", "b"), (F,), False),
            (("mult", "att_score", "w"), (1, F), True),
            (("mult", "att_score", "b"), (1,), False)]
    # [attbymemory] Linear att_state -> S (:287)
    out += [(("mult", "att_mem", "w"), (S, cfg.att_state_dim), True),
            (("mult", "att_mem", "b"), (S,), False)]
    # [classifier] (:265-283): feat_attprob, ATTLSTM (i2h, h2h per layer),
    # merge, out_score, do_pred
    out += [(("mult", "attprob_proj", "w"), (M, S), True),
            (("mult", "attprob_proj", "b"), (M,), False)]
    d_in = M
    for L in range(cfg.att_rnn_layers):
        out += [
            (("mult", "attlstm", "layers", str(L), "wi"), (4 * Ra, d_in), True),
            (("mult", "attlstm", "layers", str(L), "bi"), (4 * Ra,), False),
            (("mult", "attlstm", "layers", str(L), "wh"), (4 * Ra, Ra), True),
            (("mult", "attlstm", "layers", str(L), "bh"), (4 * Ra,), False),
        ]
        d_in = Ra
    out += [(("mult", "merge", "w"), (M, cfg.att_state_dim), True),
            (("mult", "merge", "b"), (M,), False),
            (("mult", "cls", "w"), (cfg.answer_size, M), True),
            (("mult", "cls", "b"), (cfg.answer_size,), False),
            (("mult", "do_pred", "w"), (1, M), True),
            (("mult", "do_pred", "b"), (1,), False)]
    return out


GROUP_LAYOUTS = {"embed": embed_layout, "rnn": rnn_layout, "mult": mult_layout}


def _get(tree: Dict, path: Tuple[str, ...]):
    """tree is {group: subtree}; path starts with the group name."""
    node: Any = tree
    for p in path:
        node = node[int(p)] if p.isdigit() else node[p]
    return node


def _ensure_parent(tree: Dict, path: Tuple[str, ...]):
    """Create nested dicts/lists along path[:-1]; returns the parent node.
    A path segment followed by a digit segment holds a list."""
    node: Any = tree
    for i, p in enumerate(path[:-1]):
        child_is_list = path[i + 1].isdigit()
        if p.isdigit():
            idx = int(p)
            while len(node) <= idx:
                node.append([] if child_is_list else {})
            node = node[idx]
        else:
            if p not in node:
                node[p] = [] if child_is_list else {}
            node = node[p]
    return node


def _set(tree: Dict, path: Tuple[str, ...], value):
    parent = _ensure_parent(tree, path)
    last = path[-1]
    if last.isdigit():
        idx = int(last)
        while len(parent) <= idx:
            parent.append(None)
        parent[idx] = value
    else:
        parent[last] = value


def group_size(cfg: ModelConfig, group: str) -> int:
    return sum(int(np.prod(shape)) for _, shape, _ in GROUP_LAYOUTS[group](cfg))


def flat_to_group(flat: np.ndarray, cfg: ModelConfig, group: str,
                  layout: List[Entry] = None) -> Dict:
    """Slice one torch flat vector into the {group: subtree} of our pytree.
    ``layout`` overrides the reconstructed GROUP_LAYOUTS order (e.g. one
    recovered by utils.layout_diag when a real snapshot's nngraph
    ``parameters()`` order disagrees)."""
    layout = GROUP_LAYOUTS[group](cfg) if layout is None else layout
    want = sum(int(np.prod(s)) for _, s, _ in layout)
    if flat.size != want:
        raise ValueError(
            f"{group} flat vector has {flat.size} elements; config expects "
            f"{want} — model dims disagree with the snapshot")
    tree: Dict = {group: {}}
    off = 0
    for path, shape, transpose in layout:
        n = int(np.prod(shape))
        arr = flat[off:off + n].reshape(shape)
        off += n
        _set(tree, path, np.ascontiguousarray(arr.T if transpose else arr,
                                              dtype=np.float32))
    return tree[group]


def group_to_flat(params: Dict, cfg: ModelConfig, group: str,
                  layout: List[Entry] = None) -> np.ndarray:
    """Inverse: our {group} subtree -> the torch flat vector."""
    layout = GROUP_LAYOUTS[group](cfg) if layout is None else layout
    chunks = []
    for path, shape, transpose in layout:
        arr = np.asarray(_get({group: params}, path))
        if transpose:
            arr = arr.T
        if arr.shape != shape:
            raise ValueError(f"{path}: shape {arr.shape} != layout {shape}")
        chunks.append(np.ascontiguousarray(arr, np.float64).reshape(-1))
    return np.concatenate(chunks)


def flats_from_snapshot(snap) -> List[np.ndarray]:
    """The three flat parameter vectors of an already-parsed snapshot
    table (large t7 blobs should parse once per run)."""
    if isinstance(snap, dict):
        flats = snap["params"]
    else:
        raise ValueError("expected a snapshot table")
    if isinstance(flats, dict):   # lua 1-based table -> dict
        flats = [flats[float(i)] for i in (1, 2, 3)]
    return [np.asarray(f).reshape(-1) for f in flats]


def snapshot_flats(t7_path: str) -> List[np.ndarray]:
    """Load the three flat parameter vectors from a reference snapshot."""
    from rau_vqa_tpu.data import t7

    return flats_from_snapshot(t7.load_t7(t7_path))


def convert_snapshot(t7_path: str, cfg: ModelConfig,
                     layouts: Dict[str, List[Entry]] = None) -> Dict:
    """Load a reference training snapshot
    (``{it, opt, epoch, params={1: embed, 2: rnn, 3: mult}}``,
    reference :1192-1197) and return the rau_vqa_tpu params pytree.
    ``layouts`` overrides per-group orderings (see utils.layout_diag)."""
    embed_flat, rnn_flat, mult_flat = snapshot_flats(t7_path)
    layouts = layouts or {}
    return {
        "embed": flat_to_group(embed_flat, cfg, "embed",
                               layouts.get("embed")),
        "rnn": flat_to_group(rnn_flat, cfg, "rnn", layouts.get("rnn")),
        "mult": flat_to_group(mult_flat, cfg, "mult", layouts.get("mult")),
    }


def export_snapshot(t7_path: str, params: Dict, cfg: ModelConfig, *,
                    it: int = 0, epoch: float = 0.0,
                    opt: Dict = None) -> None:
    """Write our params as a reference-format snapshot (round-trip tests +
    interop back toward the Torch implementation).  ``opt`` adds the
    snapshot's self-describing option table — the reference stores its full
    CmdLine opt and Eval.lua adopts ``snap.opt.nhop``/``alg_name`` from it
    (reference :1192-1196, Eval.lua:116-118)."""
    from rau_vqa_tpu.data import t7

    snap = {
        "it": float(it),
        "epoch": float(epoch),
        "params": [group_to_flat(params[g], cfg, g).astype(np.float32)
                   for g in ("embed", "rnn", "mult")],
    }
    if opt is not None:
        snap["opt"] = opt
    t7.save_t7(t7_path, snap)
