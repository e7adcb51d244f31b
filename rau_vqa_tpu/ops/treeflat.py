"""Flatten/rebuild helpers shared by the Pallas kernel wrappers.

The fused kernels (ops/rau_hops.py, ops/rau_train_hops.py) pass the mult
param subtree to pallas_call as a FLAT operand list in a fixed order;
these two helpers convert between the pytree and that list.  One shared
implementation: the rebuild path walks by POSITION (enumerate), never by
``path.index(p)`` — value-based lookup silently resolves the wrong
element for any path with a repeated key."""

from __future__ import annotations

from typing import Dict, Sequence


def pluck(mp: Dict, path: Sequence):
    """Fetch a leaf by path from a nested dict/list tree."""
    node = mp
    for p in path:
        node = node[p]
    return node


def rebuild(order: Sequence[Sequence], flat: Sequence) -> Dict:
    """Inverse of ``[pluck(mp, p) for p in order]``: reassemble the nested
    dict/list tree from the flat leaf list."""
    mp: Dict = {}
    for path, leaf in zip(order, flat):
        node = mp
        for j, p in enumerate(path[:-1]):
            if isinstance(p, int):
                while len(node) <= p:
                    node.append({})
                node = node[p]
            else:
                if p not in node:
                    node[p] = [] if isinstance(path[j + 1], int) else {}
                node = node[p]
        node[path[-1]] = leaf
    return mp
