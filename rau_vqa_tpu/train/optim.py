"""From-scratch optimizers + gradient-pipeline ops on parameter pytrees.

Mirrors the reference's utils/optim_updates.lua (adam at :59-87, sgd :7,
sgdm :11, sgdmom :21, adagrad :33, rmsprop :46) as pure pytree transforms —
the Torch versions mutate a flat parameter vector in place; these return new
pytrees and compile into the fused train step.

Also implements the gradient pipeline the reference applies between backward
and the optimizer, in the same order (noise AFTER backward, clip AFTER noise —
Ours_SS/LstmAttCtrlGradNoiseDontSelect.lua:597-629):

- ``add_gradient_noise``: iid N(0, sqrt(eta/((t+1)*gamma))) — replicating the
  reference formula **as written** (eta divided by (t+1)*gamma, i.e. gamma is
  a multiplier, not an exponent; SURVEY.md §3.2 note at :597-605).
- ``clip_by_global_norm``: per-group L2 norm clip.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Pytree = Any


def tree_norm(tree: Pytree) -> jax.Array:
    # accumulate in f32: a bf16 sum-of-squares over a multi-million-element
    # conv leaf silently drops terms once the accumulator outgrows them by
    # 2^8 (the backbone group is bf16 in the fine-tune benches)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in jax.tree.leaves(tree)))


def add_gradient_noise(grads: Pytree, rng: jax.Array, step: jax.Array,
                       eta: float, gamma: float) -> Pytree:
    """grad += N(0, sqrt(eta / ((step+1)*gamma))) elementwise (reference
    :597-605; step is the 1-based iteration counter)."""
    std = jnp.sqrt(eta / ((step.astype(jnp.float32) + 1.0) * gamma))
    leaves, treedef = jax.tree.flatten(grads)
    keys = jax.random.split(rng, len(leaves))
    noised = [x + std.astype(x.dtype) * jax.random.normal(k, x.shape, x.dtype)
              for x, k in zip(leaves, keys)]
    return jax.tree.unflatten(treedef, noised)


def clip_by_global_norm(grads: Pytree, max_norm: float) -> Tuple[Pytree, jax.Array]:
    """Scale the whole group so its L2 norm is <= max_norm (reference
    :607-629 does this per param group).  Returns (clipped, pre-clip norm)."""
    norm = tree_norm(grads)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-20))
    return jax.tree.map(lambda x: x * scale.astype(x.dtype), grads), norm


def trust_ratio_cap(new_params: Pytree, old_params: Pytree,
                    tau: float) -> Pytree:
    """LARS/LAMB-style per-LEAF update cap: the step ``u = new - old`` is
    scaled so ``||u|| <= tau * (||w|| + 1e-3)`` for every leaf.

    Bounds a layer's multiplicative weight growth at (1 + tau) per step
    REGARDLESS of gradient pathology — the guard fine-tuning a deep conv
    stack needs: Adam's bias-corrected first steps are sign-like (±lr per
    weight), and a coherent sign pattern through K stacked convs compounds
    geometrically (measured: one such step inflates a random-init
    VGG16's pool5 std 56 -> 3247, saturating the head's tanh into an
    exactly-zero f32 gradient — BASELINE.md fine-tuning notes).  A normal
    fine-tune step moves a leaf ~1e-4 of its norm, far below any useful
    tau, so the cap is inert until pathology hits.  The +1e-3 floor keeps
    zero-init biases movable."""
    def cap(n, o):
        u = n - o
        # f32 norm accumulation (same reason as tree_norm: bf16 leaves)
        un = jnp.sqrt(jnp.sum(jnp.square(u.astype(jnp.float32))))
        wn = jnp.sqrt(jnp.sum(jnp.square(o.astype(jnp.float32))))
        scale = jnp.minimum(1.0, tau * (wn + 1e-3) / jnp.maximum(un, 1e-20))
        return o + u * scale.astype(u.dtype)

    return jax.tree.map(cap, new_params, old_params)


# ---------------------------------------------------------------------------
# Adam (optim_updates.lua:59-87 semantics)
# ---------------------------------------------------------------------------

def adam_init(params: Pytree) -> Dict:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return {"m": zeros, "v": jax.tree.map(jnp.zeros_like, params),
            "t": jnp.zeros((), jnp.int32)}


def adam_update(params: Pytree, grads: Pytree, lr: jax.Array, state: Dict, *,
                beta1: float = 0.9, beta2: float = 0.999,
                epsilon: float = 1e-8) -> Tuple[Pytree, Dict]:
    """x -= lr * sqrt(1-b2^t)/(1-b1^t) * m / (sqrt(v) + eps); eps is added
    OUTSIDE the sqrt, matching optim_updates.lua:78-86."""
    t = state["t"] + 1
    tf = t.astype(jnp.float32)
    m = jax.tree.map(lambda m_, g: beta1 * m_ + (1 - beta1) * g,
                     state["m"], grads)
    v = jax.tree.map(lambda v_, g: beta2 * v_ + (1 - beta2) * g * g,
                     state["v"], grads)
    step_size = lr * jnp.sqrt(1 - beta2 ** tf) / (1 - beta1 ** tf)
    params = jax.tree.map(
        lambda x, m_, v_: x - step_size.astype(x.dtype) * m_ / (jnp.sqrt(v_) + epsilon),
        params, m, v)
    return params, {"m": m, "v": v, "t": t}


# ---------------------------------------------------------------------------
# The rest of the optim_updates.lua family
# ---------------------------------------------------------------------------

def sgd_update(params: Pytree, grads: Pytree, lr) -> Pytree:
    return jax.tree.map(lambda x, g: x - lr * g, params, grads)


def sgdm_init(params: Pytree) -> Dict:
    return {"v": jax.tree.map(jnp.zeros_like, params)}


def sgdm_update(params, grads, lr, alpha, state):
    """Standard momentum (optim_updates.lua:11-19)."""
    v = jax.tree.map(lambda v_, g: alpha * v_ + lr * g, state["v"], grads)
    return jax.tree.map(lambda x, v_: x - v_, params, v), {"v": v}


def sgdmom_init(params: Pytree) -> Dict:
    return {"m": jax.tree.map(jnp.zeros_like, params)}


def sgdmom_update(params, grads, lr, alpha, state):
    """Nesterov momentum (optim_updates.lua:21-31):
    m' = alpha*m - lr*g;  x += -alpha*m + (1+alpha)*m'."""
    m_old = state["m"]
    m = jax.tree.map(lambda m_, g: alpha * m_ - lr * g, m_old, grads)
    params = jax.tree.map(lambda x, mo, mn: x - alpha * mo + (1 + alpha) * mn,
                          params, m_old, m)
    return params, {"m": m}


def adagrad_init(params: Pytree) -> Dict:
    return {"m": jax.tree.map(jnp.zeros_like, params)}


def adagrad_update(params, grads, lr, epsilon, state):
    m = jax.tree.map(lambda m_, g: m_ + g * g, state["m"], grads)
    params = jax.tree.map(lambda x, g, m_: x - lr * g / (jnp.sqrt(m_) + epsilon),
                          params, grads, m)
    return params, {"m": m}


def rmsprop_init(params: Pytree) -> Dict:
    return {"m": jax.tree.map(jnp.zeros_like, params)}


def rmsprop_update(params, grads, lr, alpha, epsilon, state):
    m = jax.tree.map(lambda m_, g: alpha * m_ + (1 - alpha) * g * g,
                     state["m"], grads)
    params = jax.tree.map(lambda x, g, m_: x - lr * g / (jnp.sqrt(m_) + epsilon),
                          params, grads, m)
    return params, {"m": m}
