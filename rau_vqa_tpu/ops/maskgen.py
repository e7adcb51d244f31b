"""Counter-based dropout mask generation shared by Pallas kernels and XLA.

The fused training kernel (ops/rau_train_hops.py) regenerates its dropout
masks in the backward pass instead of saving them.  ``pltpu.prng_random_bits``
would be the obvious tool, but it is a no-op (all-zero bits) under the Pallas
TPU *interpreter*, which would make the kernel untestable off-TPU.  Instead,
masks are derived from a stateless counter hash (the murmur3 finalizer over
the element's GLOBAL index) built from plain uint32 vector ops — bit-identical
inside a Pallas kernel, under the interpreter, and in ordinary XLA:

- the same mask math runs in the pure-XLA reference path
  (``rau_train_hops_reference``), so kernel-vs-XLA parity tests can compare
  exact dropout realizations;
- masks are a function of the element's position in the FULL batch (not the
  kernel's batch tile), so they are independent of ``block_b``.

Statistical quality: murmur3's 32-bit finalizer has full avalanche — far more
than dropout needs.  The reference uses torch's global RNG
(``nn.Dropout``, used at Ours_SS/LstmAttCtrlGradNoiseDontSelect.lua:205,233,
239,277); exact mask streams are not part of behavioural parity, only the
keep-probability/scale semantics are.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_U = jnp.uint32


def mix32(x: jax.Array) -> jax.Array:
    """murmur3 fmix32: bijective avalanche mix on uint32."""
    x = x.astype(_U)
    x = x ^ (x >> 16)
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def site_salt(seed: jax.Array, hop, site: int) -> jax.Array:
    """Per-(seed, hop, site) scalar salt.  ``hop`` may be a traced int32
    (kernel fori_loop index); ``site`` is a static int."""
    h = jnp.asarray(hop, _U) * np.uint32(0x9E3779B9)
    s = np.uint32(((site + 1) * 0x85EBCA6B) & 0xFFFFFFFF)
    return mix32(jnp.asarray(seed, _U) ^ h ^ s)


def counter_bits(local_shape, row_offset, salt: jax.Array) -> jax.Array:
    """uint32 hash bits for a tile of a global array.

    ``local_shape`` is the tile's shape; dim 0 is the (globally sharded)
    batch dim and ``row_offset`` is the tile's starting global row.  Bits for
    element (b, i1, .., ik) depend only on the global linear index, so any
    tiling of the batch yields the same per-element bits.
    """
    strides = []
    acc = 1
    for d in reversed(local_shape[1:]):
        strides.append(acc)
        acc *= d
    strides = list(reversed(strides))  # strides for dims 1..k
    row = (jax.lax.broadcasted_iota(_U, local_shape, 0)
           + jnp.asarray(row_offset, _U))
    idx = row * np.uint32(acc)
    for d in range(1, len(local_shape)):
        idx = idx + (jax.lax.broadcasted_iota(_U, local_shape, d)
                     * np.uint32(strides[d - 1]))
    return mix32(idx * np.uint32(2654435761) ^ salt)


def dropout_scale_mask(local_shape, row_offset, salt: jax.Array,
                       rate: float, dtype=jnp.float32) -> jax.Array:
    """Inverted-dropout scale factors: 1/(1-rate) with prob (1-rate), else 0.

    Matches torch nn.Dropout train-time semantics (scale-at-train), the same
    contract as models/cells.dropout."""
    bits = counter_bits(local_shape, row_offset, salt)
    thresh = np.uint32(min(int(round(rate * 2.0 ** 32)), 2 ** 32 - 1))
    keep = bits >= thresh
    scale = np.asarray(1.0 / (1.0 - rate), np.float32)
    return jnp.where(keep, jnp.asarray(scale, dtype),
                     jnp.zeros((), dtype)).astype(dtype)
