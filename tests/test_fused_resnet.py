"""Stage-fused ResNet bottleneck kernel (ops/fused_resnet.py): parity vs
the XLA folded path — the VERDICT r3 #2 block-fusion A/B candidate.

CPU runs the kernel under the Pallas interpreter (same math); the Mosaic
compile + the measured verdict happen on the rig via
`bench_pixels --fused-stages` (scripts/run_pending_measurements.sh)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rau_vqa_tpu.models.backbones.resnet import (
    _bottleneck_folded,
    fold_batchnorm,
    resnet101_apply,
    resnet101_init,
)
from rau_vqa_tpu.ops.fused_resnet import (
    fused_identity_stage,
    pick_block_b,
    stack_identity_blocks,
)


def _blocks(rs, n, c, cw, dtype=jnp.float32):
    def blk():
        return {
            "conv1": {"w": jnp.asarray(rs.randn(1, 1, c, cw) * .2, dtype),
                      "b": jnp.asarray(rs.randn(cw) * .1, dtype)},
            "conv2": {"w": jnp.asarray(rs.randn(3, 3, cw, cw) * .2, dtype),
                      "b": jnp.asarray(rs.randn(cw) * .1, dtype)},
            "conv3": {"w": jnp.asarray(rs.randn(1, 1, cw, c) * .2, dtype),
                      "b": jnp.asarray(rs.randn(c) * .1, dtype)},
        }
    return [blk() for _ in range(n)]


@pytest.mark.parametrize("block_b", [1, 2, 4])
def test_fused_stage_matches_xla(block_b):
    """The kernel IS the folded identity-block sequence: f32 highest
    precision parity at the accumulation-reassociation floor."""
    rs = np.random.RandomState(0)
    B, H, W, C, Cw, N = 4, 6, 6, 32, 8, 3
    blocks = _blocks(rs, N, C, Cw)
    x = jnp.asarray(rs.randn(B, H, W, C), jnp.float32)
    ref = x
    for b in blocks:
        ref = _bottleneck_folded(ref, b, 1)
    out = fused_identity_stage(x, stack_identity_blocks(blocks),
                               block_b=block_b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_stage_bf16():
    """bf16 operands (the serving dtype): f32 accumulation inside, output
    within bf16 rounding of the XLA bf16 path."""
    rs = np.random.RandomState(1)
    blocks = _blocks(rs, 2, 32, 8, jnp.bfloat16)
    x = jnp.asarray(rs.randn(2, 4, 4, 32), jnp.bfloat16)
    ref = x
    for b in blocks:
        ref = _bottleneck_folded(ref, b, 1)
    out = fused_identity_stage(x, stack_identity_blocks(blocks),
                               block_b=1, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.1, atol=0.1)


def test_pick_block_b():
    assert pick_block_b(64, 4) == 4
    assert pick_block_b(64, 0) == 1     # want clamps to >= 1
    assert pick_block_b(6, 4) == 3      # largest divisor <= want
    assert pick_block_b(7, 4) == 1
    with pytest.raises(ValueError, match="not divisible"):
        rs = np.random.RandomState(2)
        blocks = _blocks(rs, 1, 32, 8)
        fused_identity_stage(jnp.zeros((3, 4, 4, 32), jnp.float32),
                             stack_identity_blocks(blocks), block_b=2,
                             interpret=True)


@pytest.mark.slow   # full resnet101 through the interpreter (~10 s)
def test_resnet_apply_fused_stages_parity():
    """resnet101_apply(fused_stages=(0,1,2,3)) equals the plain folded
    apply at f32 highest precision — the integration the bench A/B runs
    (each stage's downsample block stays on XLA, identity runs fuse)."""
    rs = np.random.RandomState(0)
    bb = fold_batchnorm(resnet101_init(jax.random.PRNGKey(1)))
    x = jnp.asarray(rs.randn(2, 64, 64, 3).astype(np.float32))
    ref = resnet101_apply(bb, x)
    out = resnet101_apply(bb, x, fused_stages=(0, 1, 2, 3),
                          fused_interpret=True)
    ref = np.asarray(ref)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(out) / scale, ref / scale,
                               atol=3e-5)


@pytest.mark.parametrize("shape", [
    (64, 28, 1024, 256, 22, 4),   # stage 2 at 448 px (the A/B target)
    (64, 14, 2048, 512, 2, 8),    # stage 3
    (64, 56, 512, 128, 3, 1),     # stage 1
])
def test_tpu_lowering_no_hardware(shape):
    """jax.export lowers for the TPU platform WITHOUT a TPU device, which
    runs the client-side Pallas->Mosaic lowering rules at the REAL A/B
    shapes — catching unsupported-op/layout lowering failures offline
    (the tunnel outage means the first Mosaic compile otherwise happens
    unattended mid-sweep).  Backend passes (VMEM fit, compile time) still
    only run on the rig."""
    import jax.numpy as jnp
    from jax import export as jexport

    B, H, C, Cw, N, bb = shape
    stack_s = {k: jax.ShapeDtypeStruct(s, jnp.bfloat16) for k, s in {
        "w1": (N, C, Cw), "b1": (N, 1, Cw), "w2": (N, 9, Cw, Cw),
        "b2": (N, 1, Cw), "w3": (N, Cw, C), "b3": (N, 1, C)}.items()}
    x_s = jax.ShapeDtypeStruct((B, H, H, C), jnp.bfloat16)
    exp = jexport.export(
        jax.jit(lambda x, st: fused_identity_stage(
            x, st, block_b=bb, interpret=False)),
        platforms=("tpu",))(x_s, stack_s)
    # the Mosaic kernel module must actually be embedded (a silently
    # interpreted path would "lower" trivially)
    assert b"tpu_custom_call" in exp.mlir_module_serialized or \
        "tpu_custom_call" in exp.mlir_module()


@pytest.mark.slow   # three real backend compiles, ~40 s total
@pytest.mark.parametrize("shape", [
    (64, 28, 1024, 256, 22, 2),   # stage 2 at 448 px (the A/B target)
    (64, 14, 2048, 512, 8, 8),    # stage 3 width at a deeper-N stress
    (64, 56, 512, 128, 3, 1),     # stage 1
])
def test_tpu_backend_compile(shape):
    """Chipless AOT compile through the LOCAL libtpu backend — the same
    TpuAotCompiler the tunnel's remote helper runs.  Unlike the
    jax.export lowering smoke above, this executes Mosaic's backend
    passes (alignment legality, rotate dtype support, scoped-vmem fit)
    and reproduced all three on-rig fused-kernel failures offline
    (docs/mosaic_notes.md #8-10)."""
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    try:
        topo = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:1x1x1",
            chips_per_host_bounds=[1, 1, 1])
    except Exception as e:  # noqa: BLE001 — no local libtpu on this host
        pytest.skip(f"chipless TPU topology unavailable: {e}")
    mesh = Mesh(np.array(topo.devices), ("d",))
    sh = NamedSharding(mesh, PartitionSpec())

    B, H, C, Cw, N, bb = shape
    x = jax.ShapeDtypeStruct((B, H, H, C), jnp.bfloat16, sharding=sh)
    st = {k: jax.ShapeDtypeStruct(s, jnp.bfloat16, sharding=sh)
          for k, s in {
              "w1": (N, C, Cw), "b1": (N, 1, Cw), "w2": (N, 9, Cw, Cw),
              "b2": (N, 1, Cw), "w3": (N, Cw, C), "b3": (N, 1, C)}.items()}
    # serving precision: conftest pins matmul precision "highest" for
    # parity tests, but Mosaic rejects fp32 contract precision on bf16
    # operands ("Bad lhs type") — the benches run "default"
    with jax.default_matmul_precision("default"):
        jax.jit(lambda xx, stt: fused_identity_stage(
            xx, stt, block_b=bb, interpret=False)).lower(x, st).compile()
