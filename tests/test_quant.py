"""w8 int8 weight tier (porter/quant.py + ops dequant-at-use).

Storage-only tier: activations/accumulation keep the active mode, so the
error bound is the per-channel quantization step. These tests pin the
round-trip bound, the skip rules, the op-level dequant path (plain,
grouped, fused, linear), and a whole-model quality floor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntire2022_esr_tpu import config, ops, porter
from ntire2022_esr_tpu.harness import registry
from ntire2022_esr_tpu.porter.quant import quantize_array_int8


def test_quantize_array_roundtrip_bound(rng):
    w = rng.randn(3, 3, 16, 24).astype(np.float32)
    q, scale = quantize_array_int8(w)
    assert q.dtype == np.int8 and scale.shape == (1, 1, 16, 24)
    back = q.astype(np.float32) * scale
    # symmetric per-(cin,cout): |err| <= scale/2 per tap
    assert np.all(np.abs(back - w) <= scale / 2 + 1e-7)


def test_quantize_zero_channel_safe():
    w = np.zeros((1, 1, 4, 2), np.float32)
    q, scale = quantize_array_int8(w)
    assert np.all(q == 0) and np.isfinite(scale).all()


def test_quantize_params_skips_mean_shift_and_vectors(rng):
    tree = {
        "conv": {"weight": rng.randn(3, 3, 4, 8).astype(np.float32),
                 "bias": rng.randn(8).astype(np.float32)},
        "sub_mean": {"weight": rng.randn(1, 1, 3, 3).astype(np.float32)},
        "act": {"weight": rng.randn(8).astype(np.float32)},  # prelu, 1-D
    }
    q = porter.quantize_params_int8(tree)
    assert q["conv"]["weight"].dtype == np.int8
    assert "weight_scale" in q["conv"]
    assert q["sub_mean"]["weight"].dtype == np.float32  # MeanShift untouched
    assert q["act"]["weight"].dtype == np.float32       # vectors untouched
    assert q["conv"]["bias"].dtype == np.float32
    back = porter.dequantize_params(q)
    assert back["conv"]["weight"].dtype == np.float32


def test_conv_and_linear_dequant_paths(rng):
    x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    p = {"weight": rng.randn(3, 3, 4, 8).astype(np.float32) * 0.3,
         "bias": rng.randn(8).astype(np.float32)}
    ref = np.asarray(ops.conv(p, x))
    qp = porter.quantize_params_int8({"c": p})["c"]
    got = np.asarray(ops.conv(qp, x))
    assert np.abs(got - ref).max() < 0.05  # int8 step on 0.3-scale weights

    lin = {"weight": rng.randn(4, 6).astype(np.float32) * 0.3,
           "bias": rng.randn(6).astype(np.float32)}
    ref_l = np.asarray(ops.linear(lin, x))
    ql = porter.quantize_params_int8({"l": lin})["l"]
    assert np.abs(np.asarray(ops.linear(ql, x)) - ref_l).max() < 0.05


def test_fused_paths_compose_with_w8(rng):
    from ntire2022_esr_tpu.ops.fused import nearest2_conv, parallel_conv_same

    x = jnp.asarray(rng.rand(1, 6, 6, 4).astype(np.float32))
    p = {"weight": rng.randn(3, 3, 4, 8).astype(np.float32) * 0.3,
         "bias": rng.randn(8).astype(np.float32)}
    qp = porter.quantize_params_int8({"c": p})["c"]
    ref = np.asarray(nearest2_conv(p, x))
    got = np.asarray(nearest2_conv(qp, x))
    assert np.abs(got - ref).max() < 0.1
    ps = [{"weight": rng.randn(1, 1, 4, 3).astype(np.float32) * 0.3}
          for _ in range(2)]
    qs = [porter.quantize_params_int8({"c": q})["c"] for q in ps]
    for r, g in zip(parallel_conv_same(ps, x, padding=0),
                    parallel_conv_same(qs, x, padding=0)):
        assert np.abs(np.asarray(g) - np.asarray(r)).max() < 0.05


def test_whole_model_w8_quality_floor(rng):
    """RLFN under w8 must stay visually faithful to the f32 forward
    (>= 44 dB agreement on uniform-noise input — natural images measure
    higher; the on-chip benchmark-delta table is the real quality gate,
    this pins the machinery at per-(cin,cout) scale granularity)."""
    config.set_weights_int8(True)
    try:
        apply, qparams, name, dr, _ = registry.build_model(4)
    finally:
        config.set_weights_int8(False)
    apply, params, *_ = registry.build_model(4)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * dr)
    ref = np.asarray(jax.jit(lambda p, a: apply(p, a))(params, x))
    got = np.asarray(jax.jit(lambda p, a: apply(p, a))(qparams, x))
    mse = np.mean((np.clip(ref, 0, dr) - np.clip(got, 0, dr)) ** 2) / dr ** 2
    db = 10 * np.log10(1 / max(mse, 1e-12))
    assert db > 44, db
    # params really are int8 in storage
    leaves = jax.tree_util.tree_leaves(qparams)
    assert any(getattr(l, "dtype", None) == np.int8 for l in leaves)
