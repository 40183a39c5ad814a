"""Reduced-precision tier safety: the f16 overflow guard.

Round-3 finding (commit bac7290): FMEN (3) and AALN (11) — dr=255 models
with ~1e5-scale pre-activations — overflowed float16 to NaN in the fast16
tier. The guard (ops/nn.py: saturating casts + f16-inf clamp on conv/
linear outputs + f32 accumulation for f16 reductions; models/aaln.py f32
statistics) keeps every model finite. Quality eligibility per model is a
separate, measured gate (tools/validate_numerics.py) — finiteness is the
safety floor this file pins.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntire2022_esr_tpu import config, ops
from ntire2022_esr_tpu.harness import registry


@pytest.mark.parametrize("mid", [3, 11])
def test_fast16_overflow_models_stay_finite(mid, rng):
    apply, params, name, dr, _ = registry.build_model(mid)
    x = jnp.asarray(rng.rand(1, 48, 48, 3).astype(np.float32) * dr)
    with config.numerics_mode("fast16"):
        y = np.asarray(jax.jit(lambda p, a: apply(p, a))(params, x),
                       dtype=np.float32)
    assert np.isfinite(y).all(), f"{name}: fast16 produced non-finite values"


def test_fast16_guard_does_not_change_in_range_outputs(rng):
    # a model that never overflowed must be bit-identical with the guard
    # (clip at +-65504 is a no-op in range); RLFN (4), dr=255
    apply, params, name, dr, _ = registry.build_model(4)
    x = jnp.asarray(rng.rand(1, 24, 24, 3).astype(np.float32) * dr)
    with config.numerics_mode("fast16"):
        y = np.asarray(jax.jit(lambda p, a: apply(p, a))(params, x),
                       dtype=np.float32)
    assert np.isfinite(y).all()
    # and quality stays at the tier's expected level vs parity
    ref = np.asarray(jax.jit(lambda p, a: apply(p, a))(params, x))
    mse = np.mean((np.clip(ref, 0, dr) - np.clip(y, 0, dr)) ** 2) / dr ** 2
    assert 10 * np.log10(1 / max(mse, 1e-12)) > 55


def test_saturating_cast_and_clamp():
    big = jnp.asarray([1e6, -1e6, 3.0], jnp.float32)
    out = ops.nn.cast_compute(big, jnp.float16)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    inf16 = jnp.asarray([np.inf, -np.inf, 1.0], jnp.float16)
    sat = ops.nn.saturate_f16(inf16)
    assert np.isfinite(np.asarray(sat, np.float32)).all()
    # other dtypes pass through untouched
    f32 = jnp.asarray([np.inf], jnp.float32)
    assert np.isinf(np.asarray(ops.nn.saturate_f16(f32))).all()


def test_fasthi_is_high_contraction_rounded_to_bf16(rng):
    # fasthi's defining invariant (config.py): the contraction runs with
    # f32 operands at HIGH precision — identical to `high` — and ONLY the
    # stored output is rounded to bf16. For an f32 input a single conv
    # must therefore equal the high-mode conv bit-rounded to bf16.
    x = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    p = {"weight": jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1),
         "bias": jnp.asarray(rng.randn(8).astype(np.float32))}
    with config.numerics_mode("high"):
        ref = jax.jit(lambda pp, a: ops.conv(pp, a))(p, x)
    with config.numerics_mode("fasthi"):
        out = jax.jit(lambda pp, a: ops.conv(pp, a))(p, x)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out, np.float32),
        np.asarray(ref.astype(jnp.bfloat16), np.float32))


def test_fasthi16_stores_f16_saturating(rng):
    # fasthi16 = fasthi with f16 storage: conv output dtype f16, stores
    # saturate (never inf) even when the f32 contraction overflows range
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32)) * 300.0
    p = {"weight": jnp.asarray(np.full((3, 3, 4, 4), 30.0, np.float32))}
    with config.numerics_mode("fasthi16"):
        out = jax.jit(lambda pp, a: ops.conv(pp, a))(p, x)
    assert out.dtype == jnp.float16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_fasthi_model_agreement_beats_fast(rng):
    # the tier's reason to exist: removing weight rounding + 1-pass
    # multiplies leaves only activation-storage rounding, which must
    # agree with parity strictly better than `fast` (measured ~3-6 dB
    # tighter across the zoo on CPU; assert a conservative margin)
    apply, params, name, dr, _ = registry.build_model(26)
    x = jnp.asarray(rng.rand(1, 48, 48, 3).astype(np.float32) * dr)
    outs = {}
    for m in ("parity", "fast", "fasthi"):
        with config.numerics_mode(m):
            outs[m] = np.asarray(
                jax.jit(lambda p, a, _m=m: apply(p, a))(params, x), np.float32)
    def agree(m):
        mse = np.mean((outs[m].astype(np.float64) - outs["parity"]) ** 2)
        return 10 * np.log10(dr ** 2 / max(mse, 1e-12))
    assert agree("fasthi") > 40.0
    assert agree("fasthi") >= agree("fast") + 1.0


def test_f16_pool_reductions_do_not_overflow():
    x = jnp.full((1, 48, 48, 8), 200.0, jnp.float16)
    for fn in (lambda v: ops.global_avg_pool(v),
               lambda v: ops.global_std_pool(v),
               lambda v: ops.avg_pool2d(v, 7, 3)):
        out = np.asarray(fn(x), np.float32)
        assert np.isfinite(out).all()
    assert abs(float(ops.global_avg_pool(x)[0, 0, 0, 0]) - 200.0) < 1.0
