"""Pallas kernel parity (interpret mode on CPU; compiled path runs on TPU)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ntire2022_esr_tpu import ops


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    yield


def _ref_chain(x, ws, bs, slope, residual):
    h = x
    for wk, bk in zip(ws, bs):
        h = ops.leaky_relu(ops.conv2d(h, wk, bk), slope)
    return h + x if residual else h


@pytest.mark.parametrize("n_convs,residual,shape,tile", [
    (3, True, (1, 40, 52, 16), (32, 32)),
    (1, False, (2, 33, 47, 8), (16, 32)),
    (2, True, (1, 64, 64, 24), (64, 64)),
])
def test_fused_conv3x3_chain(rng, interpret_pallas, n_convs, residual, shape, tile):
    from ntire2022_esr_tpu.ops.pallas import fused_conv3x3_chain

    n, h, w, c = shape
    x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.5)
    ws = [jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.05) for _ in range(n_convs)]
    bs = [jnp.asarray(rng.randn(c).astype(np.float32) * 0.1) for _ in range(n_convs)]
    ref = _ref_chain(x, ws, bs, 0.05, residual)
    out = fused_conv3x3_chain(x, ws, bs, slope=0.05, residual=residual, tile=tile)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)
    # >=128-lane dx-packed variant must match too
    packed = fused_conv3x3_chain(x, ws, bs, slope=0.05, residual=residual,
                                 tile=tile, pack_dx=True)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape,cin,cout,tile", [
    ((1, 40, 52, 16), 16, 3, (32, 32)),
    ((2, 33, 47, 12), 12, 3, (16, 32)),
])
def test_fused_conv_pixelshuffle_tail(rng, interpret_pallas, shape, cin, cout, tile):
    """Fused tail == ops.conv2d(padding=1) + ops.pixel_shuffle(4)."""
    from ntire2022_esr_tpu.ops.pallas import fused_conv3x3_pixelshuffle

    r = 4
    x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.randn(3, 3, cin, cout * r * r).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(cout * r * r).astype(np.float32) * 0.1)
    ref = ops.pixel_shuffle(ops.conv2d(x, w, b), r)
    out = fused_conv3x3_pixelshuffle(x, w, b, r=r, tile=tile)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_chain_mixed_channels(rng, interpret_pallas):
    """RLFB-style chain with differing per-stage widths (46 -> 48 -> 48 -> 46)."""
    from ntire2022_esr_tpu.ops.pallas import fused_conv3x3_chain

    chans = [(20, 24), (24, 24), (24, 20)]
    x = jnp.asarray(rng.randn(1, 40, 40, 20).astype(np.float32) * 0.5)
    ws = [jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.05) for ci, co in chans]
    bs = [jnp.asarray(rng.randn(co).astype(np.float32) * 0.1) for _, co in chans]
    ref = _ref_chain(x, ws, bs, 0.05, True)
    out = fused_conv3x3_chain(x, ws, bs, slope=0.05, residual=True, tile=(32, 32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_rlfn_fused_path_matches(rng, interpret_pallas):
    from ntire2022_esr_tpu.harness import registry

    spec = registry.get_spec(4)
    params = registry.load_params(spec)
    x = jnp.asarray(rng.rand(1, 40, 40, 3).astype(np.float32) * 255.0)
    base = np.asarray(spec.apply(params, x))
    from ntire2022_esr_tpu.models.rlfn import rlfn_apply

    fused = np.asarray(rlfn_apply(params, x, use_fused=True))
    np.testing.assert_allclose(fused, base, rtol=1e-4, atol=1e-3)
