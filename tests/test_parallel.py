"""Sharded evaluation over the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntire2022_esr_tpu.parallel import make_mesh, sharded_batch_apply, sharded_eval_step
from ntire2022_esr_tpu.parallel.eval import psnr_from_mse


def _toy_apply(params, x):
    y = jnp.repeat(jnp.repeat(x, 4, axis=1), 4, axis=2)
    return y * params["w"]


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)


def test_sharded_batch_apply_matches_single_device(rng):
    mesh = make_mesh()
    params = {"w": np.float32(2.0)}
    x = jnp.asarray(rng.rand(16, 8, 8, 3).astype(np.float32))
    f = sharded_batch_apply(_toy_apply, mesh)
    out = f(params, x)
    ref = _toy_apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
    # batch axis is actually sharded across the mesh
    assert len(out.sharding.device_set) == 8


def test_sharded_eval_step_psnr(rng):
    mesh = make_mesh()
    params = {"w": np.float32(1.0)}
    lr = jnp.asarray(rng.rand(8, 12, 12, 3).astype(np.float32))
    hr_perfect = jnp.repeat(jnp.repeat(lr, 4, axis=1), 4, axis=2)
    hr_u8 = jnp.round(jnp.clip(hr_perfect, 0, 1) * 255.0)
    step = sharded_eval_step(_toy_apply, mesh, data_range=1.0)
    sr, mse = step(params, lr, hr_u8)
    assert mse.shape == (8,)
    # model output == HR here, so mse ~ 0 and PSNR is huge
    assert float(jnp.max(mse)) < 0.5  # only u8 rounding error
    psnr = psnr_from_mse(jnp.maximum(mse, 1e-8))
    assert float(jnp.min(psnr)) > 55.0


def test_mesh_too_many_devices():
    with pytest.raises(ValueError):
        make_mesh(99)


def test_sharded_tile_grid(rng):
    from ntire2022_esr_tpu.parallel.eval import sharded_tiled_apply
    from ntire2022_esr_tpu.harness import tiling

    mesh = make_mesh()
    params = {"w": np.float32(1.5)}
    x = jnp.asarray(rng.rand(1, 70, 90, 3).astype(np.float32))
    ref = tiling.tiled_apply(_toy_apply, params, x, tile=48, tile_overlap=16)
    out = sharded_tiled_apply(_toy_apply, mesh, params, x, tile=48, tile_overlap=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_spatial_shard_exact_for_pointwise_model(rng):
    from ntire2022_esr_tpu.parallel.spatial import spatial_shard_apply

    mesh = make_mesh()
    params = {"w": np.float32(2.0)}
    x = jnp.asarray(rng.rand(2, 64, 40, 3).astype(np.float32))
    ref = _toy_apply(params, x)
    out = spatial_shard_apply(_toy_apply, mesh, params, x, overlap=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_spatial_shard_conv_interior_exact(rng):
    """A small conv stack: interior rows match the unsharded forward exactly
    when overlap >= receptive field / 2; boundary semantics equal the
    model's own zero padding."""
    import jax
    from ntire2022_esr_tpu import ops
    from ntire2022_esr_tpu.parallel.spatial import spatial_shard_apply

    k1 = rng.randn(3, 3, 3, 8).astype(np.float32) * 0.2
    k2 = rng.randn(3, 3, 8, 48).astype(np.float32) * 0.2

    def net(p, a):
        h = ops.leaky_relu(ops.conv2d(a, p["k1"]), 0.1)
        h = ops.conv2d(h, p["k2"])
        return ops.pixel_shuffle(h, 4)

    params = {"k1": k1, "k2": k2}
    x = jnp.asarray(rng.rand(1, 64, 32, 3).astype(np.float32))
    ref = np.asarray(jax.jit(net)(params, x))
    out = np.asarray(spatial_shard_apply(net, make_mesh(), params, x, overlap=4))
    # RF/2 = 2 <= overlap 4 -> exact everywhere
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
