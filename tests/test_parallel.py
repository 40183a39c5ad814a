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


@pytest.mark.parametrize("model_id", [3, 24, 39])
def test_spatial_shard_exact_for_slab_safe_zoo_models(model_id, rng):
    """Real zoo models flagged slab_safe must match the unsharded forward
    exactly (within f32 reassociation noise) at their declared halo."""
    from ntire2022_esr_tpu.harness import registry
    from ntire2022_esr_tpu.parallel.spatial import spatial_shard_apply

    spec = registry.get_spec(model_id)
    assert spec.slab_safe
    apply, params, name, data_range, tile = registry.build_model(model_id)
    mesh = make_mesh(2)
    h = max(2 * spec.halo + 16, 96)
    x = jnp.asarray(rng.rand(1, h, 24, 3).astype(np.float32) * data_range)
    ref = np.asarray(jax.jit(apply)(params, x))
    out = np.asarray(spatial_shard_apply(apply, mesh, params, x, overlap=spec.halo))
    tol = 2e-5 * data_range
    np.testing.assert_allclose(out, ref, atol=tol, rtol=1e-5)


def test_slab_unsafe_models_flagged():
    """Models with pooling-grid / global ops must NOT be marked slab_safe:
    ESA's size-dependent bilinear-back (0, 4, ...), global pooling (16, 18),
    window/global attention (9, 12, 19, 20, 30), FFT (2)."""
    from ntire2022_esr_tpu.harness import registry

    for mid in (0, 2, 4, 9, 12, 16, 18, 19, 20, 30, 42, 44):
        assert not registry.get_spec(mid).slab_safe, mid


def test_cli_rejects_spatial_for_unsafe_model(tmp_path):
    """The CLI enforcement path: --spatial on a non-slab-safe model raises."""
    import logging
    import types
    from ntire2022_esr_tpu.harness import cli

    args = types.SimpleNamespace(save_dir=str(tmp_path), ssim=False, x8=False,
                                 batched=False, include_test=False, mesh=2,
                                 spatial=True, data_dir=str(tmp_path))
    logger = logging.getLogger("test_cli_spatial")
    logger.addHandler(logging.NullHandler())
    with pytest.raises(ValueError, match="not slab-decomposable"):
        cli.evaluate_model(4, args, logger)


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


def test_spatial_shard_windowed_odd_h_exact(rng):
    """H not divisible by the mesh takes the windowed scheme (replicated
    input, per-device edge-clamped windows) and must still match the
    unsharded forward exactly when overlap covers the receptive field."""
    import jax
    from ntire2022_esr_tpu import ops
    from ntire2022_esr_tpu.parallel.spatial import make_spatial_apply

    k1 = rng.randn(3, 3, 3, 8).astype(np.float32) * 0.2
    k2 = rng.randn(3, 3, 8, 48).astype(np.float32) * 0.2
    b1 = rng.randn(8).astype(np.float32)  # biases make zero-input rows
    # diverge from zero *padding* — the edge-clamp correctness test

    def net(p, a):
        h = ops.leaky_relu(ops.conv2d(a, p["k1"]) + p["b1"], 0.1)
        h = ops.conv2d(h, p["k2"])
        return ops.pixel_shuffle(h, 4)

    params = {"k1": k1, "k2": k2, "b1": b1}
    fn = make_spatial_apply(net, make_mesh(), overlap=4)
    for h in (67, 61, 97):  # all indivisible by 8
        x = jnp.asarray(rng.rand(1, h, 24, 3).astype(np.float32))
        ref = np.asarray(jax.jit(net)(params, x))
        out = np.asarray(fn(params, x))
        assert out.shape == ref.shape == (1, 4 * h, 96, 3)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_spatial_shard_windowed_zoo_model_odd_h(rng):
    """A slab-safe zoo model at an odd protocol-like height."""
    from ntire2022_esr_tpu.harness import registry
    from ntire2022_esr_tpu.parallel.spatial import make_spatial_apply

    spec = registry.get_spec(24)
    apply, params, name, data_range, tile = registry.build_model(24)
    fn = make_spatial_apply(apply, make_mesh(), overlap=spec.halo)
    h = 8 * 8 + 5
    x = jnp.asarray(rng.rand(1, h, 24, 3).astype(np.float32) * data_range)
    ref = np.asarray(jax.jit(apply)(params, x))
    out = np.asarray(fn(params, x))
    np.testing.assert_allclose(out, ref, atol=2e-5 * data_range, rtol=1e-5)


def test_spatial_shard_too_small_h_raises(rng):
    from ntire2022_esr_tpu.parallel.spatial import make_spatial_apply

    fn = make_spatial_apply(_toy_apply, make_mesh(), overlap=32)
    x = jnp.asarray(rng.rand(1, 33, 16, 3).astype(np.float32))
    with pytest.raises(ValueError, match="too small"):
        fn({"w": np.float32(1.0)}, x)


# ---------------------------------------------------------------------------
# 2-D mesh composition: batch ("data") x H-slab ("space")
# ---------------------------------------------------------------------------

def test_data_space_mesh_shape():
    from ntire2022_esr_tpu.parallel import data_space_mesh

    mesh = data_space_mesh(4, 2)
    assert mesh.shape == {"data": 4, "space": 2}
    with pytest.raises(ValueError, match="devices"):
        data_space_mesh(8, 2)
    from ntire2022_esr_tpu.parallel import make_mesh as mm
    with pytest.raises(ValueError, match="axis names"):
        mm((4, 2), ("data",))


def test_batch_spatial_composed_exact_halo(rng):
    """4x2 mesh, H divisible (halo scheme): composed == single-device."""
    from ntire2022_esr_tpu.parallel import data_space_mesh
    from ntire2022_esr_tpu.parallel.spatial import make_spatial_apply

    mesh = data_space_mesh(4, 2)
    params = {"w": np.float32(2.0)}
    x = jnp.asarray(rng.rand(8, 64, 40, 3).astype(np.float32))
    ref = _toy_apply(params, x)
    fn = make_spatial_apply(_toy_apply, mesh, overlap=4, axis="space",
                            batch_axis="data")
    np.testing.assert_allclose(np.asarray(fn(params, x)), np.asarray(ref),
                               rtol=1e-6)


def test_batch_spatial_composed_zoo_model_odd_h(rng):
    """2x2 mesh over a real slab-safe zoo model at an odd H (windowed
    scheme): composed == unsharded forward."""
    from ntire2022_esr_tpu.harness import registry
    from ntire2022_esr_tpu.parallel import data_space_mesh
    from ntire2022_esr_tpu.parallel.spatial import make_spatial_apply

    spec = registry.get_spec(3)  # FMEN, slab_safe
    apply, params, name, data_range, tile = registry.build_model(3)
    mesh = data_space_mesh(2, 2)
    h = 4 * spec.halo + 17  # odd, not divisible by the space axis, and
    # large enough for the windowed scheme (ceil(h/2) + 2*halo <= h)
    x = jnp.asarray(rng.rand(2, h, 24, 3).astype(np.float32) * data_range)
    ref = np.asarray(jax.jit(apply)(params, x))
    fn = make_spatial_apply(apply, mesh, overlap=spec.halo, axis="space",
                            batch_axis="data")
    out = np.asarray(fn(params, x))
    np.testing.assert_allclose(out, ref, atol=2e-5 * data_range, rtol=1e-5)


def test_batch_spatial_batch_divisibility(rng):
    from ntire2022_esr_tpu.parallel import data_space_mesh
    from ntire2022_esr_tpu.parallel.spatial import make_spatial_apply

    mesh = data_space_mesh(4, 2)
    fn = make_spatial_apply(_toy_apply, mesh, overlap=4, axis="space",
                            batch_axis="data")
    x = jnp.zeros((3, 64, 40, 3), jnp.float32)
    with pytest.raises(ValueError, match="divide"):
        fn({"w": np.float32(1.0)}, x)


def test_cli_composed_batched_spatial(tmp_path, rng):
    """--batched --spatial --mesh 4 --space 2: the composed 2-D path runs
    end-to-end on a slab-safe model and scores finite PSNR."""
    import logging
    import types

    from ntire2022_esr_tpu.harness import cli
    from ntire2022_esr_tpu.utils import image as img_util

    data = tmp_path / "DIV2K_valid_HR"
    lr_dir = tmp_path / "DIV2K_valid_LR"
    data.mkdir(); lr_dir.mkdir()
    for k in (801, 802, 803):  # ragged (3 images over 2 data groups)
        hr = rng.randint(0, 256, (256, 64, 3)).astype(np.uint8)  # LR 64 rows
        # -> 32-row slabs over the 2-way space axis, >= MDGN's halo of 24
        img_util.imsave(hr, str(data / f"{k:04d}.png"))
        img_util.imsave(hr[::4, ::4], str(lr_dir / f"{k:04d}x4.png"))
    args = types.SimpleNamespace(save_dir=str(tmp_path / "out"), ssim=False,
                                 x8=False, batched=True, include_test=False,
                                 mesh=4, space=2, spatial=True, u8_io=False,
                                 data_dir=str(tmp_path))
    logger = logging.getLogger("test_cli_composed")
    logger.addHandler(logging.NullHandler())
    name, entry = cli.evaluate_model(24, args, logger)  # MDGN, slab_safe
    assert len(entry["valid_psnr"]) == 3
    assert all(np.isfinite(p) for p in entry["valid_psnr"])

    # and the unsafe-model refusal on the composed path
    args.model_id = 4
    with pytest.raises(ValueError, match="slab-decomposable"):
        cli.evaluate_model(4, args, logger)


# ---------------------------------------------------------------------------
# Stage-pipelined inference (parallel/pipeline.py)
# ---------------------------------------------------------------------------

def test_pipelined_sr_matches_whole_forward(rng):
    from ntire2022_esr_tpu.harness import registry
    from ntire2022_esr_tpu.parallel import PipelinedSR

    apply, params, name, dr, _ = registry.build_model(28)
    pipe = PipelinedSR(28, devices=jax.devices()[:2])
    x = rng.rand(2, 16, 20, 3).astype(np.float32) * dr
    ref = np.asarray(jax.jit(apply)(params, jnp.asarray(x)))
    out = pipe.process_one(x)
    np.testing.assert_allclose(out, ref, atol=1e-5 * max(dr, 1.0), rtol=0)


def test_pipelined_sr_stream_order_and_devices(rng):
    from ntire2022_esr_tpu.parallel import PipelinedSR

    d0, d1 = jax.devices()[2], jax.devices()[5]
    pipe = PipelinedSR(27, devices=[d0, d1], depth=2)
    batches = [rng.rand(1, 16, 16, 3).astype(np.float32) for _ in range(4)]
    outs = list(pipe.process_stream(batches))
    assert len(outs) == 4
    for b, o in zip(batches, outs):
        np.testing.assert_allclose(o, pipe.process_one(b), atol=1e-6)
    # the tail really ran on the second device
    y = pipe._submit(batches[0])
    assert set(y.sharding.device_set) == {d1}


def test_pipelined_sr_validation():
    from ntire2022_esr_tpu.parallel import PipelinedSR

    with pytest.raises(KeyError, match="stage split"):
        PipelinedSR(4)
    with pytest.raises(ValueError, match="2 devices"):
        PipelinedSR(28, devices=jax.devices()[:3])
