"""SRServer: order preservation, shape bucketing, output parity."""

import numpy as np
import pytest

from ntire2022_esr_tpu.harness.serving import SRServer, bucketed_throughput


@pytest.fixture(scope="module")
def server():
    return SRServer(model_id=4, max_batch=3, depth=2)


def _frames(rng, shapes):
    return [rng.randint(0, 256, s + (3,), dtype=np.uint8) for s in shapes]


def test_process_one_shape_and_parity(server, rng):
    lr = rng.randint(0, 256, (24, 33, 3), dtype=np.uint8)
    sr = server.process_one(lr)
    assert sr.shape == (96, 132, 3) and sr.dtype == np.uint8
    # parity vs the harness conversion path (round-tie ulp flips only)
    import jax

    from ntire2022_esr_tpu.harness import registry
    from ntire2022_esr_tpu.utils import image as img_util

    apply, params, name, dr, tile = registry.build_model(4)
    y = jax.jit(apply)(params, img_util.uint2nhwc(lr, dr))
    ref = img_util.nhwc2uint(np.asarray(y, np.float32), dr)
    assert np.abs(sr.astype(np.int16) - ref.astype(np.int16)).max() <= 1
    assert np.mean(sr != ref) < 1e-3


def test_stream_order_and_batching(server, rng):
    # mixed shapes force flushes; counts > max_batch force splits
    shapes = [(24, 33)] * 5 + [(32, 24)] * 2 + [(24, 33)] * 1
    frames = _frames(rng, shapes)
    outs = list(server.process_stream(frames))
    assert len(outs) == len(frames)
    for f, o in zip(frames, outs):
        assert o.shape == (f.shape[0] * 4, f.shape[1] * 4, 3)
        # each output must correspond to ITS input (order preserved):
        # check against individually-processed reference
        single = server.process_one(f)
        assert np.array_equal(o, single)


def test_tiled_model_rejected():
    with pytest.raises(ValueError, match="tiled"):
        SRServer(model_id=2)


def test_throughput_helper(server, rng):
    frames = _frames(rng, [(24, 33)] * 4)
    stats = bucketed_throughput(server, frames)
    assert stats["images"] == 4 and stats["images_per_sec"] > 0


def test_stream_mesh_sharded(rng):
    """dp-sharded serving on the 8-device virtual mesh, incl. a ragged
    flush (5 frames -> zero-padded to 8 shards) and parity vs unsharded."""
    from ntire2022_esr_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    srv = SRServer(model_id=4, max_batch=8, depth=2, mesh=mesh)
    plain = SRServer(model_id=4, max_batch=8, depth=1)
    frames = _frames(rng, [(24, 33)] * 5)
    outs = list(srv.process_stream(frames))
    assert len(outs) == 5
    for f, o in zip(frames, outs):
        assert np.array_equal(o, plain.process_one(f))


def test_mesh_batch_divisibility():
    from ntire2022_esr_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="multiple of the mesh"):
        SRServer(model_id=4, max_batch=6, mesh=make_mesh(8))


def test_stream_interleaved_calls_no_deadlock(server, rng):
    """A partially-consumed stream must not hold the dispatch lock: other
    calls (and a second stream) proceed, and an abandoned iterator leaves
    the server usable."""
    frames = _frames(rng, [(24, 33)] * 4)
    stream = server.process_stream(frames, batch=2)
    first = next(stream)
    # other entry points while the stream is suspended at a yield
    single = server.process_one(frames[0])
    assert np.array_equal(first, single)
    other = list(server.process_stream(_frames(rng, [(24, 33)] * 2), batch=2))
    assert len(other) == 2
    rest = list(stream)
    assert len(rest) == 3
    # abandon a fresh stream mid-way; the server must remain usable
    s2 = server.process_stream(frames, batch=2)
    next(s2)
    del s2
    assert server.process_one(frames[1]).shape == (96, 132, 3)


def test_warmup_validates_mesh_divisibility():
    from ntire2022_esr_tpu.parallel import make_mesh

    def toy(p, x):
        import jax.numpy as jnp
        return jnp.repeat(jnp.repeat(x, 4, axis=1), 4, axis=2) * p["w"]

    srv = SRServer(apply=toy, params={"w": np.float32(1.0)}, data_range=1.0,
                   max_batch=8, mesh=make_mesh())
    with pytest.raises(ValueError, match="multiple of the mesh"):
        srv.warmup((8, 8), batch=3)
    srv.warmup((8, 8), batch=8)  # divisible: compiles cleanly
