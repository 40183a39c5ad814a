"""Stage-split dispatch (harness/stagesplit.py): split == whole forward.

The split models expose body/tail pairs that `apply` composes, so the
whole-forward graph IS body∘tail; these tests pin the dispatch-level
equivalence (separate executables, chunked tail, pytree intermediates)
and the serving integration. The executable seam moves XLA fusion
boundaries, so identical f32 math can differ by reassociation ulps
(~1e-6 observed on CPU) — asserted at 1e-5 x data_range, far below any
mis-wiring signal (O(0.1-1)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntire2022_esr_tpu import config
from ntire2022_esr_tpu.harness import registry, stagesplit


@pytest.mark.parametrize("mid", stagesplit.split_ids())
def test_split_matches_whole_forward(mid, rng):
    config.set_mode("parity")
    apply, params, name, dr, _ = registry.build_model(mid)
    x = jnp.asarray(rng.rand(4, 24, 32, 3).astype(np.float32) * dr)
    ref = np.asarray(jax.jit(apply)(params, x))
    got = np.asarray(stagesplit.split_apply(mid, chunk=2)(params, x))
    assert ref.shape == got.shape
    np.testing.assert_allclose(got, ref, atol=1e-5 * max(dr, 1.0), rtol=0,
                               err_msg=name)


def test_split_rejects_ragged_batch():
    mid = stagesplit.split_ids()[0]
    _, params, *_ = registry.build_model(mid)
    x = jnp.zeros((3, 24, 24, 3), jnp.float32)
    with pytest.raises(ValueError, match="multiple"):
        stagesplit.split_apply(mid, chunk=2)(params, x)


def test_unknown_model_raises():
    with pytest.raises(KeyError, match="stage split"):
        stagesplit.split_apply(4, chunk=2)


def test_shipped_schedule_is_split_capable():
    # every shipped (body_batch, chunk) row must reference a registered
    # split and have chunk | body_batch
    for mid, (bb, ck) in stagesplit.SHIPPED.items():
        assert stagesplit.get_split(mid) is not None
        assert bb % ck == 0


def test_split_chain_timer_runs():
    mid = 28
    body, tail = stagesplit.get_split(mid)
    _, params, *_ = registry.build_model(mid)
    x = jnp.zeros((4, 16, 16, 3), jnp.float32)
    s = stagesplit.split_chain_timer(body, tail, params, x, chunk=2,
                                     reps=2, iters=1)
    assert s > 0


def test_serving_stage_split_parity(rng):
    """Split-dispatch serving == plain serving, order preserved, u8-exact."""
    from ntire2022_esr_tpu.harness.serving import SRServer

    config.set_mode("parity")
    plain = SRServer(model_id=28, max_batch=4)
    split = SRServer(model_id=28, max_batch=4, stage_split=2)
    frames = [rng.randint(0, 256, (16, 20, 3), dtype=np.uint8) for _ in range(5)]
    ref = list(plain.process_stream(frames))
    got = list(split.process_stream(frames))
    assert len(got) == len(ref)
    for r, g in zip(ref, got):
        # fusion-seam ulps can flip round-ties: allow <=1 u8 step, rarely
        diff = np.abs(g.astype(np.int16) - r.astype(np.int16))
        assert diff.max() <= 1 and np.mean(diff > 0) < 1e-3
    # single-frame path (padded to the chunk internally)
    one = split.process_one(frames[0])
    diff = np.abs(one.astype(np.int16) - ref[0].astype(np.int16))
    assert diff.max() <= 1 and np.mean(diff > 0) < 1e-3


def test_serving_stage_split_validation():
    from ntire2022_esr_tpu.harness.serving import SRServer

    with pytest.raises(ValueError, match="stage split"):
        SRServer(model_id=4, stage_split=True)
