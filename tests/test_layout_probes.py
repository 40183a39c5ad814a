"""Layout experiment transforms must be output-exact:
channel padding (porter/pad.py) and grouped-conv densify (ops/nn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ntire2022_esr_tpu import config, ops


def test_pad_rlfn_output_exact(rng):
    from ntire2022_esr_tpu.harness import registry
    from ntire2022_esr_tpu.porter.pad import pad_rlfn

    apply, params, name, dr, tile = registry.build_model(4)
    padded = pad_rlfn(params, target=64)
    # every conv channel dim is now 3, 16, 48(tail) or 64
    assert padded["fea_conv"]["weight"].shape == (3, 3, 3, 64)
    assert padded["B1"]["c1_r"]["weight"].shape == (3, 3, 64, 64)
    assert padded["upsampler"]["0"]["weight"].shape == (3, 3, 64, 48)
    x = jnp.asarray(rng.rand(1, 24, 20, 3).astype(np.float32) * dr)
    ref = np.asarray(jax.jit(apply)(params, x))
    out = np.asarray(jax.jit(apply)(padded, x))
    # equivalent up to f32 reassociation (XLA reduction blocking changes
    # with channel count); must stay far inside the 0.01 dB parity bar:
    # < 1e-2 of one uint8 level on a 255-range output
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=1e-4)


def test_pad_conv_channels_keep_rules():
    from ntire2022_esr_tpu.porter.pad import pad_conv_channels

    p = {"a": {"weight": np.ones((3, 3, 46, 46), np.float32),
               "bias": np.ones((46,), np.float32)},
         "tail": {"0": {"weight": np.ones((3, 3, 46, 48), np.float32)}}}
    out = pad_conv_channels(p, {46: 64, 48: 64}, keep_out=("tail",))
    assert out["a"]["weight"].shape == (3, 3, 64, 64)
    assert out["a"]["bias"].shape == (64,)
    assert out["a"]["bias"][46:].sum() == 0
    assert out["tail"]["0"]["weight"].shape == (3, 3, 64, 48)
    # original blocks preserved
    np.testing.assert_array_equal(out["a"]["weight"][:, :, :46, :46], 1.0)
    assert out["a"]["weight"][:, :, 46:, :].sum() == 0


def test_densify_grouped_conv_exact(rng):
    """Dense block-diagonal lowering == grouped conv == torch."""
    x = torch.from_numpy(rng.randn(2, 16, 9, 11).astype(np.float32))
    w = torch.from_numpy(rng.randn(16, 4, 3, 3).astype(np.float32))
    ref = F.conv2d(x, w, padding=1, groups=4)
    xj = x.numpy().transpose(0, 2, 3, 1)
    wj = w.numpy().transpose(2, 3, 1, 0)
    plain = ops.conv2d(xj, wj, groups=4)
    config.set_densify_grouped(True)
    try:
        dense = ops.conv2d(xj, wj, groups=4)
    finally:
        config.set_densify_grouped(False)
    np.testing.assert_allclose(np.asarray(plain), ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(plain), rtol=1e-6, atol=1e-6)


def test_densify_skips_depthwise(rng):
    """Depthwise (cin/g == 1) must stay depthwise under the flag."""
    x = torch.from_numpy(rng.randn(1, 8, 6, 6).astype(np.float32))
    w = torch.from_numpy(rng.randn(8, 1, 3, 3).astype(np.float32))
    ref = F.conv2d(x, w, padding=1, groups=8)
    config.set_densify_grouped(True)
    try:
        out = ops.conv2d(x.numpy().transpose(0, 2, 3, 1),
                         w.numpy().transpose(2, 3, 1, 0), groups=8)
    finally:
        config.set_densify_grouped(False)
    np.testing.assert_allclose(np.asarray(out), ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-5)


def test_densify_grouped_zoo_model_exact(rng):
    """IMDTN (grouped convs, groups=4) end to end under the flag.

    Built with apply_load_transform=False: the zoo ships IMDTN with a
    load-time densify, so the default build would make both arms dense
    and the flag-flip vacuous."""
    from ntire2022_esr_tpu.harness import registry

    apply, params, name, dr, tile = registry.build_model(
        9, apply_load_transform=False)
    x = jnp.asarray(rng.rand(1, 18, 12, 3).astype(np.float32) * dr)
    # NB fresh lambdas per call: jax's trace cache is shared across
    # jax.jit(f) wrappers of the SAME f, and the config flag is invisible
    # to it — re-jitting `apply` directly would silently reuse the stock
    # trace and never exercise the flag.
    ref = np.asarray(jax.jit(lambda p, v: apply(p, v))(params, x))
    config.set_densify_grouped(True)
    try:
        out = np.asarray(jax.jit(lambda p, v: apply(p, v))(params, x))
    finally:
        config.set_densify_grouped(False)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # the SHIPPED path (load-time densify via the spec's load_transform)
    # must also match the stock grouped graph
    _, dparams, *_ = registry.build_model(9)
    dout = np.asarray(jax.jit(lambda p, v: apply(p, v))(dparams, x))
    np.testing.assert_allclose(dout, ref, rtol=1e-5, atol=1e-5)


def test_nearest2_conv_exact_vs_torch(rng):
    """Fused LR lowering of conv3x3(nearest_x2(x)) == torch's literal graph."""
    from ntire2022_esr_tpu.ops.fused import nearest2_conv

    x = torch.from_numpy(rng.randn(2, 7, 9, 11).astype(np.float32))
    w = torch.from_numpy(rng.randn(13, 7, 3, 3).astype(np.float32) * 0.3)
    b = torch.from_numpy(rng.randn(13).astype(np.float32))
    up = F.interpolate(x, scale_factor=2, mode="nearest")
    ref = F.conv2d(up, w, b, padding=1)
    p = {"weight": jnp.asarray(w.numpy().transpose(2, 3, 1, 0)),
         "bias": jnp.asarray(b.numpy())}
    out = nearest2_conv(p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("model_id", [33, 27])
def test_fused_upsample_conv_zoo_parity(model_id, rng):
    """m_RFDN / LWFANet under the fused flag match the reference-shaped
    graph to reassociation tolerance."""
    from ntire2022_esr_tpu.harness import registry

    apply, params, name, dr, tile = registry.build_model(model_id)
    x = jnp.asarray(rng.rand(1, 24, 20, 3).astype(np.float32) * dr)
    # fresh lambdas: see test_densify_grouped_zoo_model_exact (shared trace
    # cache would otherwise skip the flag-on retrace entirely)
    ref = np.asarray(jax.jit(lambda p, v: apply(p, v))(params, x))
    config.set_fuse_upsample_conv(True)
    try:
        out = np.asarray(jax.jit(lambda p, v: apply(p, v))(params, x))
    finally:
        config.set_fuse_upsample_conv(None)  # back to AUTO (mode-dependent)
    np.testing.assert_allclose(out, ref, atol=5e-3 * max(dr / 255.0, 1e-3) * 255,
                               rtol=1e-4)


def test_pad_mobilesr_heads_exact(rng):
    """Head-dim padding 5 -> 8 (zero qkv columns + zero proj rows) must
    leave MobileSR's output exactly unchanged (scores and outputs see only
    zeros from the pad dims; softmax scale stays 5**-0.5)."""
    from ntire2022_esr_tpu.harness import registry
    from ntire2022_esr_tpu.porter.pad import pad_mobilesr_heads

    apply, params, name, dr, tile = registry.build_model(20)
    padded = pad_mobilesr_heads(params)
    assert padded["body"]["layers"]["0"]["0"]["attn"]["qkv"]["weight"].shape == (40, 192)
    assert padded["body"]["layers"]["0"]["0"]["attn"]["proj_out"]["weight"].shape == (64, 40)
    x = jnp.asarray(rng.rand(1, 20, 24, 3).astype(np.float32) * dr)
    ref = np.asarray(jax.jit(apply)(params, x))
    out = np.asarray(jax.jit(apply)(padded, x))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_parallel_conv_pair_exact_vs_torch(rng):
    """One-conv lowering of a sibling (1x1, 3x3) pair == the two torch
    convs, incl. dilation and missing bias."""
    from ntire2022_esr_tpu.ops.fused import parallel_conv_pair

    x = torch.from_numpy(rng.randn(2, 12, 9, 11).astype(np.float32))
    w1 = torch.from_numpy(rng.randn(5, 12, 1, 1).astype(np.float32))
    b1 = torch.from_numpy(rng.randn(5).astype(np.float32))
    wk = torch.from_numpy(rng.randn(12, 12, 3, 3).astype(np.float32) * 0.3)
    for dil in (1, 2):
        ref_d = F.conv2d(x, w1, b1)
        ref_r = F.conv2d(x, wk, None, padding=dil, dilation=dil)
        d, r = parallel_conv_pair(
            {"weight": jnp.asarray(w1.numpy().transpose(2, 3, 1, 0)),
             "bias": jnp.asarray(b1.numpy())},
            {"weight": jnp.asarray(wk.numpy().transpose(2, 3, 1, 0))},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), dilation=dil)
        np.testing.assert_allclose(np.asarray(d), ref_d.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(r), ref_r.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("model_id", [0, 13, 40, 2, 27])
def test_fuse_parallel_branches_zoo_parity(model_id, rng):
    """RFDN-family (incl. dilated + pruned variants), NLFFC, and LWFANet
    (four same-input 1x1 branch heads merged via ops.fused.
    parallel_conv_same) under the branch-fusion flag match the
    reference-shaped graph."""
    from ntire2022_esr_tpu.harness import registry

    apply, params, name, dr, tile = registry.build_model(model_id)
    x = jnp.asarray(rng.rand(1, 24, 20, 3).astype(np.float32) * dr)
    # fresh lambdas: see test_densify_grouped_zoo_model_exact
    ref = np.asarray(jax.jit(lambda p, v: apply(p, v))(params, x))
    config.set_fuse_parallel_branches(True)
    try:
        out = np.asarray(jax.jit(lambda p, v: apply(p, v))(params, x))
    finally:
        config.set_fuse_parallel_branches(None)
    np.testing.assert_allclose(out, ref, atol=5e-3 * max(dr / 255.0, 1e-3) * 255,
                               rtol=1e-4)


def test_fuse_parallel_branches_auto_is_site_gated():
    """AUTO enables branch fusion only at the measured-win site (nlffc);
    the rfdb site measured a regression (layout_probes_r3.json) and stays
    off unless explicitly forced."""
    assert config.mode() == "parity"
    assert not config.fuse_parallel_branches("nlffc")  # parity: all off
    with config.numerics_mode("high"):
        assert config.fuse_parallel_branches("nlffc")
        assert not config.fuse_parallel_branches("rfdb")
        config.set_fuse_parallel_branches(True)
        try:
            assert config.fuse_parallel_branches("rfdb")  # forced: all on
        finally:
            config.set_fuse_parallel_branches(None)


@pytest.mark.parametrize("model_id", [30, 27, 20, 33])
def test_scan_blocks_zoo_parity(model_id, rng):
    """lax.scan over stacked repeated blocks (blocks.scan_chain) matches the
    unrolled reference-shaped graph on every wired site: SCET's 16 SCPA,
    LWFANet's 10 LWFA, MobileSR's 5 transformer+resblock pairs, m_RFDN's
    4 collected m_RFDBs."""
    from ntire2022_esr_tpu.harness import registry

    apply, params, name, dr, tile = registry.build_model(model_id)
    x = jnp.asarray(rng.rand(1, 24, 20, 3).astype(np.float32) * dr)
    # fresh lambdas: see test_densify_grouped_zoo_model_exact
    config.set_scan_blocks(False)
    try:
        ref = np.asarray(jax.jit(lambda p, v: apply(p, v))(params, x))
    finally:
        config.set_scan_blocks(None)
    config.set_scan_blocks(True)
    try:
        out = np.asarray(jax.jit(lambda p, v: apply(p, v))(params, x))
    finally:
        config.set_scan_blocks(None)
    np.testing.assert_allclose(out, ref, atol=5e-3 * max(dr / 255.0, 1e-3) * 255,
                               rtol=1e-4)


def test_scan_blocks_auto_off():
    """Scan-over-blocks measured speed-neutral with no batch-ceiling lift
    (layout_probes_r3.json): AUTO is off at every site; only the explicit
    force enables it."""
    with config.numerics_mode("high"):
        assert not config.scan_blocks("scet")
    config.set_scan_blocks(True)
    try:
        assert config.scan_blocks("scet")
    finally:
        config.set_scan_blocks(None)


def test_attn_bf16_close_and_gated(rng):
    """bf16 attention-score storage (config.attn_bf16) stays within bf16
    rounding of the f32 path on MobileSR, and the knob validates input."""
    from ntire2022_esr_tpu.harness import registry

    apply, params, name, dr, tile = registry.build_model(20)
    x = jnp.asarray(rng.rand(1, 24, 20, 3).astype(np.float32) * dr)
    ref = np.asarray(jax.jit(lambda p, v: apply(p, v))(params, x))
    outs = {}
    for variant in ("probs", "scores", "scores_f16"):
        config.set_attn_bf16(variant)
        try:
            outs[variant] = np.asarray(jax.jit(lambda p, v: apply(p, v))(params, x))
        finally:
            config.set_attn_bf16(None)
    # probs-only keeps ~bf16-rounding error on convex weights; scores adds
    # logit rounding. Both must stay far inside a uint8 level (dr=1 here).
    np.testing.assert_allclose(outs["probs"], ref, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(outs["scores"], ref, atol=8e-3, rtol=5e-3)
    assert np.abs(outs["probs"] - ref).max() > 0  # the flag actually retraced
    # f16 storage: same bytes, 3 more mantissa bits -> strictly closer
    err_bf16 = np.sqrt(np.mean((outs["scores"] - ref) ** 2))
    err_f16 = np.sqrt(np.mean((outs["scores_f16"] - ref) ** 2))
    assert 0 < err_f16 < err_bf16, (err_f16, err_bf16)
    with pytest.raises(ValueError):
        config.set_attn_bf16("bogus")
    # AUTO gate: "scores" outside parity at the measured sites. Round 4:
    # imdtn joined — its BENCHMARK-level shift measured -0.0001 dB
    # (numerics_delta_r4.json; the 66.7 dB between-mode proxy under-rated it)
    assert config.attn_bf16("mobilesr") == "off"  # parity
    with config.numerics_mode("high"):
        assert config.attn_bf16("mobilesr") == "scores"
        assert config.attn_bf16("hnct") == "scores"
        assert config.attn_bf16("imdtn") == "scores"
        assert config.attn_bf16("mha") == "off"


def test_attn_bf16_noop_on_bf16_activations(rng):
    """In `fast` mode activations are already bf16: the score-storage knob
    must not upcast anything — the pre-knob pure-bf16 attention graph (the
    one the published fast-envelope numbers were measured on) stays, and
    the output dtype remains bf16 for every knob setting."""
    from ntire2022_esr_tpu.ops import attention

    q = jnp.asarray(rng.rand(2, 16, 8).astype(np.float32)).astype(jnp.bfloat16)
    with config.numerics_mode("fast"):
        for variant in (None, "off", "probs", "scores", "scores_f16"):
            config.set_attn_bf16(variant)
            try:
                out = attention.multi_head_attention(q, q, q, num_heads=2,
                                                     site="mobilesr")
            finally:
                config.set_attn_bf16(None)
            assert out.dtype == jnp.bfloat16, (variant, out.dtype)


@pytest.mark.parametrize("model_id", [33, 27, 28, 20])
def test_hr_tail_bf16_close(model_id, rng):
    """bf16 HR tail (config.hr_tail_scope) stays within bf16 rounding of the
    f32 graph on every wired site, and mode state is restored after trace."""
    from ntire2022_esr_tpu.harness import registry

    apply, params, name, dr, tile = registry.build_model(model_id)
    x = jnp.asarray(rng.rand(1, 24, 20, 3).astype(np.float32) * dr)
    ref = np.asarray(jax.jit(lambda p, v: apply(p, v))(params, x))
    config.set_hr_tail_bf16(True)
    try:
        out = np.asarray(jax.jit(lambda p, v: apply(p, v))(params, x))
    finally:
        config.set_hr_tail_bf16(None)
    assert config.mode() == "parity"  # scope restored the mode
    assert out.dtype == np.float32
    d = np.abs(out - ref).max()
    assert 0 < d < 2.5e-2 * max(dr / 255.0, 1e-3) * 255, d


@pytest.mark.parametrize("model_id", [33, 27, 28, 20])
def test_hr_tail_f16_closer_than_bf16(model_id, rng):
    """The f16 HR-tail tier (same 2-byte traffic, 3 more mantissa bits)
    must land strictly closer to the f32 graph than the bf16 tier."""
    from ntire2022_esr_tpu.harness import registry

    apply, params, name, dr, tile = registry.build_model(model_id)
    x = jnp.asarray(rng.rand(1, 24, 20, 3).astype(np.float32) * dr)
    ref = np.asarray(jax.jit(lambda p, v: apply(p, v))(params, x))
    errs = {}
    for tier in ("bf16", "f16"):
        config.set_hr_tail(tier)
        try:
            out = np.asarray(jax.jit(lambda p, v: apply(p, v))(params, x))
        finally:
            config.set_hr_tail(None)
        assert config.mode() == "parity"  # scope restored the mode
        assert out.dtype == np.float32
        errs[tier] = float(np.sqrt(np.mean((out - ref) ** 2)))
    assert 0 < errs["f16"] < errs["bf16"], errs


def test_hr_tail_knob_validation_and_legacy():
    with pytest.raises(ValueError):
        config.set_hr_tail("f8")
    # legacy boolean API maps onto the tier knob
    config.set_hr_tail_bf16(True)
    try:
        assert config.hr_tail("m_rfdn") == "bf16"
        assert config.hr_tail_bf16("m_rfdn")
    finally:
        config.set_hr_tail(None)
    assert config.hr_tail_override() is None


def test_hr_tail_auto_sites_round4():
    """Round-4 AUTO: bf16 tails at the four wired sites in f32 non-parity
    modes, gated on the measured BENCHMARK shift (+-0.001 dB,
    numerics_delta_r4.json); f16 is equally accurate but 1.4-1.6x slower
    (hr_tail_f16_r4.json) -> stays opt-in; fast/fast16 keep their pre-knob
    2-byte graphs."""
    assert config.hr_tail("m_rfdn") == "off"  # parity
    with config.numerics_mode("high"):
        for site in ("m_rfdn", "lwfanet", "nasnetbn", "mobilesr"):
            assert config.hr_tail(site) == "bf16"
        assert config.hr_tail("scet") == "off"  # measured negative (OOM)
    with config.numerics_mode("fast"):
        assert config.hr_tail("m_rfdn") == "off"
