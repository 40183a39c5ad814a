"""Unit parity tests: NHWC ops vs torch CPU reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ntire2022_esr_tpu import ops


def t2j(x_nchw: torch.Tensor) -> np.ndarray:
    return x_nchw.detach().numpy().transpose(0, 2, 3, 1)


def conv_w(w_oihw: torch.Tensor) -> np.ndarray:
    return w_oihw.detach().numpy().transpose(2, 3, 1, 0)


@pytest.mark.parametrize("k,stride,pad,dilation,groups", [
    (3, 1, None, 1, 1),
    (1, 1, 0, 1, 1),
    (3, 2, 0, 1, 1),
    (3, 2, 1, 1, 1),
    (3, 1, 2, 2, 1),
    (3, 1, 5, 5, 1),
    (5, 1, 2, 1, 1),
    (7, 3, 0, 1, 1),
    (3, 1, 1, 1, 4),   # grouped
    (3, 1, 1, 1, 8),   # depthwise (cin=8)
])
def test_conv2d(rng, k, stride, pad, dilation, groups):
    cin, cout = 8, 16
    x = torch.from_numpy(rng.randn(2, cin, 17, 19).astype(np.float32))
    w = torch.from_numpy(rng.randn(cout, cin // groups, k, k).astype(np.float32))
    b = torch.from_numpy(rng.randn(cout).astype(np.float32))
    torch_pad = dilation * (k // 2) if pad is None else pad
    ref = F.conv2d(x, w, b, stride=stride, padding=torch_pad, dilation=dilation, groups=groups)
    out = ops.conv2d(t2j(x), conv_w(w), b.numpy(), stride=stride, padding=pad,
                     dilation=dilation, groups=groups)
    np.testing.assert_allclose(np.asarray(out), t2j(ref), rtol=1e-5, atol=1e-5)


def test_conv_transpose2d(rng):
    cin, cout = 6, 9
    x = torch.from_numpy(rng.randn(1, cin, 11, 13).astype(np.float32))
    w = torch.from_numpy(rng.randn(cin, cout, 3, 3).astype(np.float32))
    b = torch.from_numpy(rng.randn(cout).astype(np.float32))
    ref = F.conv_transpose2d(x, w, b, stride=2, padding=1, output_padding=1)
    # porter rule: (I, O, kh, kw) -> flip spatial -> HWIO with I as "input"
    wj = np.flip(w.numpy().transpose(2, 3, 0, 1), axis=(0, 1)).copy()
    out = ops.conv_transpose2d(t2j(x), wj, b.numpy(), stride=2, padding=1, output_padding=1)
    np.testing.assert_allclose(np.asarray(out), t2j(ref), rtol=1e-4, atol=1e-4)

    # grouped transpose convs are unsupported (porter rule would be wrong):
    # must refuse rather than silently compute garbage
    import pytest
    with pytest.raises(NotImplementedError):
        ops.conv_transpose2d(t2j(x), wj, None, stride=2, groups=3)


def test_activations(rng):
    x = torch.from_numpy(rng.randn(2, 5, 7, 3).astype(np.float32))
    xj = x.numpy()
    np.testing.assert_allclose(np.asarray(ops.leaky_relu(xj, 0.05)), F.leaky_relu(x, 0.05).numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ops.gelu(xj)), F.gelu(x).numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ops.silu(xj)), F.silu(x).numpy(), rtol=1e-5, atol=1e-6)
    w = torch.from_numpy(rng.rand(3).astype(np.float32))
    ref = F.prelu(x.permute(0, 3, 1, 2), w).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ops.prelu(xj, w.numpy())), ref.numpy(), rtol=1e-6)


@pytest.mark.parametrize("k,s", [(7, 3), (2, 2), (3, 2)])
def test_max_pool(rng, k, s):
    x = torch.from_numpy(rng.randn(1, 4, 23, 29).astype(np.float32))
    ref = F.max_pool2d(x, kernel_size=k, stride=s)
    out = ops.max_pool2d(t2j(x), k, s)
    np.testing.assert_allclose(np.asarray(out), t2j(ref), rtol=1e-6)


def test_avg_pool(rng):
    x = torch.from_numpy(rng.randn(1, 4, 20, 24).astype(np.float32))
    ref = F.avg_pool2d(x, kernel_size=2, stride=2)
    out = ops.avg_pool2d(t2j(x), 2, 2)
    np.testing.assert_allclose(np.asarray(out), t2j(ref), rtol=1e-5, atol=1e-6)


def test_pixel_shuffle_roundtrip(rng):
    x = torch.from_numpy(rng.randn(2, 48, 6, 7).astype(np.float32))
    ref = F.pixel_shuffle(x, 4)
    out = ops.pixel_shuffle(t2j(x), 4)
    np.testing.assert_allclose(np.asarray(out), t2j(ref), rtol=1e-6)
    back = ops.pixel_unshuffle(out, 4)
    np.testing.assert_allclose(np.asarray(back), t2j(x), rtol=1e-6)


def test_pixel_unshuffle_torch(rng):
    x = torch.from_numpy(rng.randn(1, 5, 12, 8).astype(np.float32))
    ref = F.pixel_unshuffle(x, 2)
    out = ops.pixel_unshuffle(t2j(x), 2)
    np.testing.assert_allclose(np.asarray(out), t2j(ref), rtol=1e-6)


def test_channel_shuffle(rng):
    x = torch.from_numpy(rng.randn(1, 12, 4, 4).astype(np.float32))
    ref = torch.channel_shuffle(x, 3)
    out = ops.channel_shuffle(t2j(x), 3)
    np.testing.assert_allclose(np.asarray(out), t2j(ref), rtol=1e-6)


def test_batch_norm(rng):
    c = 6
    x = torch.from_numpy(rng.randn(2, c, 9, 9).astype(np.float32))
    bn = torch.nn.BatchNorm2d(c).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.randn(c).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(rng.randn(c).astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(rng.randn(c).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5))
        ref = bn(x)
    p = {"weight": bn.weight.detach().numpy(), "bias": bn.bias.detach().numpy(),
         "running_mean": bn.running_mean.numpy(), "running_var": bn.running_var.numpy()}
    out = ops.batch_norm(p, t2j(x))
    np.testing.assert_allclose(np.asarray(out), t2j(ref), rtol=1e-4, atol=1e-5)


def test_layer_norm(rng):
    x = torch.from_numpy(rng.randn(2, 10, 16).astype(np.float32))
    ln = torch.nn.LayerNorm(16).eval()
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(rng.randn(16).astype(np.float32)))
        ln.bias.copy_(torch.from_numpy(rng.randn(16).astype(np.float32)))
        ref = ln(x)
    p = {"weight": ln.weight.detach().numpy(), "bias": ln.bias.detach().numpy()}
    out = ops.layer_norm(p, x.numpy())
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_linear(rng):
    x = torch.from_numpy(rng.randn(3, 7, 12).astype(np.float32))
    w = torch.from_numpy(rng.randn(5, 12).astype(np.float32))
    b = torch.from_numpy(rng.randn(5).astype(np.float32))
    ref = F.linear(x, w, b)
    out = ops.linear({"weight": w.numpy().T, "bias": b.numpy()}, x.numpy())
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode,size", [
    ("bilinear", (30, 34)),
    ("bilinear", (7, 9)),
    ("bicubic", (60, 68)),
    ("bicubic", (8, 10)),
    ("nearest", (30, 34)),
])
def test_interpolate(rng, mode, size):
    x = torch.from_numpy(rng.randn(1, 3, 15, 17).astype(np.float32))
    kwargs = {} if mode == "nearest" else {"align_corners": False}
    ref = F.interpolate(x, size=size, mode=mode, **kwargs)
    out = ops.interpolate(t2j(x), size=size, mode=mode)
    np.testing.assert_allclose(np.asarray(out), t2j(ref), rtol=1e-4, atol=1e-4)


def test_interpolate_scale_factor(rng):
    x = torch.from_numpy(rng.randn(1, 3, 12, 14).astype(np.float32))
    ref = F.interpolate(x, scale_factor=4, mode="bicubic", align_corners=False)
    out = ops.interpolate(t2j(x), scale_factor=4, mode="bicubic")
    np.testing.assert_allclose(np.asarray(out), t2j(ref), rtol=1e-4, atol=1e-4)


def test_nearest_integer_upsample(rng):
    x = torch.from_numpy(rng.randn(1, 4, 9, 11).astype(np.float32))
    ref = F.interpolate(x, scale_factor=2, mode="nearest")
    out = ops.interpolate(t2j(x), scale_factor=2, mode="nearest")
    np.testing.assert_allclose(np.asarray(out), t2j(ref), rtol=1e-6)


@pytest.mark.parametrize("h", [16, 17, 64, 256])
def test_spectral_dft_matmul_matches_fft(rng, h):
    """rfft_h/irfft_h are DFT matmuls (no XLA fft custom call — it
    miscompiles on the axon TPU backend when fused with other chains, see
    ops/spectral.py); they must match numpy's pocketfft bit-close."""
    from ntire2022_esr_tpu.ops.spectral import irfft_h, rfft_h

    x = rng.randn(2, h, 7, 5).astype(np.float32)
    re, im = rfft_h(x)
    ref = np.fft.rfft(x.astype(np.float64), axis=1, norm="ortho")
    np.testing.assert_allclose(np.asarray(re), ref.real, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(im), ref.imag, rtol=1e-4, atol=1e-5)
    rt = irfft_h(re, im, h)
    np.testing.assert_allclose(np.asarray(rt), x, rtol=1e-4, atol=1e-5)


def test_spectral_tx_matches_torch(rng):
    """Full SpectralTx vs the reference's torch graph (basicblock.py:9-32)."""
    from ntire2022_esr_tpu.ops.spectral import spectral_tx

    c = 4
    x = torch.from_numpy(rng.randn(1, c, 12, 9).astype(np.float32))
    w = torch.from_numpy(rng.randn(2 * c, 2 * c, 1, 1).astype(np.float32) * 0.3)
    b = torch.from_numpy(rng.randn(2 * c).astype(np.float32) * 0.1)

    ff = torch.view_as_real(torch.fft.rfft(x, dim=2, norm="ortho"))
    ff = ff.permute(0, 1, 4, 2, 3).contiguous().view((1, -1) + ff.shape[2:4])
    ff = torch.nn.functional.leaky_relu(
        torch.nn.functional.conv2d(ff, w, b), negative_slope=0.2)
    ff = torch.view_as_complex(
        ff.view((1, -1, 2) + ff.shape[2:]).permute(0, 1, 3, 4, 2).contiguous())
    ref = torch.fft.irfft(ff, dim=2, norm="ortho")

    p = {"conv": {"weight": conv_w(w), "bias": b.numpy()}}
    out = spectral_tx(p, t2j(x))
    np.testing.assert_allclose(np.asarray(out), t2j(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("count_include_pad", [True, False])
def test_avg_pool_padded_torch_parity(rng, count_include_pad):
    """Padded avg_pool2d must match torch for BOTH count_include_pad modes
    (torch defaults to True: zero padding counts as real samples)."""
    x = torch.from_numpy(rng.randn(2, 5, 11, 13).astype(np.float32))
    for k, s, p in [(3, 1, 1), (3, 2, 1), (5, 3, 2), (2, 2, 1)]:
        ref = F.avg_pool2d(x, k, s, p, count_include_pad=count_include_pad)
        out = ops.avg_pool2d(t2j(x), k, s, p, count_include_pad=count_include_pad)
        np.testing.assert_allclose(np.asarray(out), t2j(ref), rtol=1e-5, atol=1e-6)


def test_avg_pool_default_matches_torch_default(rng):
    """No-kwarg call == torch no-kwarg call (the silent-trap fix)."""
    x = torch.from_numpy(rng.randn(1, 4, 9, 9).astype(np.float32))
    ref = F.avg_pool2d(x, 3, 2, 1)
    out = ops.avg_pool2d(t2j(x), 3, 2, 1)
    np.testing.assert_allclose(np.asarray(out), t2j(ref), rtol=1e-5, atol=1e-6)


def test_spectral_tx_rejects_odd_height(rng):
    """Odd H silently diverges from the reference irfft (n=2*(hp-1)=h-1);
    the framework refuses instead (no zoo model reaches odd H)."""
    from ntire2022_esr_tpu.ops import spectral

    x = np.asarray(rng.rand(1, 7, 4, 2).astype(np.float32))
    w = rng.randn(1, 1, 4, 4).astype(np.float32)
    with pytest.raises(NotImplementedError, match="even H"):
        spectral.spectral_tx({"conv": {"weight": w}}, x)


@pytest.mark.parametrize("h", [512, 768, 1024])
def test_four_step_dft_matches_numpy(rng, h):
    """The four-step (Cooley-Tukey) DFT matmul path — used for the NLFFC
    tile height in non-parity modes (O(h*(h1+h2)) vs O(h^2)) — must match
    pocketfft bit-close and round-trip."""
    from ntire2022_esr_tpu import config
    from ntire2022_esr_tpu.ops import spectral

    import os

    x = rng.randn(2, h, 5, 3).astype(np.float32)
    os.environ["NTIRE_FOUR_STEP_DFT"] = "1"
    try:
        with config.numerics_mode("high"):
            assert spectral._use_four_step(h)
            re, im = spectral.rfft_h(x)
            rt = spectral.irfft_h(re, im, h)
    finally:
        del os.environ["NTIRE_FOUR_STEP_DFT"]
    ref = np.fft.rfft(x.astype(np.float64), axis=1, norm="ortho")
    np.testing.assert_allclose(np.asarray(re), ref.real, rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(im), ref.imag, rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rt), x, rtol=1e-4, atol=2e-5)


def test_four_step_gating():
    """Parity mode and unfactorable/small heights stay on the direct
    single-matmul DFT (the protocol-validated graph)."""
    from ntire2022_esr_tpu import config
    from ntire2022_esr_tpu.ops import spectral

    import os

    with config.numerics_mode("high"):
        assert not spectral._use_four_step(1024)  # default off (measured slower)
    os.environ["NTIRE_FOUR_STEP_DFT"] = "1"
    try:
        with config.numerics_mode("parity"):
            assert not spectral._use_four_step(1024)
        with config.numerics_mode("high"):
            assert not spectral._use_four_step(256)   # below threshold
            assert not spectral._use_four_step(1021)  # prime: no h1 >= 8
            assert spectral._use_four_step(1024)
    finally:
        del os.environ["NTIRE_FOUR_STEP_DFT"]
