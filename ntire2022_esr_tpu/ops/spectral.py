"""Spectral (FFT) ops for the NLFFC model (reference team02_nlffc).

SpectralTx (basicblock.py:9-32): 1-D real FFT over the *height* axis
(norm='ortho'), a 1x1 conv on stacked (re, im) channels, LeakyReLU, inverse
FFT.

The transform is executed as **cached DFT matmuls on the MXU**, not as the
XLA ``fft`` custom call, for two reasons:

1. Correctness on this backend: the TPU FFT custom call *standalone* is
   accurate (measured ~3e-7 rel), but when the rfft/irfft pair is compiled
   into the same executable as NLFFC's global-context softmax chain the
   result is corrupted wholesale (observed mean |err| ~4 intensity units
   across 99.6% of pixels at 1024^2 bodies; minimal repro: one jit of
   ``conv0(global_context(xl)) + spectral_tx(xg)`` — each half alone is
   exact, their fused sum is not, and ``lax.optimization_barrier`` does
   not help). Replacing the custom call with plain dot_generals removes
   the miscompile entirely (measured 3.7e-4 max abs vs the f64 host
   oracle on the same real activations).
2. TPU-native design: a (H/2+1, H) matmul over the height axis rides the
   MXU at full tile utilisation, consistent with how every resize in this
   framework is executed (ops/resize.py); H <= ~1k for all zoo uses, where
   the O(H^2) matmul is comfortably within the model's conv budget.

The DFT/iDFT matrices are built on the host from ``np.fft`` impulse
responses (bit-defined, norm='ortho') and cached per height; under jit
they are compile-time constants.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ntire2022_esr_tpu import config, ops


@functools.lru_cache(maxsize=64)
def _dft_mats(h: int):
    """(Fr, Fi, Br, Bi): rfft/irfft as real matrices, norm='ortho'.

    rfft(x)[f] = sum_t (Fr + i*Fi)[f, t] x[t];  irfft from (re, im):
    x[t] = Br[t, f] re[f] + Bi[t, f] im[f].
    """
    hp = h // 2 + 1
    eye = np.eye(h, dtype=np.float64)
    fwd = np.fft.rfft(eye, axis=0, norm="ortho")  # column t = rfft(e_t)
    eyec = np.eye(hp, dtype=np.complex128)
    back_re = np.stack([np.fft.irfft(eyec[:, f], n=h, norm="ortho") for f in range(hp)], axis=1)
    back_im = np.stack([np.fft.irfft(1j * eyec[:, f], n=h, norm="ortho") for f in range(hp)], axis=1)
    return (fwd.real.astype(np.float32), fwd.imag.astype(np.float32),
            back_re.astype(np.float32), back_im.astype(np.float32))


def rfft_h(x):
    """Real FFT over the height axis of NHWC, as (re, im) float arrays."""
    nm = config.numerics()
    fr, fi = _dft_mats(x.shape[1])[:2]
    re = jnp.einsum("fh,nhwc->nfwc", jnp.asarray(fr), x, precision=nm.matmul_precision)
    im = jnp.einsum("fh,nhwc->nfwc", jnp.asarray(fi), x, precision=nm.matmul_precision)
    return re, im


def irfft_h(re, im, h: int):
    """Inverse of :func:`rfft_h` back to height ``h``."""
    nm = config.numerics()
    br, bi = _dft_mats(h)[2:]
    return (jnp.einsum("tf,nfwc->ntwc", jnp.asarray(br), re, precision=nm.matmul_precision)
            + jnp.einsum("tf,nfwc->ntwc", jnp.asarray(bi), im, precision=nm.matmul_precision))


def spectral_tx(p, x, slope: float = 0.2):
    """x: (N, H, W, C) -> same shape; torch channel order [c][re|im]."""
    n, h, w, c = x.shape
    if h % 2:
        # The reference's irfft uses the default n=2*(hp-1), which is h-1
        # for odd h — its round-trip CHANGES the height. Every zoo use is
        # even-h (NLFFC upsamples x4 before any spectral op); refuse odd h
        # rather than silently diverge from reference semantics
        # (team02_nlffc/basicblock.py:9-32).
        raise NotImplementedError(
            f"spectral_tx requires even H (got {h}): the reference irfft "
            "round-trips odd heights to h-1; no zoo model reaches this")
    re, im = rfft_h(x.astype(jnp.float32))
    hp = re.shape[1]
    stacked = jnp.stack([re, im], axis=-1).reshape(n, hp, w, 2 * c)
    out = ops.leaky_relu(ops.conv(p["conv"], stacked, padding=0), slope)
    out = out.reshape(n, hp, w, c, 2)
    return irfft_h(out[..., 0], out[..., 1], h).astype(x.dtype)
