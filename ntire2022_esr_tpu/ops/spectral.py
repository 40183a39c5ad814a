"""Spectral (FFT) ops for the NLFFC model (reference team02_nlffc).

SpectralTx (basicblock.py:9-32): 1-D real FFT over the *height* axis
(norm='ortho'), a 1x1 conv on stacked (re, im) channels, LeakyReLU, inverse
FFT. XLA lowers jnp.fft to the TPU FFT; the conv rides the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops


def spectral_tx(p, x, slope: float = 0.2):
    """x: (N, H, W, C) -> same shape; torch channel order [c][re|im]."""
    n, h, w, c = x.shape
    ff = jnp.fft.rfft(x.astype(jnp.float32), axis=1, norm="ortho")  # (n, h', w, c) complex
    hp = ff.shape[1]
    stacked = jnp.stack([ff.real, ff.imag], axis=-1).reshape(n, hp, w, 2 * c)
    out = ops.leaky_relu(ops.conv(p["conv"], stacked, padding=0), slope)
    out = out.reshape(n, hp, w, c, 2)
    ffc = out[..., 0] + 1j * out[..., 1]
    return jnp.fft.irfft(ffc, n=2 * (hp - 1), axis=1, norm="ortho").astype(x.dtype)
