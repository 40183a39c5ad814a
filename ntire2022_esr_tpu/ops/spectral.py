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


def _split_factor(h: int):
    """Largest divisor pair (h1, h2) with h1 <= h2, h1 closest to sqrt(h);
    None when h has no useful factorization (h1 < 8)."""
    best = None
    d = int(np.sqrt(h))
    while d >= 8:
        if h % d == 0:
            best = (d, h // d)
            break
        d -= 1
    return best


@functools.lru_cache(maxsize=16)
def _four_step_mats(h: int):
    """Constant matrices for the four-step (Cooley-Tukey) DFT over length
    ``h = h1*h2``: stage DFTs W2 (h2) and W1-half (rows 0..h1/2 of the h1
    DFT), the twiddle grid T[n1, f2] = exp(-2pi i f2 n1 / h), and the
    inverse-stage conjugates. All norm='ortho' scaling folded into W1."""
    h1, h2 = _split_factor(h)
    n2 = np.arange(h2)
    w2 = np.exp(-2j * np.pi * np.outer(n2, n2) / h2)            # [f2, n2]
    n1 = np.arange(h1)
    q = np.arange(h1 // 2 + 1)
    w1h = np.exp(-2j * np.pi * np.outer(q, n1) / h1) / np.sqrt(h)  # [q, n1]
    f2 = np.arange(h2)
    tw = np.exp(-2j * np.pi * np.outer(n1, f2) / h)              # [n1, f2]
    w1f = np.exp(-2j * np.pi * np.outer(n1, n1) / h1) / np.sqrt(h)  # full, inverse use
    f32 = lambda a: a.astype(np.float32)
    return (h1, h2,
            f32(w2.real), f32(w2.imag),
            f32(w1h.real), f32(w1h.imag),
            f32(tw.real), f32(tw.imag),
            f32(w1f.real), f32(w1f.imag))


def _use_four_step(h: int) -> bool:
    # Despite 5.4x fewer MACs at h=1024, the four-step path MEASURED
    # SLOWER on-chip (NLFFC spectral component 106 -> 166 ms at tile 256,
    # results/protocol/nlffc_components_r3.json vs nlffc_fourstep.json):
    # the model is HBM/layout-bound at its 16-channel width, and the
    # twiddle elementwise stages + reshapes cost more than the direct
    # form's single big matmuls save. Kept behind an explicit opt-in for
    # the record; default off everywhere.
    import os

    if os.environ.get("NTIRE_FOUR_STEP_DFT", "0") != "1":
        return False
    return h >= 512 and _split_factor(h) is not None and config.mode() != "parity"


def _rfft_h_four_step(x):
    """rfft over axis 1 via two stage-DFT matmuls + twiddle (h = h1*h2).

    Derivation (decimation in time, h_index = n1 + h1*n2):
      Y[q*h2 + f2] = sum_{n1} W1[q,n1] * T[n1,f2] * A[f2,n1],
      A[f2,n1]     = sum_{n2} x[n1 + h1*n2] * W2[f2,n2].
    Only rows q <= h1/2 of W1 are computed (rfft needs f <= h/2); the
    (h1/2+1)*h2 outputs are sliced down to h/2+1.
    """
    nm = config.numerics()
    n, h, w, c = x.shape
    h1, h2, w2r, w2i, w1r, w1i, twr, twi, _, _ = _four_step_mats(h)
    xs = x.reshape(n, h2, h1, w, c)
    # stage 1 over n2 (real input): A[f2, n1]
    ar = jnp.einsum("fn,bnmwc->bfmwc", jnp.asarray(w2r), xs, precision=nm.matmul_precision)
    ai = jnp.einsum("fn,bnmwc->bfmwc", jnp.asarray(w2i), xs, precision=nm.matmul_precision)
    # twiddle (complex mul by T[n1, f2] — note A is [f2, n1] so transpose T)
    twr_j = jnp.asarray(twr.T)[None, :, :, None, None]  # [1, f2, n1, 1, 1]
    twi_j = jnp.asarray(twi.T)[None, :, :, None, None]
    br = ar * twr_j - ai * twi_j
    bi = ar * twi_j + ai * twr_j
    # stage 2 over n1 (complex x complex), rows q = 0..h1/2
    w1r_j, w1i_j = jnp.asarray(w1r), jnp.asarray(w1i)
    yr = (jnp.einsum("qm,bfmwc->bqfwc", w1r_j, br, precision=nm.matmul_precision)
          - jnp.einsum("qm,bfmwc->bqfwc", w1i_j, bi, precision=nm.matmul_precision))
    yi = (jnp.einsum("qm,bfmwc->bqfwc", w1r_j, bi, precision=nm.matmul_precision)
          + jnp.einsum("qm,bfmwc->bqfwc", w1i_j, br, precision=nm.matmul_precision))
    hp = h // 2 + 1
    yr = yr.reshape(n, (h1 // 2 + 1) * h2, w, c)[:, :hp]
    yi = yi.reshape(n, (h1 // 2 + 1) * h2, w, c)[:, :hp]
    return yr, yi


def _irfft_h_four_step(re, im, h: int):
    """Inverse of :func:`_rfft_h_four_step`: hermitian-extend the h/2+1
    spectrum to h, run the conjugate four-step, keep the real part."""
    nm = config.numerics()
    n, hp, w, c = re.shape
    h1, h2, w2r, w2i, _, _, twr, twi, w1fr, w1fi = _four_step_mats(h)
    # full spectrum: Y[h-f] = conj(Y[f]) for f = 1..h/2-1
    fr = jnp.concatenate([re, re[:, 1:h - hp + 1][:, ::-1]], axis=1)
    fi = jnp.concatenate([im, -im[:, 1:h - hp + 1][:, ::-1]], axis=1)
    # inverse = conjugate transform: swap the sign of every twiddle (use
    # conj matrices) — x[t] = sum_f Y[f] e^{+2pi i f t / h} / sqrt(h).
    # Same structure with t = n1 + h1*n2 roles swapped: decimate f.
    fs = fr.reshape(n, h2, h1, w, c)
    gs = fi.reshape(n, h2, h1, w, c)
    # stage 1 over f2' (outer index of the spectrum reshape: f = f1 + h1*f2)
    ar = (jnp.einsum("tn,bnmwc->btmwc", jnp.asarray(w2r), fs, precision=nm.matmul_precision)
          + jnp.einsum("tn,bnmwc->btmwc", jnp.asarray(w2i), gs, precision=nm.matmul_precision))
    ai = (jnp.einsum("tn,bnmwc->btmwc", jnp.asarray(w2r), gs, precision=nm.matmul_precision)
          - jnp.einsum("tn,bnmwc->btmwc", jnp.asarray(w2i), fs, precision=nm.matmul_precision))
    # twiddle conj: e^{+2pi i f1 t2 / h} with grids [f1, t2] -> transpose
    twr_j = jnp.asarray(twr.T)[None, :, :, None, None]
    twi_j = jnp.asarray(twi.T)[None, :, :, None, None]
    br = ar * twr_j + ai * twi_j
    bi = ai * twr_j - ar * twi_j
    # stage 2 over f1, real part only
    w1r_j, w1i_j = jnp.asarray(w1fr), jnp.asarray(w1fi)
    out = (jnp.einsum("qm,btmwc->bqtwc", w1r_j, br, precision=nm.matmul_precision)
           + jnp.einsum("qm,btmwc->bqtwc", w1i_j, bi, precision=nm.matmul_precision))
    return out.reshape(n, h, w, c)


def rfft_h(x):
    """Real FFT over the height axis of NHWC, as (re, im) float arrays.

    re and im come from ONE stacked matmul ([Fr; Fi] @ x): each output row
    contracts independently, so this is bit-identical to two separate
    matmuls while halving the dispatch count.
    """
    if _use_four_step(x.shape[1]):
        return _rfft_h_four_step(x)
    nm = config.numerics()
    fr, fi = _dft_mats(x.shape[1])[:2]
    hp = fr.shape[0]
    stacked = jnp.concatenate([jnp.asarray(fr), jnp.asarray(fi)], axis=0)
    both = jnp.einsum("fh,nhwc->nfwc", stacked, x, precision=nm.matmul_precision)
    return both[:, :hp], both[:, hp:]


def irfft_h(re, im, h: int):
    """Inverse of :func:`rfft_h` back to height ``h``.

    Non-parity modes fuse the two half-matmuls into one ([Br | Bi] @
    [re; im]) — the 2x-longer contraction reassociates the sum, so parity
    mode keeps the protocol-validated two-matmul + add form.
    """
    if _use_four_step(h):
        return _irfft_h_four_step(re, im, h)
    nm = config.numerics()
    br, bi = _dft_mats(h)[2:]
    if config.mode() != "parity":
        mat = jnp.concatenate([jnp.asarray(br), jnp.asarray(bi)], axis=1)
        stacked = jnp.concatenate([re, im], axis=1)
        return jnp.einsum("tf,nfwc->ntwc", mat, stacked, precision=nm.matmul_precision)
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
