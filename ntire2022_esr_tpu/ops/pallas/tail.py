"""Fused conv3x3 + PixelShuffle(x4) tail Pallas kernel.

The zoo's universal upsampler tail (reference rfdn_baseline/RFDN.py:29-41,
block.py:168-172) is a 3x3 conv to 3*r^2 = 48 channels followed by
depth-to-space r=4. XLA executes the conv, writes (H, W, 48) to HBM, then
reads it back for the shuffle transpose and writes (4H, 4W, 3). This kernel
computes the conv per tile and writes the shuffled (4th, 4tw, 3) output
directly, skipping the intermediate HBM round-trip.

Channel order matches torch PixelShuffle (NCHW channel-major): conv output
channel k feeds output channel c = k // r^2 at sub-position
(i, j) = divmod(k % r^2, r) — identical to ops.pixel_shuffle semantics
(verified against it in tests/test_pallas_kernels.py).

Design notes (/opt/skills/guides/pallas_guide.md):
- grid (N, H-tiles, W-tiles); input BlockSpec uses pl.Element dims for the
  1-pixel halo window, like ops/pallas/conv_chain.py.
- the conv is nine shifted (th*tw, cin) x (cin, 48) MXU dots accumulated in
  f32; 48 output lanes = 3*16 — the r^2 sub-positions ride the lane dim and
  are scattered to space by a single reshape/transpose in VMEM before the
  block write.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntire2022_esr_tpu import config


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _tail_kernel(x_ref, w0_ref, w1_ref, w2_ref, b_ref, out_ref, inbuf, *, th: int,
                 tw: int, r: int, cout: int, compute_dtype, out_dtype,
                 precision):
    cin = w0_ref.shape[-2]
    nch = r * r * cout
    # rank-3 scratch copy: Mosaic rejects partial reads of rank-4 VMEM refs
    # whose lane dim is not 128-aligned (see conv_chain.py)
    inbuf[:, :, 0:cin] = x_ref[0]

    def body(dy, acc):
        row = inbuf[pl.ds(dy, th)]
        w_refs = (w0_ref, w1_ref, w2_ref)
        for dx in range(3):
            a = row[:, dx:dx + tw, :cin]
            acc = acc + jax.lax.dot_general(
                a.astype(compute_dtype), w_refs[dx][dy].astype(compute_dtype),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
        return acc

    init = jnp.broadcast_to(b_ref[:].astype(jnp.float32), (th, tw, nch))
    conv = jax.lax.fori_loop(0, 3, body, init)  # (th, tw, r*r*cout)
    # depth-to-space, torch channel-major order: k = c*r*r + i*r + j
    y = conv.reshape(th, tw, cout, r, r)            # (t, u, c, i, j)
    y = jnp.transpose(y, (0, 3, 1, 4, 2))           # (t, i, u, j, c)
    out_ref[0] = y.reshape(th * r, tw * r, cout).astype(out_dtype)


def fused_conv3x3_pixelshuffle(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    r: int = 4,
    tile: Tuple[int, int] = (32, 32),
) -> jax.Array:
    """conv2d(x, w, padding=1) + pixel_shuffle(r); w is HWIO (3,3,cin,cout*r^2)."""
    nm = config.numerics()
    n, h, w_sz, cin = x.shape
    nch = int(w.shape[-1])
    assert nch % (r * r) == 0, (nch, r)
    cout = nch // (r * r)

    th = min(tile[0], h)
    tw = max(8, min(tile[1], _cdiv(w_sz, 8) * 8))
    gh, gw = _cdiv(h, th), _cdiv(w_sz, tw)

    win_h = th + 2
    win_w = _cdiv(tw + 2, 8) * 8
    pad_b = gh * th - h + 2
    pad_r = gw * tw + win_w - tw - 1 - w_sz
    xp = jnp.pad(x, ((0, 0), (1, pad_b), (1, pad_r), (0, 0)))

    wk = jnp.asarray(w)
    bias = jnp.asarray(b) if b is not None else jnp.zeros((nch,), x.dtype)

    kernel = functools.partial(
        _tail_kernel, th=th, tw=tw, r=r, cout=cout,
        compute_dtype=nm.compute_dtype, out_dtype=x.dtype,
        precision=nm.conv_precision,
    )

    in_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(win_h), pl.Element(win_w), pl.Element(cin)),
        lambda bb, i, j: (bb, i * th, j * tw, 0),
        memory_space=pltpu.VMEM,
    )
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4

    out = pl.pallas_call(
        kernel,
        grid=(n, gh, gw),
        in_specs=[in_spec] + w_specs,
        out_specs=pl.BlockSpec((1, th * r, tw * r, cout),
                               lambda bb, i, j: (bb, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, gh * th * r, gw * tw * r, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((win_h, win_w, cin), x.dtype)],
    )(xp, wk[:, 0], wk[:, 1], wk[:, 2], bias)
    return out[:, :h * r, :w_sz * r, :]
