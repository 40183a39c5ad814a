"""Fused conv3x3(+bias+LeakyReLU) chain Pallas kernel.

The zoo's hot path (IMDN/RFDN/RLFN families) is a chain of stride-1 3x3
convs with elementwise activations at constant resolution. XLA executes
each conv as its own HBM round-trip; this kernel keeps the whole chain's
intermediates in VMEM:

  HBM -> [overlapping tile+halo window] -> conv1 -> act -> ... -> +x -> HBM

Measured outcome (TPU v5e, batch 8, 256^2, C=48, bf16): XLA's native conv
path runs the 3-conv chain in ~3.7 ms vs ~13.7 ms for this kernel — at the
zoo's channel counts (<=64 lanes, <128) the MXU dots are lane-padded and
XLA's conv scheduling wins; the kernel is kept as verified infrastructure
(and for future >=128-channel fusions), not as the default path. Larger
tiles hit Mosaic's 16 MB VMEM stack (temporaries are not aggressively
reused), capping tiles at ~32x32-64x32.

Design notes (see /opt/skills/guides/pallas_guide.md):
- grid over (batch, H-tiles, W-tiles); the input BlockSpec uses
  ``pl.Element`` dims so each program reads an overlapping window with a
  ``depth``-pixel halo (pallas pipelines the window loads).
- each 3x3 conv is nine shifted (th, tw, cin) x (cin, cout) MXU dots
  accumulated in f32 (Mosaic cannot concatenate shifted VMEM views, so
  taps stay separate dots).
- torch 'same'-padding semantics across the chain are preserved by
  zeroing halo rows/cols that fall outside the true image after every
  stage (the reference zero-pads each conv's input).
- weights/biases live whole in VMEM (zoo channel counts are <= 64).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntire2022_esr_tpu import config


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _conv3x3_from_ref(src_ref, w_refs, b_ref, acc_ref, th: int, tw: int,
                      compute_dtype, precision):
    """Valid 3x3 conv reading a (th+2, tw+2+, cin) region of ``src_ref``;
    returns a (th, tw, cout) value.

    Fully static: the 9 taps are separate (cin, cout) weight refs and
    static row/col slices (Mosaic rejects dynamic slices whose trailing
    dims are not 128-aligned, and cannot concat shifted views). The f32
    accumulator lives in a scratch ref — accumulating a value chain keeps
    every partial sum live on Mosaic's VMEM stack and OOMs at large tiles.
    """
    cout = w_refs[0].shape[-1]
    cin = w_refs[0].shape[-2]

    def body(dy, acc):
        row = src_ref[pl.ds(dy, th)]
        for dx in range(3):
            a = row[:, dx:dx + tw, :cin]
            acc = acc + jax.lax.dot_general(
                a.astype(compute_dtype), w_refs[dx][dy].astype(compute_dtype),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
        return acc

    init = jnp.broadcast_to(b_ref[:].astype(jnp.float32), (th, tw, cout))
    return jax.lax.fori_loop(0, 3, body, init)


def _conv3x3_packed_from_ref(src_ref, wcat_ref, b_ref, im2col_ref, th: int,
                             tw: int, cin: int, compute_dtype, precision):
    """dx-packed variant: per dy, the three dx-shifted views are copied into
    an im2col scratch (th, tw, 3*cin) and contracted in ONE MXU dot with
    K = 3*cin (>= 128 lanes at zoo widths, vs 9 dots of K = cin <= 64).
    ``wcat_ref`` is (3, 3*cin, cout): dx-major concatenated taps per dy.
    """
    cout = wcat_ref.shape[-1]

    def body(dy, acc):
        row = src_ref[pl.ds(dy, th)]
        for dx in range(3):
            # cast: the scratch is compute_dtype but the first stage reads
            # rows from the x.dtype input buffer
            im2col_ref[0:th, 0:tw, dx * cin:(dx + 1) * cin] = (
                row[:, dx:dx + tw, :cin].astype(im2col_ref.dtype))
        a = im2col_ref[0:th, 0:tw, 0:3 * cin]
        return acc + jax.lax.dot_general(
            a.astype(compute_dtype), wcat_ref[dy].astype(compute_dtype),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    init = jnp.broadcast_to(b_ref[:].astype(jnp.float32), (th, tw, cout))
    return jax.lax.fori_loop(0, 3, body, init)


def _border_mask(out, row0, col0, h: int, w: int):
    """Zero positions whose global coords fall outside [0,h) x [0,w)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1) + col0
    ok = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
    return jnp.where(ok, out, 0.0)


def _chain_kernel(x_ref, *refs, th: int, tw: int, depth: int, h: int, w: int,
                  slope: float, residual: bool, compute_dtype, out_dtype,
                  precision, pack_dx: bool = False):
    if pack_dx:
        *wb_refs, out_ref, ping, pong, inbuf, accbuf, im2col = refs
        refs_per_conv = 2  # concatenated tap weights + bias
    else:
        *wb_refs, out_ref, ping, pong, inbuf, accbuf = refs
        im2col = None
        refs_per_conv = 4  # 3 dy-stacked tap weights + bias
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    cur_th = th + 2 * depth
    cur_tw = tw + 2 * depth
    # global coords of the current stage's [0,0] in the unpadded image
    row0 = ti * th - depth
    col0 = tj * tw - depth
    n_convs = len(wb_refs) // refs_per_conv
    scratches = [ping, pong]
    # Copy the input block into rank-3 scratch once: Mosaic rejects partial
    # reads of rank-4 VMEM refs whose lane dim is not 128-aligned, but
    # rank-3 row slices are fine.
    cin0 = x_ref.shape[-1]
    inbuf[:, :, 0:cin0] = x_ref[0]
    src = inbuf
    cur = None
    for k in range(n_convs):
        cur_th -= 2
        cur_tw -= 2
        row0 += 1
        col0 += 1
        if pack_dx:
            cin_k = wb_refs[2 * k].shape[-2] // 3
            cur = _conv3x3_packed_from_ref(src, wb_refs[2 * k], wb_refs[2 * k + 1],
                                           im2col, cur_th, cur_tw, cin_k,
                                           compute_dtype, precision)
        else:
            cur = _conv3x3_from_ref(src, wb_refs[4 * k:4 * k + 3], wb_refs[4 * k + 3],
                                    accbuf, cur_th, cur_tw, compute_dtype, precision)
        cur = jnp.where(cur >= 0, cur, cur * slope)
        if k < n_convs - 1:
            cur = _border_mask(cur, row0, col0, h, w)
            dst = scratches[k % 2]
            dst[0:cur_th, 0:cur_tw, 0:cur.shape[-1]] = cur.astype(compute_dtype)
            src = dst
    if residual:
        center = inbuf[depth:depth + th, depth:depth + tw, 0:cin0]
        cur = cur + center.astype(jnp.float32)
    out_ref[0] = cur.astype(out_dtype)


def fused_conv3x3_chain(
    x: jax.Array,
    weights: Sequence[jax.Array],
    biases: Sequence[Optional[jax.Array]],
    *,
    slope: float = 0.05,
    residual: bool = True,
    tile: Tuple[int, int] = (32, 32),
    pack_dx: bool = False,
) -> jax.Array:
    """Chain of same-resolution 3x3 convs with LeakyReLU after each, then
    optionally + x (the RLFB body). All channel counts must match for the
    residual; semantics == repeated ops.conv2d(padding=1) + leaky_relu.

    ``pack_dx=True`` contracts the three dx taps in one MXU dot per dy via
    an im2col scratch: K = 3*cin (>= 128 lanes at zoo widths) instead of
    nine K = cin dots — the ">=128-lane repacked" variant.
    """
    nm = config.numerics()
    n, h, w, cin = x.shape
    depth = len(weights)
    th = min(tile[0], h)
    tw = max(8, min(tile[1], _cdiv(w, 8) * 8))
    gh, gw = _cdiv(h, th), _cdiv(w, tw)

    # Mosaic requires the sublane (W) block dim be a multiple of 8; the
    # input window reads a few extra (unused) halo columns to satisfy it.
    win_h = th + 2 * depth
    win_w = _cdiv(tw + 2 * depth, 8) * 8

    # halo of ``depth`` on top/left; window overrun + tile remainder right/bottom
    pad_b = gh * th - h + 2 * depth
    pad_r = gw * tw + win_w - tw - depth - w
    xp = jnp.pad(x, ((0, 0), (depth, pad_b), (depth, pad_r), (0, 0)))

    cout = weights[-1].shape[-1]
    wb_specs = []
    wb_args = []
    for wk, bk in zip(weights, biases):
        wk = jnp.asarray(wk)
        if pack_dx:
            # (3, 3*cin, cout): dx-major tap concat matching the im2col layout
            wb_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            wb_args.append(jnp.concatenate([wk[:, 0], wk[:, 1], wk[:, 2]], axis=1))
        else:
            for dx in range(3):
                wb_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
                wb_args.append(wk[:, dx])  # (3, cin, cout), indexed by dy in-kernel
        wb_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        wb_args.append(jnp.asarray(bk if bk is not None else jnp.zeros((wk.shape[-1],), x.dtype)))

    kernel = functools.partial(
        _chain_kernel, th=th, tw=tw, depth=depth, h=h, w=w, slope=slope,
        residual=residual, compute_dtype=nm.compute_dtype, out_dtype=x.dtype,
        precision=nm.conv_precision, pack_dx=pack_dx,
    )

    # overlapping halo windows via elementwise block indexing
    in_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(win_h), pl.Element(win_w), pl.Element(cin)),
        lambda b, i, j: (b, i * th, j * tw, 0),
        memory_space=pltpu.VMEM,
    )

    scratch_dtype = nm.compute_dtype
    c_max = max([cin] + [int(wk.shape[-1]) for wk in weights])
    out = pl.pallas_call(
        kernel,
        grid=(n, gh, gw),
        in_specs=[in_spec] + wb_specs,
        out_specs=pl.BlockSpec((1, th, tw, cout), lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, gh * th, gw * tw, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((win_h, win_w, c_max), scratch_dtype),
            pltpu.VMEM((win_h, win_w, c_max), scratch_dtype),
            pltpu.VMEM((win_h, win_w, cin), x.dtype),
            pltpu.VMEM((win_h, win_w, c_max), jnp.float32),
        ] + ([pltpu.VMEM((win_h, win_w, 3 * c_max), scratch_dtype)] if pack_dx else []),
    )(xp, *wb_args)
    return out[:, :h, :w, :]
