"""Fused conv3x3(+bias+LeakyReLU) chain Pallas kernel.

The zoo's hot path (IMDN/RFDN/RLFN families) is a chain of stride-1 3x3
convs with elementwise activations at constant resolution. XLA executes
each conv as its own HBM round-trip; this kernel keeps the whole chain's
intermediates in VMEM:

  HBM -> [tile+halo DMA] -> conv1 -> act -> conv2 -> act -> ... -> +x -> HBM

Design notes (see /opt/skills/guides/pallas_guide.md):
- grid over (batch, H-tiles, W-tiles); each program DMAs one input tile
  with a ``depth``-pixel halo from HBM into VMEM scratch.
- each 3x3 conv is 3 MXU dots per output row-shift: the (dy, *) taps are
  gathered into an (TH*TW, 3*Cin) operand so K is 3*Cin (better MXU
  utilisation than 9 dots with K=Cin), accumulated in f32.
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


def _conv3x3_tile(x, w, b, th: int, tw: int, compute_dtype):
    """x: (th+2, tw+2, cin) -> (th, tw, cout); valid conv, f32 accumulate."""
    cin = x.shape[-1]
    cout = w.shape[-1]
    acc = jnp.zeros((th * tw, cout), jnp.float32)
    for dy in range(3):
        taps = [x[dy:dy + th, dx:dx + tw, :] for dx in range(3)]
        a = jnp.concatenate(taps, axis=-1).reshape(th * tw, 3 * cin)
        wk = w[dy].reshape(3 * cin, cout)
        acc = acc + jnp.dot(a.astype(compute_dtype), wk.astype(compute_dtype),
                            preferred_element_type=jnp.float32)
    out = acc.reshape(th, tw, cout)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out


def _border_mask(out, row0, col0, h: int, w: int):
    """Zero positions whose global coords fall outside [0,h) x [0,w)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1) + col0
    ok = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
    return jnp.where(ok, out, 0.0)


def _chain_kernel(x_hbm, *refs, th: int, tw: int, depth: int, h: int, w: int,
                  slope: float, residual: bool, compute_dtype, out_dtype):
    *wb_refs, out_ref, scratch, sem = refs
    n = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    # input is pre-padded by ``depth`` zeros on top/left (and enough on
    # bottom/right), so the tile read starts at ti*th (offset already
    # includes the halo shift)
    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(ti * th, th + 2 * depth), pl.ds(tj * tw, tw + 2 * depth), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    cur = scratch[:]
    cur_th = th + 2 * depth
    cur_tw = tw + 2 * depth
    # global coords of cur[0,0]
    row0 = ti * th - depth
    col0 = tj * tw - depth
    n_convs = len(wb_refs) // 2
    for k in range(n_convs):
        wk = wb_refs[2 * k][:]
        bk = wb_refs[2 * k + 1][:] if wb_refs[2 * k + 1] is not None else None
        cur_th -= 2
        cur_tw -= 2
        row0 += 1
        col0 += 1
        cur = _conv3x3_tile(cur, wk, bk, cur_th, cur_tw, compute_dtype)
        if k < n_convs - 1:
            cur = jnp.where(cur >= 0, cur, cur * slope)
            cur = _border_mask(cur, row0, col0, h, w)
            cur = cur.astype(compute_dtype)
    # final stage: activation applied after the (optional) residual add?
    # RLFB applies act after each conv and then adds x; keep act here.
    cur = jnp.where(cur >= 0, cur, cur * slope)
    if residual:
        center = scratch[depth:depth + th, depth:depth + tw, :]
        cur = cur + center.astype(jnp.float32)
    out_ref[0] = cur.astype(out_dtype)


def fused_conv3x3_chain(
    x: jax.Array,
    weights: Sequence[jax.Array],
    biases: Sequence[Optional[jax.Array]],
    *,
    slope: float = 0.05,
    residual: bool = True,
    tile: Tuple[int, int] = (64, 64),
) -> jax.Array:
    """Chain of same-resolution 3x3 convs with LeakyReLU after each, then
    optionally + x (the RLFB body). All channel counts must match for the
    residual; semantics == repeated ops.conv2d(padding=1) + leaky_relu.
    """
    nm = config.numerics()
    n, h, w, cin = x.shape
    depth = len(weights)
    th, tw = tile
    th = min(th, _cdiv(h, 1))
    tw = min(tw, _cdiv(w, 1))
    gh, gw = _cdiv(h, th), _cdiv(w, tw)

    # pad: halo of ``depth`` on top/left; halo + tile remainder on bottom/right
    pad_b = gh * th - h + 2 * depth
    pad_r = gw * tw - w + 2 * depth
    xp = jnp.pad(x, ((0, 0), (depth, pad_b), (depth, pad_r), (0, 0)))

    cout = weights[-1].shape[-1]
    wb_specs = []
    wb_args = []
    for wk, bk in zip(weights, biases):
        wb_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        wb_args.append(jnp.asarray(wk))
        wb_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        wb_args.append(jnp.asarray(bk if bk is not None else jnp.zeros((wk.shape[-1],), x.dtype)))

    kernel = functools.partial(
        _chain_kernel, th=th, tw=tw, depth=depth, h=h, w=w, slope=slope,
        residual=residual, compute_dtype=nm.compute_dtype, out_dtype=x.dtype,
    )

    out = pl.pallas_call(
        kernel,
        grid=(n, gh, gw),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + wb_specs,
        out_specs=pl.BlockSpec((1, th, tw, cout), lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, gh * th, gw * tw, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * depth, tw + 2 * depth, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, *wb_args)
    return out[:, :h, :w, :]
