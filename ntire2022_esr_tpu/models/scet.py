"""SCET — team30 "Giantpandacv" (reference models/team30_scet.py:230-259).

16 self-calibrated SCPA conv blocks + one Restormer-style TransformerBlock
(MDTA channel attention + gated dconv FFN, WithBias LayerNorm), dual
PixelShuffle heads summed.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import config, ops
from ntire2022_esr_tpu.models import blocks
from ntire2022_esr_tpu.ops import attention as attn_ops

SLOPE = 0.2


def _paconv(p, x):
    y = ops.sigmoid(ops.conv(p["k2"], x, padding=0))
    out = ops.conv(p["k3"], x) * y
    return ops.conv(p["k4"], out)


def _scpa(p, x):
    a = ops.leaky_relu(ops.conv(p["conv1_a"], x, padding=0), SLOPE)
    b = ops.leaky_relu(ops.conv(p["conv1_b"], x, padding=0), SLOPE)
    a = ops.leaky_relu(ops.conv(blocks.seq(p["k1"], 0), a), SLOPE)
    b = ops.leaky_relu(_paconv(p["PAConv"], b), SLOPE)
    out = ops.conv(p["conv3"], jnp.concatenate([a, b], axis=-1), padding=0)
    return out + x


def _gdfn(p, x):
    h = ops.conv(p["project_in"], x, padding=0)
    h = ops.conv(p["dwconv"], h, groups=h.shape[-1])
    x1, x2 = jnp.split(h, 2, axis=-1)
    return ops.conv(p["project_out"], ops.gelu(x1) * x2, padding=0)


def _with_bias_ln(p, x):
    return ops.layer_norm(p["body"], x, eps=1e-5)


def _transformer_block(p, x, num_heads: int = 8):
    h = _with_bias_ln(p["norm1"], x)
    x = x + attn_ops.mdta_channel_attention(p["attn"], h, num_heads, p["attn"]["temperature"])
    x = x + _gdfn(p["ffn"], _with_bias_ln(p["norm2"], x))
    return x


def scet_body(params, x, *, n_scpa: int = 16):
    """conv3 + 16x SCPA + transformer (LR domain). Returns only the
    transformer output: the second head's input is one cheap conv3(x)
    that the tail REMATERIALIZES from x — halving the body->tail
    intermediate (the dual-map seam runtime-OOMed the chunked-tail
    schedule, docs/RUNTIME_TPU.md ledger). Body/tail seam = the
    stage-split boundary (harness/stagesplit.py)."""
    h = ops.conv(params["conv3"], x)
    p1 = params["path1"]
    scpa_params = [p1["0"]["arr"][str(i)] for i in range(n_scpa)]
    if config.scan_blocks("scet"):
        h1 = blocks.scan_chain(_scpa, scpa_params, h)
    else:
        h1 = h
        for p in scpa_params:
            h1 = _scpa(p, h1)
    return _transformer_block(p1["1"]["arr"]["0"], h1)


def scet_tail(params, h1, x_lr, *, upscale: int = 4):
    """Both pixel-shuffle heads, summed; the second head's input is
    rematerialized as conv3(x_lr) (one 3x3 at LR — trades ~2% extra MACs
    for half the stage-split intermediate)."""
    h = ops.conv(params["conv3"], x_lr)
    p1 = params["path1"]
    # HR-tail bf16 is deliberately NOT wired here: on-chip A/B (batch 32:
    # 20.94 -> 20.30 ms/img, -3%) and at the real batch-64 cap the bf16 cast
    # OOMs HBM (XLA materializes f32 HR conv temps it otherwise fuses), i.e.
    # the lever LOWERS this model's batch ceiling — see docs/RUNTIME_TPU.md.
    h1 = ops.conv(p1["2"], h1)
    h1 = ops.pixel_shuffle(h1, upscale)
    h1 = ops.conv(p1["4"], h1)

    h2 = ops.pixel_shuffle(h, upscale)
    h2 = ops.conv(params["path2"]["1"], h2)
    return h1 + h2


def scet_apply(params, x, *, n_scpa: int = 16, upscale: int = 4):
    return scet_tail(params, scet_body(params, x, n_scpa=n_scpa), x, upscale=upscale)
