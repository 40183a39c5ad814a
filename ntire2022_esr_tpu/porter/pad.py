"""Channel-padding layout transform: widen conv channels to MXU-friendly
lane counts with zero weights, at load time.

Zoo models use conv widths like 40-56 channels; the TPU MXU is 128 lanes
wide (8x128 tiles), so a 46-wide conv leaves most of the lane dimension
idle. Padding the channel axes to 64 (or 128) with **zero** weight
columns/rows is output-equivalent for conv/LReLU/add/pool/resize/
sigmoid-gate graphs — padded lanes carry exact zeros through every op, and
gated products multiply a zero activation — while letting XLA tile the MXU
without remainder lanes. The extra FLOPs are free if the op was
layout-bound (the int8 probe's hypothesis, docs/RUNTIME_TPU.md).

Equivalence is up to f32 reassociation, not bit-exact: changing the
channel count changes XLA's reduction blocking, so the *real* terms of
each contraction may sum in a different order (measured max abs ~6e-4 on
a 255-range RLFN output — far inside the +-0.01 dB parity bar).

This is a pure parameter transform: model ``apply`` functions derive every
channel count from the weights, so no model code changes. It is only valid
for models without channel ``split``/slicing (concat is fine only if no
downstream op indexes absolute channel positions) — apply it per-model
after checking the graph; RLFN (4) qualifies.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np


def _round_up(c: int, multiple: int) -> int:
    return -(-c // multiple) * multiple


def pad_conv_channels(
    params,
    widths: Dict[int, int],
    keep_out: Sequence[str] = (),
    keep_in: Sequence[str] = (),
    _path: Tuple[str, ...] = (),
):
    """Return a copy of ``params`` with conv channels widened by zero pads.

    ``widths`` maps an original channel count to its padded size (e.g.
    ``{46: 64, 48: 64}``); channel counts not in the map are untouched.
    ``keep_out`` / ``keep_in`` are param-path components whose conv must
    keep its original output / input channel count (e.g. the pixel-shuffle
    tail conv, whose 3*r*r output channels are semantic).
    """
    if not isinstance(params, dict):
        return params
    if "weight" in params and getattr(params["weight"], "ndim", 0) == 4:
        w = np.asarray(params["weight"])
        kh, kw, cin, cout = w.shape
        new_in = cin if any(k in _path for k in keep_in) else widths.get(cin, cin)
        new_out = cout if any(k in _path for k in keep_out) else widths.get(cout, cout)
        if (new_in, new_out) == (cin, cout):
            return dict(params)
        out = dict(params)
        wp = np.zeros((kh, kw, new_in, new_out), w.dtype)
        wp[:, :, :cin, :cout] = w
        out["weight"] = wp
        if out.get("bias") is not None and new_out != cout:
            b = np.asarray(out["bias"])
            bp = np.zeros((new_out,), b.dtype)
            bp[:cout] = b
            out["bias"] = bp
        return out
    return {k: pad_conv_channels(v, widths, keep_out, keep_in, _path + (str(k),))
            for k, v in params.items()}


def densify_grouped_weights(params, groups: int, key_pred, _path: Tuple[str, ...] = ()):
    """Expand selected grouped-conv weights (kh, kw, cin/g, cout) to dense
    block-diagonal (kh, kw, cin, cout) at load time. ``ops.conv2d`` infers
    groups=1 when the weight's input dim matches the activation channels,
    so the model code's static ``groups=`` argument needs no change.

    Exact (off-block weights are zero); measured 1.21x sustained on IMDTN
    on-chip (results/protocol/layout_probes_r3.json) — the grouped form's
    cin/g=16 contraction underfills the MXU at zoo widths.
    """
    if not isinstance(params, dict):
        return params
    if ("weight" in params and getattr(params["weight"], "ndim", 0) == 4
            and key_pred(_path)):
        from ntire2022_esr_tpu.ops.nn import block_diag_weights

        w = np.asarray(params["weight"])
        cout_g = w.shape[3] // groups
        out = dict(params)
        out["weight"] = block_diag_weights(
            [w[:, :, :, gi * cout_g:(gi + 1) * cout_g] for gi in range(groups)])
        return out
    return {k: densify_grouped_weights(v, groups, key_pred, _path + (str(k),))
            for k, v in params.items()}


def pad_attention_heads(qkv_p, proj_p, num_heads: int, d_old: int, d_new: int):
    """Pad an MHA's per-head dim with zero feature columns (load-time).

    MobileSR's windows have head_dim 5 (C=40 / 8 heads) — a minor
    dimension that is neither lane- nor sublane-aligned, so every q/k/v
    transpose and attention matmul runs at a fraction of the VPU/MXU
    width. Padding each head to ``d_new`` (e.g. 8) with zero columns in
    the packed qkv projection (and matching zero rows in the output
    projection) leaves every attention score and output EXACTLY unchanged
    (zero q/k dims contribute 0 to logits; zero v dims produce zeros that
    the proj rows ignore). The softmax scale must stay d_old**-0.5 —
    callers derive it from the proj weight's out-features.

    Returns new (qkv_params, proj_params) dicts.
    """
    w = np.asarray(qkv_p["weight"])          # (in, 3*heads*d_old)
    cin = w.shape[0]
    w3 = w.reshape(cin, 3, num_heads, d_old)
    wn = np.zeros((cin, 3, num_heads, d_new), w.dtype)
    wn[..., :d_old] = w3
    qkv_new = dict(qkv_p)
    qkv_new["weight"] = wn.reshape(cin, 3 * num_heads * d_new)
    if qkv_p.get("bias") is not None:
        b3 = np.asarray(qkv_p["bias"]).reshape(3, num_heads, d_old)
        bn = np.zeros((3, num_heads, d_new), b3.dtype)
        bn[..., :d_old] = b3
        qkv_new["bias"] = bn.reshape(-1)

    pw = np.asarray(proj_p["weight"])        # (heads*d_old, out)
    pr = pw.reshape(num_heads, d_old, pw.shape[1])
    pn = np.zeros((num_heads, d_new, pw.shape[1]), pw.dtype)
    pn[:, :d_old] = pr
    proj_new = dict(proj_p)
    proj_new["weight"] = pn.reshape(num_heads * d_new, pw.shape[1])
    return qkv_new, proj_new


def pad_mobilesr_heads(params, d_new: int = 8, num_heads: int = 8):
    """MobileSR (20): pad every transformer's attention heads 5 -> d_new."""
    out = {k: (dict(v) if isinstance(v, dict) else v) for k, v in params.items()}
    layers = out["body"]["layers"]
    new_layers = {}
    for li, layer in layers.items():
        tr = dict(layer["0"])
        attn = dict(tr["attn"])
        qkv, proj = pad_attention_heads(
            attn["qkv"], attn["proj_out"], num_heads, d_old=5, d_new=d_new)
        attn["qkv"], attn["proj_out"] = qkv, proj
        tr["attn"] = attn
        new_layers[li] = {**layer, "0": tr}
    out["body"] = {**out["body"], "layers": new_layers}
    return out


def pad_rlfn(params, target: int = 64):
    """RLFN (model 4) padded to ``target`` lanes: 46/48-channel convs widen;
    the pixel-shuffle tail conv keeps its 48 = 3*4*4 output channels
    (``upsampler``), and the 3-channel image input is untouched (3 is not
    in the width map). ESA's 16-channel pyramid stays (it runs on strided/
    pooled maps — cheap either way). Output-equivalent up to f32
    reassociation: every padded lane is zero through the whole graph
    (LReLU(0)=0; ESA gates multiply x=0).
    """
    widths = {46: target, 48: target}
    return pad_conv_channels(params, widths, keep_out=("upsampler",))
