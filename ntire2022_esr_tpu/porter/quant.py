"""Per-channel int8 weight quantization (the "w8" serving tier).

Weights are stored int8 in HBM with one f32 scale per OUTPUT channel
(symmetric, scale = max|w[..., o]| / 127) and dequantized at use inside
the conv/linear op (ops/nn.py) in the active compute dtype. Activations
and accumulation keep the active mode — this tier changes WEIGHT storage
only, so its error is bounded by the per-channel quantization step and is
independent of image content scale.

Rationale (VERDICT r3 item 3): memory is a scored efficiency axis
(reference README.md:6-24) and the remaining sub-8x models are
bytes-bound; int8 weights halve weight-side traffic vs bf16 and cut the
resident param footprint 4x vs f32. Opt-in via NTIRE_W8=1 /
config.set_weights_int8(True); the measured speed/quality envelope lives
in docs/RUNTIME_TPU.md.

MeanShift-style constant convs (sub_mean/add_mean, reference
team11_aaln/aaln.py MeanShift) are never quantized: they carry exact
dataset statistics whose rounding would bias every pixel.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

SKIP_KEYS = ("sub_mean", "add_mean", "mean_shift")


def quantize_array_int8(w: np.ndarray):
    """Symmetric int8 with the finest broadcastable scale granularity:

    - 4-D conv weights (HWIO): one scale per (input, output) channel pair
      — a 9-tap group for 3x3 kernels. Measured on the zoo (CPU proxy):
      per-(cin,cout) lands at ~50 dB whole-model agreement where
      per-output-channel lands at 30-40 dB (quant noise compounds across
      deep conv chains). Scale storage adds 4/9 byte/tap on 3x3 —
      1.44 B/tap total vs f32's 4.
    - 2-D linear weights ((in, out)): per output column (a per-element
      scale would store the weight itself).

    Returns ``(w_i8, scale_f32)`` with scale broadcastable against w.
    """
    w = np.asarray(w, np.float32)
    if w.ndim == 4:
        amax = np.max(np.abs(w), axis=(0, 1), keepdims=True)  # (1,1,I,O)
    else:
        amax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = (amax / 127.0).astype(np.float32)
    safe = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(w / safe), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_params_int8(tree: Dict, skip: Sequence[str] = SKIP_KEYS) -> Dict:
    """Quantize every conv (4-D) and linear (2-D) weight in a ported param
    pytree to int8 + per-channel scale; biases, norms, tables stay f32.
    Subtrees whose key matches ``skip`` are left untouched."""
    def walk(node, name=""):
        if not isinstance(node, dict):
            return node
        if any(s in name for s in skip):
            return node
        out = {}
        for k, v in node.items():
            if (k == "weight" and hasattr(v, "ndim") and v.ndim in (2, 4)
                    and str(getattr(v, "dtype", "")) == "float32"):
                q, scale = quantize_array_int8(np.asarray(v))
                out["weight"] = q
                out["weight_scale"] = scale
            else:
                out[k] = walk(v, k) if isinstance(v, dict) else v
        return out

    return walk(tree)


def dequantize_params(tree: Dict) -> Dict:
    """Inverse walk (testing/inspection): int8 weight + scale -> f32."""
    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == "weight" and hasattr(v, "dtype") and str(v.dtype) == "int8":
                out["weight"] = np.asarray(v, np.float32) * np.asarray(
                    node["weight_scale"], np.float32)
            elif k == "weight_scale":
                continue
            else:
                out[k] = walk(v) if isinstance(v, dict) else v
        return out

    return walk(tree)
