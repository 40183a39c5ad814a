"""State-dict -> NHWC/HWIO parameter pytree conversion.

Layout rules applied per tensor:
- conv weights  (O, I/g, kh, kw) -> (kh, kw, I/g, O)       [default for ndim==4]
- linear weights (O, I)          -> (I, O)                  [keys matched by regex]
- conv-transpose weights (I, O/g, kh, kw) -> flipped (kh, kw, I, O/g) [by regex]
- everything else verbatim (biases, norms, PReLU slopes, position tables).

Weight-norm (``weight_g``/``weight_v`` pairs, used by reference models 23,
36, 42) is folded into a plain ``weight`` before layout conversion:
w = g * v / ||v||_{(1,2,3)}.

The nested pytree mirrors the torch module hierarchy: keys split on '.',
so ``B1.c1_d.weight`` lands at ``params['B1']['c1_d']['weight']``.
"""

from __future__ import annotations

import re
from collections import OrderedDict
from typing import Dict, Iterable, Mapping, Sequence

import numpy as np


def fold_weight_norm(sd: Mapping[str, np.ndarray]) -> "OrderedDict[str, np.ndarray]":
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for k, v in sd.items():
        if k.endswith("weight_g"):
            base = k[: -len("weight_g")]
            g = v
            wv = sd[base + "weight_v"]
            axes = tuple(range(1, wv.ndim))
            norm = np.sqrt(np.sum(wv.astype(np.float64) ** 2, axis=axes, keepdims=True))
            out[base + "weight"] = (g.astype(np.float64) * wv / norm).astype(wv.dtype)
        elif k.endswith("weight_v"):
            continue
        else:
            out[k] = v
    return out


def _matches(key: str, patterns: Iterable[str]) -> bool:
    return any(re.search(p, key) for p in patterns)


def port_state_dict(
    sd: Mapping[str, np.ndarray],
    *,
    linear_keys: Sequence[str] = (),
    conv_transpose_keys: Sequence[str] = (),
    raw_keys: Sequence[str] = (),
    drop_keys: Sequence[str] = (),
) -> "OrderedDict[str, np.ndarray]":
    """Convert a flat torch state dict to flat TPU-layout arrays.

    ``linear_keys`` / ``conv_transpose_keys`` / ``raw_keys`` are regex
    patterns matched against full key names; ``raw_keys`` suppresses the
    default 4-D conv transpose (e.g. for attention bias tables stored 4-D).
    """
    sd = fold_weight_norm(sd)
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    # non-parameter buffers our runtime recomputes statically (Swin shift
    # masks and relative-position index tables)
    default_drops = ("attn_mask$", "relative_position_index$")
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or _matches(k, default_drops) or _matches(k, drop_keys):
            continue
        arr = np.asarray(v)
        if _matches(k, raw_keys):
            pass
        elif _matches(k, conv_transpose_keys) and arr.ndim == 4:
            arr = np.flip(arr.transpose(2, 3, 0, 1), axis=(0, 1)).copy()
        elif _matches(k, linear_keys) and arr.ndim == 2 and k.endswith("weight"):
            arr = arr.T.copy()
        elif arr.ndim == 4 and k.endswith("weight"):
            arr = arr.transpose(2, 3, 1, 0).copy()
        out[k] = np.ascontiguousarray(arr, dtype=arr.dtype)
    return out


def nest(flat: Mapping[str, np.ndarray]) -> Dict:
    """Split dotted keys into a nested dict pytree."""
    tree: Dict = {}
    for k, v in flat.items():
        parts = k.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def flatten(tree: Mapping, prefix: str = "") -> "OrderedDict[str, np.ndarray]":
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, Mapping):
            out.update(flatten(v, key))
        else:
            out[key] = v
    return out


def save_params(path: str, tree: Mapping) -> None:
    """Cache a ported param pytree as compressed npz (torch-free format)."""
    np.savez_compressed(path, **flatten(tree))


def load_params(path: str) -> Dict:
    with np.load(path) as z:
        return nest({k: z[k] for k in z.files})


def save_params_orbax(path: str, tree: Mapping) -> None:
    """Checkpoint a param pytree with orbax (production checkpoint format)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, dict(tree))
    ckptr.wait_until_finished()


def load_params_orbax(path: str) -> Dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)
