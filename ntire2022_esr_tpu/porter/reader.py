"""PyTorch checkpoint reading (host-side, CPU torch only).

Handles every wrapper format shipped in the reference model zoo
(test_demo.py:124-128, :157, :171, :216, :231-235, :294):

- plain ``state_dict``
- wrapped dicts under ``"params"`` / ``"net"`` / ``"model_state_dict"``
- DataParallel ``module.``-prefixed keys

Torch is an optional, porter-only dependency: the TPU runtime never imports
it. Ported weights are cached as .npz and loaded torch-free thereafter.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional

import numpy as np

_WRAPPER_KEYS = ("params", "net", "model_state_dict", "state_dict")


def read_torch_checkpoint(path: str, unwrap: Optional[str] = "auto") -> "OrderedDict[str, np.ndarray]":
    """Load a .pth/.pt checkpoint into an ordered dict of float numpy arrays."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if unwrap == "auto":
        if isinstance(obj, dict) and not all(hasattr(v, "numpy") for v in obj.values()):
            for k in _WRAPPER_KEYS:
                if k in obj:
                    obj = obj[k]
                    break
    elif unwrap:
        obj = obj[unwrap]

    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if not hasattr(v, "numpy"):
            continue  # skip non-tensor entries (e.g. step counters as python ints)
        arr = v.detach().cpu().numpy()
        out[k] = arr
    return out
