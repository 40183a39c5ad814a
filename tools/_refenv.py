"""Shared setup for executing the read-only PyTorch reference on CPU.

Used by tools/make_goldens.py and tools/reconcile_complexity.py. Stubs the
reference's optional imports (torchvision, timm), forces CPU checkpoint
mapping, and neutralises GPU-only constructor quirks (AFDN's .cuda()).
"""

from __future__ import annotations

import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("NTIRE_REFERENCE", "/root/reference")


def setup_reference():
    """Import and return the reference test_demo module, CPU-runnable."""
    import torch

    # torchvision isn't installed and is only needed by an unused tensor2img
    # path in the reference utils; stub it so the import succeeds.
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_utils = types.ModuleType("torchvision.utils")
        tv_utils.make_grid = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub"))
        tv_transforms = types.ModuleType("torchvision.transforms")
        tv.utils = tv_utils
        tv.transforms = tv_transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv_utils
        sys.modules["torchvision.transforms"] = tv_transforms

    # team12's vendored Swin imports timm just for to_2tuple/trunc_normal_;
    # provide a minimal stub so HNCT loads without timm installed.
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")
        timm_layers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
        timm_layers.trunc_normal_ = lambda t, *a, **k: t
        timm_layers.DropPath = torch.nn.Identity  # eval-time no-op
        timm.models = timm_models
        timm_models.layers = timm_layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_layers

    # the reference mostly calls torch.load without map_location (GPU-pinned
    # checkpoints); force CPU mapping.
    _orig_load = torch.load

    def _cpu_load(*a, **k):
        k.setdefault("map_location", "cpu")
        return _orig_load(*a, **k)

    torch.load = _cpu_load

    # team15's AFDN calls .cuda() + a dummy 256^2 forward in its constructor
    # (AFDN.py:47-56); neutralise .cuda() so it runs on CPU-only hosts.
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self

    os.chdir(REFERENCE)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import test_demo  # reference harness (executed read-only)

    # team42's LAM_Module.forward calls .view on a non-contiguous tensor,
    # which newer torch rejects; make the input contiguous (same values).
    try:
        import models.team42_rlcsr as _t42

        _lam_orig = _t42.LAM_Module.forward
        _t42.LAM_Module.forward = lambda self, x: _lam_orig(self, x.contiguous())
    except Exception:
        pass

    return test_demo
