#!/usr/bin/env python
"""Generate golden parity tensors from the PyTorch reference zoo.

Runs the reference's own select_model registry (read-only, torch CPU) on a
deterministic synthetic image and stores (input, output) pairs under
tests/goldens/. The JAX parity tests then check our TPU-native
reimplementations against these without needing torch or the reference at
test time.

Usage: python tools/make_goldens.py [id ...]   (default: all implemented)
"""

from __future__ import annotations

import argparse
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("NTIRE_REFERENCE", "/root/reference")
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")

# Default 64x64 synthetic LR input: large enough for every pooling/window
# chain. Odd non-square sizes (--sizes 63x41,97x127) additionally exercise
# pad-to-multiple paths (Swin pad-to-8, IMDTN flip-pad-to-6, pixel-unshuffle
# blocking, ESA bilinear on odd H/W) that never trigger at 64.
H = W = 64


def make_input(h: int, w: int) -> np.ndarray:
    """A natural-image crop (reference smoke fixture test.bmp).

    Uniform-noise inputs are far out of distribution for several nets
    (e.g. PRRN, team16) whose gated activations then explode to ~1e3 and
    amplify benign f32 conv-order differences chaotically; natural content
    keeps every model in its stable regime.
    """
    import cv2

    img = cv2.imread(os.path.join(REFERENCE, "utils", "test.bmp"), cv2.IMREAD_UNCHANGED)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    top = (img.shape[0] - h) // 2
    left = (img.shape[1] - w) // 2
    return img[top:top + h, left:left + w].copy()


def _port_random_init(model, ckpt_stem: str) -> None:
    """Port a random-initialised torch model's weights into weights/."""
    sys.path.insert(0, REPO)
    from ntire2022_esr_tpu import porter
    from ntire2022_esr_tpu.harness import registry

    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    flat = porter.port_state_dict(sd, linear_keys=(r".*",))
    out = os.path.join(registry.DEFAULT_WEIGHTS_DIR, ckpt_stem + ".npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    porter.save_params(out, porter.nest(flat))
    print(f"  ported random-init weights -> {out}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ids", nargs="*", type=int, default=None)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--sizes", type=str, default=None,
                    help="comma-separated HxW list (e.g. 63x41,97x127); files get a "
                         "_HxW suffix; default is one golden at --size (no suffix)")
    args = ap.parse_args(argv)

    if args.sizes:
        sizes = [tuple(int(v) for v in s.split("x")) for s in args.sizes.split(",")]
    else:
        sizes = [(args.size, args.size)]

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

    # the reference mostly calls torch.load without map_location (GPU-pinned
    # checkpoints); force CPU mapping.
    _orig_load = torch.load
    def _cpu_load(*a, **k):
        k.setdefault("map_location", "cpu")
        return _orig_load(*a, **k)
    torch.load = _cpu_load

    os.chdir(REFERENCE)
    sys.path.insert(0, REFERENCE)
    import test_demo  # reference harness (executed read-only for goldens)

    ids = args.ids
    if not ids:
        sys.path.insert(0, REPO)
        from ntire2022_esr_tpu.harness.registry import available_ids
        ids = available_ids()

    os.makedirs(GOLDEN_DIR, exist_ok=True)

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

    # team15's AFDN calls .cuda() + a dummy 256^2 forward in its constructor
    # (AFDN.py:47-56); neutralise .cuda() so it runs on CPU-only hosts.
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self

    # team42's LAM_Module.forward calls .view on a non-contiguous tensor,
    # which newer torch rejects; make the input contiguous (same values).
    try:
        import models.team42_rlcsr as _t42

        _lam_orig = _t42.LAM_Module.forward
        _t42.LAM_Module.forward = lambda self, x: _lam_orig(self, x.contiguous())
    except Exception:
        pass

    for model_id in ids:
        ns = types.SimpleNamespace(model_id=model_id)
        try:
            model, name, data_range, tile = test_demo.select_model(ns, torch.device("cpu"))
        except FileNotFoundError as e:
            if model_id == 12:
                # team12_hnct.pt is absent from the mirror: validate the
                # architecture against a seeded random init and port those
                # weights into the framework's npz store.
                from models.team12_hnct.HNCT import HNCT

                torch.manual_seed(0)
                model, name, data_range = HNCT(), "12_HNCT", 1.0
                _port_random_init(model, "team12_hnct")
            else:
                print(f"[{model_id}] SKIP (checkpoint missing: {e})")
                continue
        except Exception as e:  # e.g. AFDN's .cuda()-in-ctor on CPU-only hosts
            print(f"[{model_id}] SKIP (select_model failed: {e})")
            continue
        model = model.float().eval()
        for (h, w) in sizes:
            img = make_input(h, w)
            x = torch.from_numpy(img.transpose(2, 0, 1)[None].astype(np.float32) / (255.0 / data_range))
            try:
                with torch.no_grad():
                    y = model(x)
            except Exception as e:
                # a size the reference itself cannot run (shape constraint);
                # record nothing — the quirk policy replicates such limits
                print(f"[{model_id}] {name} @ {h}x{w}: reference forward failed ({e}); skipped")
                continue
            out = y.numpy()[0].transpose(1, 2, 0)  # HWC
            # default invocation (no --sizes) refreshes the UNsuffixed golden
            # at whatever --size says, per the --sizes help text
            suffix = "" if not args.sizes else f"_{h}x{w}"
            path = os.path.join(GOLDEN_DIR, f"model_{model_id:02}{suffix}.npz")
            np.savez_compressed(
                path, input_u8=img, data_range=np.float32(data_range),
                output=out.astype(np.float32), name=np.bytes_(name),
            )
            print(f"[{model_id}] {name} @ {h}x{w}: out {out.shape}, "
                  f"range [{out.min():.3f}, {out.max():.3f}] -> {path}")


if __name__ == "__main__":
    main()
