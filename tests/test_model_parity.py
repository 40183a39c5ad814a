"""End-to-end model parity: JAX zoo vs PyTorch reference goldens.

Goldens are produced by tools/make_goldens.py (torch CPU, reference
checkpoints). Each test ports the real checkpoint, runs the jitted NHWC
model, and requires the output to match the reference within a tolerance
that guarantees PSNR parity far below 0.01 dB.

Two golden families exist per model: the default 64x64 crop
(``model_NN.npz``) and odd non-square sizes (``model_NN_HxW.npz``,
e.g. 63x41 / 97x127) that exercise pad-to-multiple paths — Swin pad-to-8
(reference team12_hnct/SwinT.py:64-66), IMDTN flip-pad-to-6
(team09_imdtn/architecture.py:39-43), pixel-unshuffle blocking
(team19_imdeception.py:32-88), ESA bilinear resize on odd H/W — which a
square power-of-two input never triggers.
"""

import glob
import os

import jax
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
_goldens = sorted(glob.glob(os.path.join(GOLDEN_DIR, "model_*.npz")))


def _golden_stems():
    return [os.path.splitext(os.path.basename(p))[0] for p in _goldens]


@pytest.mark.parametrize("stem", _golden_stems() or [None])
def test_model_matches_reference(stem):
    if stem is None:
        pytest.skip("no goldens generated (run tools/make_goldens.py)")
    model_id = int(stem.split("_")[1])
    from ntire2022_esr_tpu.harness import registry

    try:
        spec = registry.get_spec(model_id)
    except KeyError:
        pytest.skip(f"model {model_id} not yet implemented in the TPU zoo")

    g = np.load(os.path.join(GOLDEN_DIR, f"{stem}.npz"))
    img, data_range, ref = g["input_u8"], float(g["data_range"]), g["output"]

    params = registry.load_params(spec)
    x = (img.astype(np.float32) / (255.0 / data_range))[None]
    out = np.asarray(jax.jit(spec.apply)(params, x))[0]

    assert out.shape == ref.shape, f"shape {out.shape} != reference {ref.shape}"
    # tolerance scales with data range; 1e-4 relative keeps PSNR delta << 0.01 dB
    tol = 2e-4 * data_range
    err = np.abs(out - ref).max()
    assert err < tol, f"{stem}: max abs err {err:.3e} >= {tol:.1e}"
