"""Declarative model registry.

Replaces the reference's 45-way if/elif ladder (test_demo.py:13-341) with
data: each zoo entry is a ``ModelSpec`` carrying the apply function, the
checkpoint + porting rules, the expected input data range, and the tile
size. ``build_model(model_id)`` reproduces select_model's 4-tuple contract
``(apply, name, data_range, tile)`` with params loaded from the npz weight
cache (or ported from the torch checkpoint on first use).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional, Sequence, Tuple

DEFAULT_ZOO_DIR = os.environ.get("NTIRE_TORCH_ZOO", "/root/reference/model_zoo")
DEFAULT_WEIGHTS_DIR = os.environ.get(
    "NTIRE_WEIGHTS", os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "weights")
)


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    model_id: int
    name: str                       # registry display name, "{id:02}_{NET}"
    apply: Callable                 # apply(params, x_nhwc) -> y_nhwc (x4)
    ckpt: str                       # torch checkpoint filename in the zoo dir
    data_range: float = 1.0
    tile: Optional[int] = None      # overlap-tile size (None = whole image)
    # tile-batch cap for the tiled path: NLFFC's x4-upscale-first design
    # multiplies per-tile activation memory 16x, so its chunks must be tiny
    max_tiles_per_call: int = 16
    unwrap: Optional[str] = "auto"
    linear_keys: Sequence[str] = ()
    conv_transpose_keys: Sequence[str] = ()
    raw_keys: Sequence[str] = ()
    drop_keys: Sequence[str] = ()
    # param-pytree transform applied after porting (reparam fold etc.)
    postprocess: Optional[Callable] = None
    # layout transform applied at LOAD time, after the npz cache (never
    # baked into the cached weights): e.g. block-diagonal densification of
    # grouped convs where the dense form measures faster on the MXU
    load_transform: Optional[Callable] = None
    # input spatial size must be a multiple of this (model pads internally
    # otherwise); harness uses it for static-shape bucketing decisions
    min_multiple: int = 1
    # H-slab spatial sharding (parallel/spatial.py) is exact only for models
    # whose every op is translation-invariant with bounded receptive field:
    # stride-1 convs, pointwise nonlinearities, channel splits/concats,
    # PixelShuffle, integer-scale-factor resizes. Anything with a pooling
    # grid, size-dependent resize (ESA's bilinear-back), global pooling
    # (CCA/CA), window/global attention, or FFT is NOT slab-decomposable —
    # spatial sharding must be refused for those (use dp batch / tile grid).
    slab_safe: bool = False
    # halo rows required for exact slab sharding (one-sided receptive field)
    halo: int = 32


_REGISTRY: Dict[int, ModelSpec] = {}


def register(spec: ModelSpec) -> ModelSpec:
    _REGISTRY[spec.model_id] = spec
    return spec


def get_spec(model_id: int) -> ModelSpec:
    _ensure_populated()
    if model_id not in _REGISTRY:
        raise KeyError(
            f"model_id {model_id} is not in the registry "
            f"(withheld submissions: 7, 21, 32, 41; available: {sorted(_REGISTRY)})"
        )
    return _REGISTRY[model_id]


def available_ids():
    _ensure_populated()
    return sorted(_REGISTRY)


def all_specs():
    """Every registered ModelSpec, ordered by model_id."""
    _ensure_populated()
    return [_REGISTRY[i] for i in sorted(_REGISTRY)]


def _ensure_populated() -> None:
    # zoo registration lives in models/zoo.py; import deferred to avoid cycles
    if not _REGISTRY:
        from ntire2022_esr_tpu.models import zoo  # noqa: F401


def weights_path(spec: ModelSpec, weights_dir: Optional[str] = None) -> str:
    d = weights_dir or DEFAULT_WEIGHTS_DIR
    return os.path.join(d, os.path.splitext(spec.ckpt)[0] + ".npz")


def load_params(spec: ModelSpec, weights_dir: Optional[str] = None,
                zoo_dir: Optional[str] = None, cache: bool = True):
    """Load the ported param pytree; port from torch on cache miss."""
    from ntire2022_esr_tpu import porter

    npz = weights_path(spec, weights_dir)
    if os.path.exists(npz):
        return porter.load_params(npz)
    ckpt = os.path.join(zoo_dir or DEFAULT_ZOO_DIR, spec.ckpt)
    sd = porter.read_torch_checkpoint(ckpt, unwrap=spec.unwrap)
    flat = porter.port_state_dict(
        sd,
        linear_keys=spec.linear_keys,
        conv_transpose_keys=spec.conv_transpose_keys,
        raw_keys=spec.raw_keys,
        drop_keys=spec.drop_keys,
    )
    tree = porter.nest(flat)
    if spec.postprocess is not None:
        tree = spec.postprocess(tree)
    if cache:
        os.makedirs(os.path.dirname(npz), exist_ok=True)
        porter.save_params(npz, tree)
    return tree


def build_model(model_id: int, weights_dir: Optional[str] = None,
                zoo_dir: Optional[str] = None, *,
                apply_load_transform: bool = True,
                ) -> Tuple[Callable, dict, str, float, Optional[int]]:
    """select_model contract: returns (apply, params, name, data_range, tile).

    ``apply_load_transform=False`` skips the spec's load-time param
    transform (e.g. IMDTN's grouped-conv densify) — for A/B probes and
    tests that need the stock param layout as their baseline arm.
    """
    spec = get_spec(model_id)
    params = load_params(spec, weights_dir, zoo_dir)
    if apply_load_transform and spec.load_transform is not None:
        params = spec.load_transform(params)
    if apply_load_transform:
        from ntire2022_esr_tpu import config

        if config.weights_int8():
            # the w8 serving tier (porter/quant.py): int8 weight storage,
            # dequantized at use; never baked into the npz cache
            from ntire2022_esr_tpu.porter.quant import quantize_params_int8

            params = quantize_params_int8(params)
    return spec.apply, params, spec.name, spec.data_range, spec.tile
