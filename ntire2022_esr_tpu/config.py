"""Global numerics configuration.

Two modes matter for this framework:

- ``parity``: float32 params/activations, HIGHEST matmul/conv precision.
  Required to match the PyTorch reference PSNR within 0.01 dB
  (reference protocol: fp32 eval, see /root/reference/test_demo.py:336-340).
- ``fast``: bfloat16 compute with float32 accumulation, DEFAULT precision.
  The TPU MXU runs bf16 natively; use for throughput benchmarking once a
  model has been validated for PSNR tolerance in bf16.

The active mode is process-global. Jitted functions capture the mode at
trace time, so switch modes *before* building/jitting an evaluator.
"""

from __future__ import annotations

import dataclasses
import os
from contextlib import contextmanager

import jax
import jax.numpy as jnp

# Persistent compilation cache: XLA/Mosaic compiles through some backends
# (e.g. a remote-compile tunnel) can take minutes per executable; caching
# them on disk amortises that across processes. Opt out with
# NTIRE_COMPILE_CACHE=0, redirect with NTIRE_COMPILE_CACHE_DIR.
if os.environ.get("NTIRE_COMPILE_CACHE", "1") != "0":
    try:
        _cache_dir = os.environ.get(
            "NTIRE_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "ntire2022_esr_tpu", "jax_cache"),
        )
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache


@dataclasses.dataclass
class Numerics:
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    conv_precision: jax.lax.Precision = jax.lax.Precision.HIGHEST
    matmul_precision: jax.lax.Precision = jax.lax.Precision.HIGHEST
    # When set, conv/matmul OUTPUTS are stored in this dtype while the
    # contraction itself runs in compute_dtype: the tensors that live in
    # HBM between layers are 2-byte, but weights and accumulation keep
    # f32 fidelity. None = store in the compute dtype (all other modes).
    storage_dtype: "jnp.dtype | None" = None


_MODES = {
    # f32 everywhere, 6-pass MXU: bit-close to the PyTorch reference.
    "parity": Numerics(),
    # f32 everywhere, 3-pass MXU (bf16x3): f32-grade accuracy at ~2x the
    # HIGHEST throughput.
    "high": Numerics(
        conv_precision=jax.lax.Precision.HIGH,
        matmul_precision=jax.lax.Precision.HIGH,
    ),
    # f32 activations/params, single-pass bf16 MXU multiplies with f32
    # accumulation: ~MXU-speed with f32-accumulated error (PSNR-safe on
    # natural images; validate per model).
    "mixed": Numerics(
        conv_precision=jax.lax.Precision.DEFAULT,
        matmul_precision=jax.lax.Precision.DEFAULT,
    ),
    # bf16 end-to-end (activations too): fastest + half the HBM traffic.
    "fast": Numerics(
        compute_dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16,
        conv_precision=jax.lax.Precision.DEFAULT,
        matmul_precision=jax.lax.Precision.DEFAULT,
    ),
    # f16 end-to-end: the same 2-byte HBM traffic as `fast` but with 10
    # mantissa bits instead of 7 (~18 dB better storage agreement). The
    # MXU has no native f16 path, so the multiplies are upcast — HIGH
    # keeps them at bf16x3 (f32-grade) so the tier's error is the f16
    # STORAGE rounding, not a 1-pass bf16 multiply (which would erase the
    # mantissa advantage). On the HBM-bound graphs this tier targets
    # (x4-resolution tails) the extra passes are hidden behind the bytes.
    # Used by the HR-tail f16 scope; selectable as a full mode for A/B.
    "fast16": Numerics(
        compute_dtype=jnp.float16,
        param_dtype=jnp.float16,
        conv_precision=jax.lax.Precision.HIGH,
        matmul_precision=jax.lax.Precision.HIGH,
    ),
    # bf16 activation STORAGE with f32 weights and f32-grade (bf16x3)
    # contractions: the inter-layer tensors that dominate the HBM-bound
    # zoo's traffic are 2-byte like `fast`, but the tier's only error
    # source is the per-layer bf16 rounding of activations — the weight
    # rounding and 1-pass multiplies that `fast` adds (and that shift
    # several models -0.005..-0.009 dB at benchmark level,
    # numerics_delta_r4.json) are removed. The upcast/downcast converts
    # fuse into the conv prologue/epilogue; the extra MXU passes are free
    # on graphs whose roofline bound is HBM (roofline_r5.json: all 42).
    "fasthi": Numerics(
        conv_precision=jax.lax.Precision.HIGH,
        matmul_precision=jax.lax.Precision.HIGH,
        storage_dtype=jnp.bfloat16,
    ),
    # f16 activation STORAGE, same f32 weights + HIGH contractions: the
    # same 2-byte traffic with 10 mantissa bits instead of 7 — for models
    # whose fasthi benchmark delta lands just outside the gate (the error
    # is pure activation-storage rounding, so 3 extra bits cut it ~8x).
    # Unlike `fast16` the multiplies/reductions stay f32 (no guard clamps
    # inside fusions — only the store itself saturates via cast_compute).
    "fasthi16": Numerics(
        conv_precision=jax.lax.Precision.HIGH,
        matmul_precision=jax.lax.Precision.HIGH,
        storage_dtype=jnp.float16,
    ),
}

_active = _MODES["parity"]
_active_name = "parity"


def numerics() -> Numerics:
    return _active


def set_mode(mode: str) -> None:
    global _active, _active_name
    if mode not in _MODES:
        raise ValueError(f"unknown numerics mode: {mode!r} (have {sorted(_MODES)})")
    _active = _MODES[mode]
    _active_name = mode


def mode() -> str:
    return _active_name


# ---------------------------------------------------------------------------
# Layout experiment: lower grouped convs (1 < groups < cin) as dense convs
# with block-diagonal weights. A groups=g conv contracts only cin/g channels
# per output — at zoo widths (e.g. 16 of 64) that underfills the MXU's
# contraction dimension; the dense form does g x the MACs on full tiles,
# which wins when the op is layout-bound. Output-exact (off-block weights
# are zero). Default off; enable per measurement (NTIRE_DENSIFY_GROUPED=1
# or set_densify_grouped). Depthwise convs (cin/g == 1) are never densified.
# ---------------------------------------------------------------------------

_densify_grouped = os.environ.get("NTIRE_DENSIFY_GROUPED", "0") == "1"


# int8 weight storage tier ("w8", porter/quant.py): per-output-channel
# symmetric int8 weights dequantized at use in the active compute dtype.
# Weight-storage-only — activations/accumulation keep the active mode. 4x
# smaller resident params than f32 (memory is a scored axis,
# reference README.md:6-24); quality per model is measured, not assumed
# (docs/RUNTIME_TPU.md). Opt-in: NTIRE_W8=1 or set_weights_int8(True) —
# build_model quantizes at load when on.

_weights_int8 = os.environ.get("NTIRE_W8", "0") == "1"


def weights_int8() -> bool:
    return _weights_int8


def set_weights_int8(value: bool) -> None:
    global _weights_int8
    _weights_int8 = bool(value)


def densify_grouped() -> bool:
    return _densify_grouped


def set_densify_grouped(value: bool) -> None:
    global _densify_grouped
    _densify_grouped = bool(value)


# Fused nearest-x2-upsample + 3x3 conv lowering (ops/fused.py): exact up
# to f32 reassociation (parity-tap weights summed once, host-side), packs
# 4x output lanes and skips the upsampled intermediate. Tri-state:
# unset = AUTO (on in every mode except parity — parity keeps the
# byte-stable reference-shaped graph, matching the framework's contract
# that only parity carries the strict bit-level claim); NTIRE_FUSE_
# UPSAMPLE_CONV=0/1 or set_fuse_upsample_conv(bool) forces it.

_fuse_upsample_conv: "bool | None" = (
    None if "NTIRE_FUSE_UPSAMPLE_CONV" not in os.environ
    else os.environ["NTIRE_FUSE_UPSAMPLE_CONV"] == "1")


def fuse_upsample_conv() -> bool:
    if _fuse_upsample_conv is None:
        return _active_name != "parity"
    return _fuse_upsample_conv


def set_fuse_upsample_conv(value: "bool | None") -> None:
    global _fuse_upsample_conv
    _fuse_upsample_conv = value if value is None else bool(value)


# Parallel sibling convs (RFDN's 1x1-distill + 3x3-residual pairs, NLFFC's
# local/global branch pair) merged into one conv with concatenated output
# lanes (ops/fused.parallel_conv_pair). Tri-state like fuse_upsample_conv,
# but AUTO is per-site: on-chip A/B (results/protocol/layout_probes_r3.json)
# measured the NLFFC site as a win (362 -> 341 ms/img) and the RFDN rfdb
# site as a REGRESSION (2.78 -> 3.61 ms at batch 128 — the embedded-1x1
# kernel turns a 1x1 into a 3x3's MACs on wide lanes), so AUTO enables
# only the measured-win sites; NTIRE_FUSE_PARALLEL_BRANCHES=0/1 or
# set_fuse_parallel_branches(bool) forces all sites either way.

_fuse_parallel_branches: "bool | None" = (
    None if "NTIRE_FUSE_PARALLEL_BRANCHES" not in os.environ
    else os.environ["NTIRE_FUSE_PARALLEL_BRANCHES"] == "1")

_BRANCH_FUSE_AUTO_SITES = frozenset({"nlffc"})


def fuse_parallel_branches(site: str = "nlffc") -> bool:
    if _fuse_parallel_branches is None:
        return _active_name != "parity" and site in _BRANCH_FUSE_AUTO_SITES
    return _fuse_parallel_branches


def set_fuse_parallel_branches(value: "bool | None") -> None:
    global _fuse_parallel_branches
    _fuse_parallel_branches = value if value is None else bool(value)


# Repeated identical blocks (SCET's 16 SCPA, LWFANet's 10 LWFA, MobileSR's
# 5 transformer+resblock pairs, m_RFDN's 4 m_RFDB) run as ONE lax.scan
# over stacked params (models/blocks.scan_chain) instead of an unrolled
# Python loop: same HLO per step, but the block body is compiled once, so
# the executable stays near constant size in the block count.
# MEASURED NEGATIVE for AUTO (results/protocol/layout_probes_r3.json,
# docs/RUNTIME_TPU.md ledger): on-chip the scanned graphs are speed-
# neutral to ~1-4% slower (SCET 12.76->12.93, LWFANet 43.01->43.32,
# m_RFDN 28.08->29.14, MobileSR 31.31->30.95 ms/img) and do NOT lift the
# remote-compile batch ceiling (every next-step batch still 500s — the
# ceiling tracks tensor/batch bytes, not HLO op count). Kept opt-in as a
# compile-time/compile-size tool: NTIRE_SCAN_BLOCKS=0/1 or
# set_scan_blocks(bool) forces all sites; AUTO is off.

_scan_blocks: "bool | None" = (
    None if "NTIRE_SCAN_BLOCKS" not in os.environ
    else os.environ["NTIRE_SCAN_BLOCKS"] == "1")

_SCAN_AUTO_SITES = frozenset()


def scan_blocks(site: str) -> bool:
    if _scan_blocks is None:
        return _active_name != "parity" and site in _SCAN_AUTO_SITES
    return _scan_blocks


def set_scan_blocks(value: "bool | None") -> None:
    global _scan_blocks
    _scan_blocks = value if value is None else bool(value)


# Window-attention score storage dtype (ops/attention.multi_head_attention).
# The materialized (windows, heads, N, N) logits/probs tensors are the
# measured HBM bottleneck of the window-attention models (MobileSR
# ablation: ~13 GB of score round-trips per batch-16 forward,
# docs/RUNTIME_TPU.md) — XLA cannot avoid materializing across the
# matmul/softmax/matmul boundary. Storing them in bf16 halves that
# traffic; the converts fuse into the dot epilogue / softmax fusion, and
# softmax itself still reduces in f32.
#   "off"    — f32 storage (default; the parity/high claim path)
#   "probs"  — softmax output stored bf16 (logits stay f32). MEASURED
#              SLOWER than off on all three window-attention models (the
#              lone bf16 probs tensor breaks XLA's softmax fusion into an
#              extra convert kernel) — kept for A/B only.
#   "scores" — logits AND probs bf16: on-chip wins 13.4% on MobileSR,
#              16.2% on HNCT, 6.1% on IMDTN (layout_probes_r3.json).
#   "scores_f16" — logits AND probs f16: identical bytes, 3 more mantissa
#              bits (for sites whose bf16 between-mode PSNR misses the
#              68.5 dB AUTO floor); the probs x v dot runs on f16 inputs
#              (XLA upcasts — no native f16 MXU pass).
# AUTO is per-site like the other graph transforms: the measured-best
# variant outside parity for the sites whose between-mode PSNR stays
# at/above the zoo-wide high-mode floor of 68.5 dB (mobilesr 68.9,
# hnct 77.0 with "scores"); imdtn (66.7 dB bf16) stays opt-in pending the
# f16 measurement. NTIRE_ATTN_BF16=off|probs|scores|scores_f16 or
# set_attn_bf16(str) forces all sites; None/unset = AUTO.

_ATTN_VALUES = ("off", "probs", "scores", "scores_f16")

_attn_bf16: "str | None" = os.environ.get("NTIRE_ATTN_BF16") or None
if _attn_bf16 is not None and _attn_bf16 not in _ATTN_VALUES:
    raise ValueError(f"NTIRE_ATTN_BF16 must be one of {_ATTN_VALUES}, got {_attn_bf16!r}")

# Round-4 gate: benchmark-level PSNR shift (tools/validate_numerics.py
# --data_dir; results/protocol/numerics_delta_r4.json). imdtn "scores"
# measured -0.0001 dB benchmark shift (the 66.7 dB between-mode proxy
# under-rated it) and is the fastest variant (28.53 vs 29.88 scores_f16
# vs 30.38 off ms/img) -> AUTO.
_ATTN_BF16_AUTO_SITES: "dict[str, str]" = {
    "mobilesr": "scores", "hnct": "scores", "imdtn": "scores"}


def attn_bf16(site: str = "mha") -> str:
    if _attn_bf16 is None:
        if _active_name != "parity":
            return _ATTN_BF16_AUTO_SITES.get(site, "off")
        return "off"
    return _attn_bf16


def set_attn_bf16(value: "str | None") -> None:
    if value is not None and value not in _ATTN_VALUES:
        raise ValueError(f"attn_bf16 must be one of {_ATTN_VALUES} or None, got {value!r}")
    global _attn_bf16
    _attn_bf16 = value


def attn_bf16_override() -> "str | None":
    """The raw forced value (env/setter), None when AUTO — so tools can
    snapshot and restore the process state instead of clobbering an
    NTIRE_ATTN_BF16 opt-in with set_attn_bf16(None)."""
    return _attn_bf16


# HR-tail reduced-precision storage: run a model's full-resolution tail
# (the x4-upsampled convs that dominate the HBM-bound models' time in f32
# modes) under a 2-byte numerics tier while the body keeps the active
# mode. Scoped at trace time via hr_tail_scope() around the tail section;
# the model casts the result back to f32. Two tiers:
#   "bf16" — fast-mode numerics for the tail (measured -15..-37% ms/img,
#            55-65 dB between-mode: mixed-tier quality, below the 68.5 dB
#            AUTO floor -> opt-in only).
#   "f16"  — fast16-mode: identical bytes, 3 more mantissa bits.
# Force with NTIRE_HR_TAIL=off|bf16|f16 (or the legacy NTIRE_HR_TAIL_BF16=
# 0/1) / set_hr_tail(); unset = AUTO per site.

_HR_TAIL_VALUES = ("off", "bf16", "f16")


def _hr_tail_from_env() -> "str | None":
    v = os.environ.get("NTIRE_HR_TAIL")
    if v is not None:
        if v not in _HR_TAIL_VALUES:
            raise ValueError(f"NTIRE_HR_TAIL must be one of {_HR_TAIL_VALUES}, got {v!r}")
        return v
    legacy = os.environ.get("NTIRE_HR_TAIL_BF16")
    if legacy is not None:
        return "bf16" if legacy == "1" else "off"
    return None


_hr_tail: "str | None" = _hr_tail_from_env()

# site -> tier enabled by AUTO outside parity mode. Round-4 gate: the
# BENCHMARK-level PSNR shift measured by tools/validate_numerics.py
# --data_dir on full-size surrogate protocol images (the between-mode
# proxy under-rated these tiers by design — 55-65 dB proxy == +-0.001 dB
# actual benchmark shift). Measured (results/protocol/numerics_delta_r4):
# hr-tail bf16 shifts 33/27/28/20 by +0.0010/-0.0010/-0.0000/-0.0003 dB —
# inside the high-mode <=0.005 dB claim -> AUTO. The f16 tail variant is
# equally accurate but ~1.4-1.6x SLOWER than bf16 (no native f16 MXU
# pass; hr_tail_f16_r4.json) — stays opt-in for A/B only.
_HR_TAIL_AUTO_SITES: "dict[str, str]" = {
    "m_rfdn": "bf16",
    "lwfanet": "bf16",
    "nasnetbn": "bf16",
    "mobilesr": "bf16",
}


def hr_tail(site: str) -> str:
    """Active HR-tail tier for ``site``: "off", "bf16" or "f16"."""
    if _hr_tail is None:
        # AUTO only upgrades f32-activation modes (high/mixed): in
        # fast/fast16 (2-byte compute) and fasthi (2-byte storage) the
        # tail is already 2-byte and the published whole-model envelopes
        # keep their pre-knob graphs (same rationale as the attn_bf16
        # f32-only guard in ops/attention.py)
        if (_active_name == "parity" or _active.compute_dtype != jnp.float32
                or _active.storage_dtype is not None):
            return "off"
        return _HR_TAIL_AUTO_SITES.get(site, "off")
    return _hr_tail


def set_hr_tail(value: "str | bool | None") -> None:
    """Force the HR-tail tier for all sites; None restores AUTO.
    Accepts the legacy booleans (True = "bf16", False = "off")."""
    global _hr_tail
    if isinstance(value, bool):
        value = "bf16" if value else "off"
    if value is not None and value not in _HR_TAIL_VALUES:
        raise ValueError(f"hr_tail must be one of {_HR_TAIL_VALUES} or None, got {value!r}")
    _hr_tail = value


def hr_tail_override() -> "str | None":
    """Raw forced value (env/setter), None when AUTO (see attn_bf16_override)."""
    return _hr_tail


# Legacy boolean API (pre-f16); kept for existing tools/tests.
def hr_tail_bf16(site: str) -> bool:
    return hr_tail(site) == "bf16"


def set_hr_tail_bf16(value: "bool | None") -> None:
    set_hr_tail(value)


_HR_TAIL_MODE = {"bf16": "fast", "f16": "fast16"}


@contextmanager
def hr_tail_scope(site: str):
    """Trace-time scope: 2-byte-tier numerics for a model's HR tail when
    hr_tail(site) is on, otherwise a no-op. Yields the active tier name
    ("" when off — falsy, so callers can gate the f32 cast-back on it);
    restores the active mode (name included) on exit."""
    tier = hr_tail(site)
    if tier == "off":
        yield ""
        return
    prev = mode()
    set_mode(_HR_TAIL_MODE[tier])
    try:
        yield tier
    finally:
        set_mode(prev)


@contextmanager
def numerics_mode(mode_name: str):
    prev = mode()
    set_mode(mode_name)
    try:
        yield
    finally:
        set_mode(prev)
