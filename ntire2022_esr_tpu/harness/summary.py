"""Model complexity report from lowered StableHLO (TPU-native model_summary).

The reference measures FLOPs / #activations / #Conv2d by monkey-patching
forward hooks onto torch modules (utils/model_summary.py:27-64, :230-294).
The XLA-native equivalent is structural analysis of the *lowered* program:
every ``lax.conv_general_dilated`` appears as one ``stablehlo.convolution``
op (pre-fusion), so counting them and their shapes reproduces the
measured-by-execution numbers:

- FLOPs  = sum over convolutions of kh*kw*(I/g)*O*H*W MACs (the challenge
  counts multiply-accumulates, README.md:16-22) + dot_general MACs for
  linear/attention layers.
- #Acts  = sum of convolution output numels (get_model_activation:48-64).
- #Conv  = number of convolution ops.
- #Params = pytree leaf size sum.

Note: the separable-matmul resizes in ESA blocks appear as dot_generals
here but are invisible to the torch hook counter; they add well under 0.1%
on the zoo models.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_TENSOR_RE = re.compile(r"tensor<([0-9x]+)x[a-z0-9]+>")
_CONV_RE = re.compile(
    r"stablehlo\.convolution.*?:\s*\(tensor<([0-9x]+)x[a-z0-9]+>,\s*tensor<([0-9x]+)x[a-z0-9]+>\)\s*->\s*tensor<([0-9x]+)x[a-z0-9]+>"
)
_DOT_RE = re.compile(
    r"stablehlo\.dot_general.*?contracting_dims\s*=\s*\[([0-9, ]*)\]\s*x\s*\[([0-9, ]*)\].*?:\s*\(tensor<([0-9x]+)x[a-z0-9]+>,\s*tensor<([0-9x]+)x[a-z0-9]+>\)\s*->\s*tensor<([0-9x]+)x[a-z0-9]+>"
)


def _dims(s: str) -> Tuple[int, ...]:
    return tuple(int(d) for d in s.split("x"))


def analyze_stablehlo(text: str) -> Dict[str, float]:
    conv_macs = 0
    conv_acts = 0
    num_conv = 0
    for m in _CONV_RE.finditer(text):
        _, kshape, oshape = _dims(m.group(1)), _dims(m.group(2)), _dims(m.group(3))
        # NHWC/HWIO lowering: kernel (kh, kw, I/g, O), output (N, H, W, O)
        kh, kw, ipg, oc = kshape
        n, h, w, _ = oshape
        conv_macs += kh * kw * ipg * oc * h * w * n
        conv_acts += int(np.prod(oshape))
        num_conv += 1
    dot_macs = 0
    for m in _DOT_RE.finditer(text):
        lc = [int(x) for x in m.group(1).split(",") if x.strip()]
        lshape = _dims(m.group(3))
        oshape = _dims(m.group(5))
        k = int(np.prod([lshape[i] for i in lc])) if lc else 1
        dot_macs += int(np.prod(oshape)) * k
    return {
        "conv_macs": conv_macs,
        "dot_macs": dot_macs,
        "flops": conv_macs + dot_macs,
        "activations": conv_acts,
        "num_conv": num_conv,
    }


# Weight-norm g-vector sizes the porter folds away (g*v/||v|| -> one
# weight). The published table counts BOTH g and v; reproduce its numbers
# with convention="reference". Counted from the reference checkpoints
# (sum of *.weight_g sizes): team23_mdan.pt 15120 (372 normed convs),
# team36_rfesr.pt 1152 (36), team42_rlcsr.pt 1824 (96).
WEIGHT_NORM_G_PARAMS = {"23_MDAN": 15120, "36_RFESR": 1152, "42_RLCSR": 1824}


def count_params(params, convention: str = "deploy",
                 model_name: str = "") -> int:
    """Trainable-parameter count (torch ``model.parameters()`` semantics):
    BatchNorm running stats are buffers and excluded.

    ``convention="deploy"`` (default) counts the params the framework
    actually stores — for weight-normed checkpoints (23, 36, 42) the
    porter folds g*v/||v|| into one weight, so counts are lower than the
    published table by the g vectors. ``convention="reference"`` adds the
    folded g sizes back (``WEIGHT_NORM_G_PARAMS``) so a published-table
    comparison matches; int8-quantized weights count their scales as the
    deploy convention's extra params."""
    from ntire2022_esr_tpu.porter.convert import flatten

    n = sum(
        int(np.prod(np.shape(v)))
        for k, v in flatten(params).items()
        if not (k.endswith("running_mean") or k.endswith("running_var"))
    )
    if convention == "reference":
        n += WEIGHT_NORM_G_PARAMS.get(model_name, 0)
    elif convention != "deploy":
        raise ValueError(f"convention must be 'deploy' or 'reference', got {convention!r}")
    return n


def model_complexity(apply: Callable, params, input_hw: Tuple[int, int] = (256, 256),
                     params_convention: str = "deploy",
                     model_name: str = "") -> Dict[str, float]:
    """Challenge-style complexity report on a (1, H, W, 3) input.

    Returns activations [M], num_conv, flops [G], num_parameters [M] —
    the exact fields results.json records (test_demo.py:522-535).
    ``params_convention="reference"`` reproduces the published #Params for
    weight-normed models (see count_params).
    """
    h, w = input_hw
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    lowered = jax.jit(apply).lower(params, x)
    stats = analyze_stablehlo(lowered.as_text())
    return {
        "activations": stats["activations"] / 1e6,
        "num_conv": int(stats["num_conv"]),
        "flops": stats["flops"] / 1e9,
        "num_parameters": count_params(params, params_convention, model_name) / 1e6,
    }


def compiled_memory_mb(apply: Callable, params, input_hw: Tuple[int, int] = (256, 256)) -> float:
    """Peak device memory of the compiled executable, in MB (XLA
    memory_analysis: temp + argument + output buffers).

    The challenge scores ``torch.cuda.max_memory_allocated`` during val
    (test_demo.py:467-475). On backends without runtime memory_stats (the
    tunnelled axon device reports none), this static analysis of the
    compiled program at the scoring shape is the honest equivalent: it is
    what the device must actually hold to run the forward.
    """
    h, w = input_hw
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    try:
        compiled = jax.jit(apply).lower(params, x).compile()
        ma = compiled.memory_analysis()
        if ma is None:
            return 0.0
        total = (getattr(ma, "temp_size_in_bytes", 0)
                 + getattr(ma, "argument_size_in_bytes", 0)
                 + getattr(ma, "output_size_in_bytes", 0)
                 - getattr(ma, "alias_size_in_bytes", 0))
        return total / 1024**2
    except Exception:
        return 0.0


def compiled_cost(apply: Callable, params, input_hw: Tuple[int, int] = (256, 256)) -> Dict[str, float]:
    """Post-optimization XLA cost analysis (what the compiler will execute)."""
    h, w = input_hw
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    compiled = jax.jit(apply).lower(params, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return dict(ca) if ca else {}


_PASSTHROUGH = {
    # primitives whose output is "the same tensor" for attribution purposes:
    # a weight flowing through these still names its source param leaf
    "convert_element_type", "transpose", "reshape", "broadcast_in_dim",
    "copy", "squeeze", "rev", "stop_gradient",
}


def per_layer_macs(apply: Callable, params, input_hw: Tuple[int, int] = (256, 256)):
    """Per-op MAC attribution with module-path labels (jaxpr analysis).

    The reference's print_model_with_flops (utils/model_summary.py:122-157)
    attributes FLOPs to *named torch modules*. Our param pytrees mirror the
    torch module names (porter convention), so each conv / dot_general in
    the traced jaxpr is attributed to the param leaf feeding its weight
    operand — giving rows like ``B1.c1_r.weight`` instead of anonymous
    shapes, and covering linear/attention matmuls the hook counter misses.

    Returns a list of (macs, label, kind) sorted by MACs descending.
    """
    h, w = input_hw
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    leaves_with_path, _ = jax.tree_util.tree_flatten_with_path(params)
    paths = [jax.tree_util.keystr(kp).lstrip("[.'").replace("']['", ".").rstrip("']")
             for kp, _ in leaves_with_path]
    jaxpr = jax.make_jaxpr(apply)(params, x)
    names = {}
    for var, path in zip(jaxpr.jaxpr.invars[:len(paths)], paths):
        names[var] = path

    def _get(v):
        try:
            return names.get(v)
        except TypeError:  # Literal operands are unhashable
            return None

    def _name(v) -> str:
        return _get(v) or "<activation>"

    rows = []
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim in _PASSTHROUGH and eqn.invars:
            try:
                if eqn.invars[0] in names:
                    names[eqn.outvars[0]] = names[eqn.invars[0]]
            except TypeError:
                pass  # Literal operands are unhashable / unnamed
        elif prim == "conv_general_dilated":
            lhsv, rhsv = eqn.invars[0], eqn.invars[1]
            dn = eqn.params["dimension_numbers"]
            rhs_shape = rhsv.aval.shape
            out_shape = eqn.outvars[0].aval.shape
            spatial = [rhs_shape[i] for i in dn.rhs_spec[2:]]
            ipg = rhs_shape[dn.rhs_spec[1]]
            macs = int(np.prod(out_shape)) * int(np.prod(spatial)) * ipg
            kh = spatial[0] if spatial else 1
            kw = spatial[1] if len(spatial) > 1 else 1
            oc = rhs_shape[dn.rhs_spec[0]]
            label = _name(rhsv)
            rows.append((macs, f"{label}  (conv {kh}x{kw} x{ipg}->{oc})", "conv"))
        elif prim == "dot_general":
            lhsv, rhsv = eqn.invars[0], eqn.invars[1]
            (lc, rc), _ = eqn.params["dimension_numbers"]
            lshape = lhsv.aval.shape
            out_shape = eqn.outvars[0].aval.shape
            k = int(np.prod([lshape[i] for i in lc])) if lc else 1
            macs = int(np.prod(out_shape)) * k
            # weight may sit on either side; prefer the named operand
            label = _get(rhsv) or _get(lhsv) or "<attention/matmul>"
            rows.append((macs, f"{label}  (dot k={k} -> {tuple(out_shape)})", "dot"))
    rows.sort(key=lambda r: r[0], reverse=True)
    return rows


def per_layer_report(apply: Callable, params, input_hw: Tuple[int, int] = (256, 256),
                     top: int = 0) -> str:
    """Human-readable per-layer MACs table with module-path labels (the TPU
    analogue of the reference's print_model_with_flops)."""
    rows = per_layer_macs(apply, params, input_hw)
    total = sum(r[0] for r in rows) or 1
    if top:
        rows = rows[:top]
    lines = [f"{'MACs':>14}  {'share':>6}  layer"]
    for macs, desc, _kind in rows:
        lines.append(f"{macs:14,d}  {100*macs/total:5.1f}%  {desc}")
    return "\n".join(lines)
