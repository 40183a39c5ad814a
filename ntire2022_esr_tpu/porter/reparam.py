"""Analytic reparameterization folds for train-form checkpoints.

Every shipped zoo checkpoint is already deploy-form (the teams folded
before export), so nothing in the 42-model protocol exercises this — but
the reference carries the in-repo fold (`team29_clrfdn.py:221-244`
``LinearBlock.rep_params``: conv3x3 -> conv1x1 collapsed to one conv3x3),
and a train-form checkpoint would need it at port time. This is the
TPU-layout (HWIO) equivalent, validated against the composition property
and the reference's own fold in tests/test_porter.py.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def fold_linear_block(w3: np.ndarray, b3: Optional[np.ndarray],
                      w1: np.ndarray, b1: Optional[np.ndarray],
                      with_idt: bool = False):
    """Fold conv3x3 (I->M) followed by conv1x1 (M->O) into one conv3x3.

    Args are HWIO weights / (C,) biases as the porter emits them:
    ``w3`` (3, 3, I, M), ``w1`` (1, 1, M, O). Returns ``(rk, rb)`` with
    ``rk`` (3, 3, I, O) and ``rb`` (O,). ``with_idt=True`` adds the
    identity shortcut as a center tap (requires I == O).

    The composition is exact for the *linear* part only — a LinearBlock
    with a nonlinear ``act_type`` applies its activation AFTER the pair,
    which survives the fold (act(conv1x1(conv3x3(x))) == act(folded(x))).
    """
    w3 = np.asarray(w3)
    w1 = np.asarray(w1)
    if w3.shape[:2] != (3, 3) or w1.shape[:2] != (1, 1):
        raise ValueError(f"expected 3x3 then 1x1 conv, got {w3.shape[:2]} "
                         f"then {w1.shape[:2]}")
    if w3.shape[3] != w1.shape[2]:
        raise ValueError(f"mid-channel mismatch: {w3.shape[3]} vs {w1.shape[2]}")
    m2o = w1[0, 0]  # (M, O)
    rk = np.einsum("hwim,mo->hwio", w3, m2o)
    rb = np.zeros(w1.shape[3], w3.dtype)
    if b3 is not None:
        rb = rb + np.asarray(b3) @ m2o
    if b1 is not None:
        rb = rb + np.asarray(b1)
    if with_idt:
        i_ch, o_ch = rk.shape[2], rk.shape[3]
        if i_ch != o_ch:
            raise ValueError(f"identity fold needs in == out channels, "
                             f"got {i_ch} != {o_ch}")
        rk = rk.copy()
        rk[1, 1, np.arange(o_ch), np.arange(o_ch)] += 1.0
    return rk.astype(w3.dtype), rb.astype(w3.dtype)


def fold_linear_block_tree(p: Dict, with_idt: bool = False) -> Dict:
    """Fold a ported LinearBlock param subtree ({conv3x3: {weight, bias},
    conv1x1: {weight, bias}, [act: ...]}) into a single conv param dict,
    preserving any activation params (e.g. PReLU weight) alongside."""
    rk, rb = fold_linear_block(
        p["conv3x3"]["weight"], p["conv3x3"].get("bias"),
        p["conv1x1"]["weight"], p["conv1x1"].get("bias"), with_idt=with_idt)
    out = {"weight": rk, "bias": rb}
    if "act" in p:
        out["act"] = p["act"]
    return out
