"""Benchmark-gated serving envelope: per-model deployment plans.

The reference framework has one numerics tier (fp32) and one dispatch
shape (single image, ``test_demo.py:416-437``). This framework ships a
ladder of measured tiers (parity/high/mixed/fast/fast16 — ``config.py``),
storage scopes (bf16 HR tails / attention scores), and dispatch schedules
(plain chain, stage-split body+tail, tiled). The *envelope* is the join:
for every model, the fastest measured configuration whose FULL-PROTOCOL
PSNR shift vs the parity arm is within a gate (default ±0.005 dB — half
the challenge's own ±0.01 dB reproducibility bar, ``test_demo.py:447``).

``tools/make_gated_envelope.py`` builds the artifact
(``results/protocol/zoo_sustained_gated.json``) from three measured
ledgers (sustained sweeps per tier + the benchmark-delta ledger); this
module CONSUMES it: ``plan_for(model_id)`` returns the deployment plan
and ``make_server(model_id)`` constructs an ``SRServer`` configured to
it (numerics mode, batch, stage-split schedule).

Numerics mode is process-global (captured at trace time, ``config.py``);
``make_server`` pins the plan's tier around every dispatch via
``config.numerics_mode`` so the server keeps its measured numerics even
if the ambient mode changes afterwards.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional

from ntire2022_esr_tpu import config

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_PATH = os.path.join(_REPO, "results", "protocol", "zoo_sustained_gated.json")


@dataclasses.dataclass(frozen=True)
class ServingPlan:
    """One model's measured-fastest admissible deployment configuration."""

    model_id: int
    name: str
    tier: str                    # numerics mode: high | fast | fast16 | fasthi
    batch: int                   # sustained-optimal device batch
    method: str                  # chain | split | fori (tiled loop)
    chunk: Optional[int]         # split only: x4-tail chunk size
    ms_per_image: float          # measured sustained ms/img at this config
    tier_delta_db: Optional[float]  # measured benchmark PSNR shift (None:
    # high tier — its storage-scope gate is carried by the AUTO ledger)

    @property
    def stage_split(self):
        """Value for ``SRServer(stage_split=...)``."""
        return self.chunk if self.method == "split" else False


def load_envelope(path: Optional[str] = None) -> Dict[str, ServingPlan]:
    """name -> ServingPlan from the gated-envelope artifact."""
    path = path or DEFAULT_PATH
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"gated envelope artifact not found: {path} — generate it with "
            "`python tools/make_gated_envelope.py --write` (requires the "
            "sustained + benchmark-delta ledgers under results/protocol/)")
    with open(path) as fh:
        raw = json.load(fh)
    plans = {}
    for name, row in raw.items():
        plans[name] = ServingPlan(
            model_id=int(row["model_id"]),
            name=name,
            tier=row.get("tier", row.get("mode", "high")),
            batch=int(row.get("batch", 1)),
            method=row.get("method", "chain"),
            chunk=int(row["chunk"]) if row.get("chunk") else None,
            ms_per_image=float(row["ms_per_image_sustained"]),
            tier_delta_db=row.get("tier_delta_db"),
        )
    return plans


def plan_for(model_id: int, path: Optional[str] = None) -> ServingPlan:
    """The envelope plan for one model id."""
    for plan in load_envelope(path).values():
        if plan.model_id == model_id:
            return plan
    raise KeyError(f"model {model_id} has no row in the gated envelope")


def make_server(model_id: int, *, path: Optional[str] = None,
                max_batch: Optional[int] = None, depth: int = 2, mesh=None):
    """An ``SRServer`` configured to the model's envelope plan.

    The plan's numerics tier is pinned around the server's apply (trace
    -time capture via ``config.numerics_mode``), its sustained-optimal
    batch becomes ``max_batch`` (overridable), and split-method plans get
    the measured stage-split schedule. Tiled models (method ``fori``,
    e.g. 02_NLFFC) cannot be served by the batch server — serve those via
    ``harness.tiling.tiled_apply`` under ``config.numerics_mode(plan.tier)``.
    """
    from ntire2022_esr_tpu.harness import registry
    from ntire2022_esr_tpu.harness.serving import SRServer

    plan = plan_for(model_id, path)
    if plan.method == "fori":
        raise ValueError(
            f"model {model_id} ({plan.name}) serves via the tiled runner "
            f"(method={plan.method!r}); use harness.tiling.tiled_apply under "
            f"config.numerics_mode({plan.tier!r})")

    tier = plan.tier

    if plan.method == "split":
        # stage-split servers resolve body/tail from the model registry
        # internally; those seams read the SAME process-global config at
        # trace time, so pin it for the server's whole construction + the
        # caller is expected to warm up immediately (documented) — and we
        # re-pin defensively around warmup via PinnedServer below.
        server = _PinnedServer(tier, model_id=model_id,
                               max_batch=max_batch or plan.batch, depth=depth,
                               mesh=mesh, stage_split=plan.stage_split)
    else:
        # Build under the plan's tier so params are laid out for it, then
        # pin the tier at trace time: jit traces lazily, so the wrapper
        # (not the ambient mode at construction) must carry the tier.
        # (split plans rebuild internally — don't double-build here.)
        with config.numerics_mode(tier):
            base_apply, params, name, data_range, tile = \
                registry.build_model(model_id)

        def pinned_apply(p, x):
            with config.numerics_mode(tier):
                return base_apply(p, x)

        server = _PinnedServer(tier, max_batch=max_batch or plan.batch,
                               depth=depth, mesh=mesh, apply=pinned_apply,
                               params=params, data_range=data_range)
    server.plan = plan
    return server


class _PinnedServer:
    """SRServer wrapper that enters the plan's numerics mode around every
    dispatch, so lazy jit tracing captures the measured tier regardless of
    the ambient process mode."""

    def __init__(self, tier: str, **kw):
        from ntire2022_esr_tpu.harness.serving import SRServer

        self._tier = tier
        with config.numerics_mode(tier):
            self._srv = SRServer(**kw)

    def warmup(self, *a, **kw):
        with config.numerics_mode(self._tier):
            return self._srv.warmup(*a, **kw)

    def process_one(self, *a, **kw):
        with config.numerics_mode(self._tier):
            return self._srv.process_one(*a, **kw)

    def process_stream(self, frames, batch=None):
        # generators suspend: pin the mode around each advance, not the call
        with config.numerics_mode(self._tier):
            it = self._srv.process_stream(frames, batch=batch)
        while True:
            with config.numerics_mode(self._tier):
                try:
                    out = next(it)
                except StopIteration:
                    return
            yield out

    @property
    def tier(self) -> str:
        return self._tier

    def __getattr__(self, item):
        return getattr(self._srv, item)
