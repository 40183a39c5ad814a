"""Model zoo registration: one ModelSpec per challenge entry.

Mirrors the id -> (net, checkpoint, data_range, tile) mapping of the
reference registry (test_demo.py:13-341). Entries are added here as their
TPU-native graph definitions land; withheld submissions (7, 21, 32, 41)
have no checkpoints and are intentionally absent.
"""

from __future__ import annotations

import functools

from ntire2022_esr_tpu.harness.registry import ModelSpec, register
from ntire2022_esr_tpu.models.fmen import fmen_apply
from ntire2022_esr_tpu.models.imdn import imdn_apply
from ntire2022_esr_tpu.models.plainrfdn import plainrfdn_apply
from ntire2022_esr_tpu.models.rfdn import rfdn_apply
from ntire2022_esr_tpu.models.rlfn import rlfn_apply

register(ModelSpec(
    model_id=-1, name="-1_IMDN_baseline",
    apply=functools.partial(imdn_apply, nc=64, nb=8),
    ckpt="imdn_baseline.pth", data_range=1.0,
))

register(ModelSpec(
    model_id=0, name="00_RFDN_baseline",
    apply=rfdn_apply,
    ckpt="rfdn_baseline.pth", data_range=255.0,
))

register(ModelSpec(
    model_id=3, name="03_FMEN",
    apply=fmen_apply,
    ckpt="team03_fmen.pth", data_range=255.0,
))

register(ModelSpec(
    model_id=4, name="04_RLFN",
    apply=rlfn_apply,
    ckpt="team04_rlfn.pth", data_range=255.0,
))

register(ModelSpec(
    model_id=5, name="05_EFDN",
    apply=plainrfdn_apply,
    ckpt="team05_efdn.pt", data_range=255.0,
))

register(ModelSpec(
    model_id=26, name="26_IMDN",
    apply=functools.partial(imdn_apply, nc=64, nb=7),
    ckpt="team26_imdn_nb7.pth", data_range=1.0,
))
