"""Dataset path selection (reference test_demo.py:344-361).

DIV2K x4: validation = images 0801-0900 (LR has 'x4' suffix), test =
0901-1000 (no suffix). Returns (lr_path, hr_path) pairs.
"""

from __future__ import annotations

import os
from typing import List, Tuple


def select_dataset(data_dir: str, mode: str) -> List[Tuple[str, str]]:
    if mode == "test":
        path = [
            (
                os.path.join(data_dir, f"DIV2K_test_LR/{i:04}.png"),
                os.path.join(data_dir, f"DIV2K_test_HR/{i:04}.png"),
            )
            for i in range(901, 1001)
        ]
    elif mode == "valid":
        path = [
            (
                os.path.join(data_dir, f"DIV2K_valid_LR/{i:04}x4.png"),
                os.path.join(data_dir, f"DIV2K_valid_HR/{i:04}.png"),
            )
            for i in range(801, 901)
        ]
    else:
        raise ValueError(f"unknown dataset mode: {mode!r}")
    return path


def discover_pairs(data_dir: str, lr_sub: str = "LR", hr_sub: str = "HR") -> List[Tuple[str, str]]:
    """Generic LR/HR folder pairing for non-DIV2K layouts (paired by sort order)."""
    lr_dir, hr_dir = os.path.join(data_dir, lr_sub), os.path.join(data_dir, hr_sub)
    lrs = sorted(
        os.path.join(lr_dir, f) for f in os.listdir(lr_dir)
        if f.lower().endswith((".png", ".jpg", ".bmp"))
    )
    hrs = sorted(
        os.path.join(hr_dir, f) for f in os.listdir(hr_dir)
        if f.lower().endswith((".png", ".jpg", ".bmp"))
    )
    if len(lrs) != len(hrs):
        raise ValueError(f"LR/HR count mismatch: {len(lrs)} vs {len(hrs)}")
    return list(zip(lrs, hrs))
