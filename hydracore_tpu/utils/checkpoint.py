"""Render checkpoint/resume: durable accumulation state.

The reference approximates resume through its shared accumulator image
(spp counter in the header survives worker restarts, SURVEY.md §5
'checkpoint/resume') and periodic -saveinterval snapshots. Here the
accumulator is first-class: (HDR sum, spp, seed, resolution) round-trips
through one .npz so a render can continue across process restarts —
`python -m hydracore_tpu.app.cli ... -resume ckpt.npz`.
"""
from __future__ import annotations

import numpy as np


def save_checkpoint(path: str, fb_sum: np.ndarray, spp: int, seed: int):
    np.savez_compressed(
        path, fb_sum=np.asarray(fb_sum, np.float32),
        spp=np.int64(spp), seed=np.int64(seed), version=np.int64(1),
    )


def load_checkpoint(path: str):
    """Returns (fb_sum (H,W,3) float32, spp int, seed int)."""
    z = np.load(path)
    return z["fb_sum"].astype(np.float32), int(z["spp"]), int(z["seed"])
