"""Hardware A/B for subgroup-masked cluster visits (HYDRA_CL_SUBG_*).

Probes configs sequentially with bench.py's differential harness; prints
one line per config. Usage: python tools/ab_subg.py [idx ...] to run a
subset of CONFIGS by index (default: all).
"""
from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, "/root/repo")

import bench

CONFIGS = [
    {},  # base: RBLK 256 / BOUNCE 128, dense visits
    {"HYDRA_CL_SUBG_BOUNCE": "32", "HYDRA_CL_RBLK_BOUNCE": "256"},
    {"HYDRA_CL_SUBG_BOUNCE": "32"},  # bounce stays 128 => NSg=4
    {"HYDRA_CL_SUBG_BOUNCE": "32", "HYDRA_CL_RBLK_BOUNCE": "256",
     "HYDRA_CL_SUBG_SHADOW": "32"},
    {"HYDRA_CL_SUBG_BOUNCE": "16", "HYDRA_CL_RBLK_BOUNCE": "256"},
    {"HYDRA_CL_SUBG_BOUNCE": "32", "HYDRA_CL_RBLK_BOUNCE": "256",
     "HYDRA_CL_SUBG_SHADOW": "32", "HYDRA_CL_SUBG": "32"},  # + primary
]


def main():
    picks = [int(a) for a in _sys.argv[1:]] or range(len(CONFIGS))
    for i in picks:
        env = CONFIGS[i]
        tag = bench._tag(env)
        try:
            dt, rays, spread = bench._probe(bench.SCENE, 1024,
                                            timeout=1500, env=env)
            ms = 1024 * 1024 / dt / 1e6
            print(f"[{i}] {tag}: {ms:.3f} Msamples/s "
                  f"{rays / dt / 1e6:.2f} Mrays/s spread={spread:.3f}",
                  flush=True)
        except Exception as e:
            print(f"[{i}] {tag}: FAILED {str(e)[-300:]}", flush=True)


if __name__ == "__main__":
    main()
