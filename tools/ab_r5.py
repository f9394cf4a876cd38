"""Round-5 hardware A/B: pop-iteration kernel + bf16 permute + knobs.

Each config runs in a SUBPROCESS (knobs are read at trace time and baked
into the jit cache — an in-process env flip would hit the cached program).
Protocol = bench.py's median-of->=3 differential with the 5% spread gate.

Usage: python tools/ab_r5.py [configs...]   (default: the r5 set)
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")
import bench

SCENE = "/root/reference/hydra_app/tests/test_224"

ALL = {
    # new defaults: POP=1 (bit-pop cluster iteration), PERM_BF16=1
    "base": {},
    # the r5-start configuration (list compaction + f32 permute): anchor
    "r5start": {"HYDRA_CL_POP": "0", "HYDRA_PERM_BF16": "0"},
    "pop0": {"HYDRA_CL_POP": "0"},
    "perm0": {"HYDRA_PERM_BF16": "0"},
    "k4": {"HYDRA_CL_K": "4"},
    "k12": {"HYDRA_CL_K": "12"},
    "sort2": {"HYDRA_SORT_EVERY": "2"},
    "texfuse": {"HYDRA_TEXFUSE": "1"},
    "fuse": {"HYDRA_FUSE_TRACE": "1"},
}
DEFAULT = ["base", "r5start", "k4", "sort2"]


def main():
    names = sys.argv[1:] or DEFAULT
    out = {}
    for name in names:
        env = ALL[name]
        try:
            dt, rays, spread = bench._probe(SCENE, 1024, timeout=2900,
                                            env=env)
            ms = 1024 * 1024 / dt / 1e6
            out[name] = {"Msamples/s": round(ms, 3),
                         "Mrays/s": round(rays / dt / 1e6, 2),
                         "spread": round(spread, 3)}
        except Exception as e:
            out[name] = {"error": str(e)[:300]}
        print(name, json.dumps(out[name]), flush=True)
    print("AB_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
