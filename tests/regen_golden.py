"""Regenerate the committed golden images (run on CPU for determinism)."""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tests.golden_scenes import ALL_GOLDEN, render_golden  # noqa: E402

GOLD_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def main():
    os.makedirs(GOLD_DIR, exist_ok=True)
    names = sys.argv[1:] or sorted(ALL_GOLDEN)
    for name in names:
        img = render_golden(name)
        np.savez_compressed(os.path.join(GOLD_DIR, f"{name}.npz"),
                            ldr=img.astype(np.float16))
        print(f"[golden] {name}: mean {img.mean():.1f}")


if __name__ == "__main__":
    main()
