from hydracore_tpu.bsdf.core import (  # noqa: F401
    MatParams,
    eval_bsdf,
    fetch_material,
    sample_bsdf,
)
