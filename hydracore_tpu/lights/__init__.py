from hydracore_tpu.lights.sampling import (  # noqa: F401
    LightSample,
    env_radiance,
    light_eval_pdf_from_hit,
    sample_light_rev,
    select_light,
)
