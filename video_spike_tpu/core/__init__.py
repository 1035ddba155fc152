from video_spike_tpu.core.config import (  # noqa: F401
    DictConfig,
    config_from_kwargs,
    update_config,
)
from video_spike_tpu.core.rng import set_seed  # noqa: F401
