from video_spike_tpu.data.tar_io import read_trial_tar, write_trial_tar  # noqa: F401
from video_spike_tpu.data.dataset import (  # noqa: F401
    SessionDataset,
    get_metadata_from_loader,
    make_loader,
    split_dataset,
)
from video_spike_tpu.data.synthetic import make_synthetic_session  # noqa: F401
