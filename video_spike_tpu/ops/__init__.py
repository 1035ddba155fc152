from video_spike_tpu.ops.poisson import poisson_nll, poisson_nll_mean  # noqa: F401
from video_spike_tpu.ops.metrics import (  # noqa: F401
    bits_per_spike,
    bits_per_spike_per_neuron,
    metrics_list,
    neg_log_likelihood,
    r2_score_sklearn_like,
)
from video_spike_tpu.ops.contrastive import (  # noqa: F401
    clip_contrastive_loss,
    dot_similarity,
    euclidean_similarity,
    info_nce,
    infonce_from_dists,
    nce_loss,
)
from video_spike_tpu.ops.signal import (  # noqa: F401
    gaussian_filter1d,
    one_hot_per_trial,
    standardize,
)
