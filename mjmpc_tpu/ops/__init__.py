from .control import (
    cost_to_go,
    gamma_sequence,
    scale_ctrl,
    gaussian_logprob,
    gaussian_logprobgrad,
    gaussian_entropy,
    gaussian_kl,
)
from .noise import ar_filter, gaussian_noise, filtered_noise

__all__ = [
    "cost_to_go",
    "gamma_sequence",
    "scale_ctrl",
    "gaussian_logprob",
    "gaussian_logprobgrad",
    "gaussian_entropy",
    "gaussian_kl",
    "ar_filter",
    "gaussian_noise",
    "filtered_noise",
]
