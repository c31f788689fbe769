from bayestpu.metrics import ece, entropy, flops, kde  # noqa: F401
from bayestpu.metrics.kde import ece_kde  # noqa: F401
from bayestpu.metrics.ece import (  # noqa: F401
    accuracy,
    ece_bins,
    ece_equal_width,
    ece_from_bins,
    ece_hist,
    eval_metrics,
    nll,
)
from bayestpu.metrics.entropy import mean_predictive_entropy  # noqa: F401
