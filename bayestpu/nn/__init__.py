from bayestpu.nn import bayes, layers, multiexit  # noqa: F401
from bayestpu.nn.bayes import (  # noqa: F401
    BayesianDropout,
    BayesianDropout2D,
    BayesSite,
    Masksembles,
)
from bayestpu.nn.fused import BayesConv, BayesConvInput, BayesDense  # noqa: F401
from bayestpu.nn.multiexit import ExitOutputs, exit_ensemble_probs  # noqa: F401
