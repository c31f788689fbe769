from bayestpu.nn import bayes, layers, multiexit  # noqa: F401
from bayestpu.nn.bayes import BayesianDropout, BayesSite, Masksembles  # noqa: F401
from bayestpu.nn.multiexit import ExitOutputs, exit_ensemble_probs  # noqa: F401
