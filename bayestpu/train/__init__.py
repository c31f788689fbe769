from bayestpu.train import losses  # noqa: F401
from bayestpu.train.losses import EEDConfig, eed_loss, multi_exit_accuracy  # noqa: F401
