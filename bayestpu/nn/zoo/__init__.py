"""Model zoo mirroring both reference artifacts' families (SURVEY §2.3, §2.7,
§2.8): LeNet / VGG / ResNet / AlexNet / MLP classes, each with deterministic,
Bayesian, and multi-exit-Bayesian variants.

Registry keys follow the reference CLI names (``--model lenet`` etc. in
``Hardware_Artifact/bayes_hw/train_qkeras.py:105-128`` and ``--backbone`` in
``Software_Artifact/software/main.py``)."""

from bayestpu.nn.zoo import autobayes  # noqa: F401
from bayestpu.nn.zoo.lenet import LeNet, LeNetME  # noqa: F401
from bayestpu.nn.zoo.resnet import ResNet18  # noqa: F401
from bayestpu.nn.zoo.vgg import VGG  # noqa: F401
from bayestpu.nn.zoo.registry import (  # noqa: F401
    available_models,
    get_model,
    register_model,
)
