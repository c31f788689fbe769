from bayestpu.train import losses, loop, optim  # noqa: F401
from bayestpu.train.losses import EEDConfig, eed_loss, multi_exit_accuracy  # noqa: F401
from bayestpu.train.loop import TrainState, create_state, make_train_step, train_loop  # noqa: F401
from bayestpu.train.optim import TrainRecipe, get_optimizer, get_recipe  # noqa: F401
