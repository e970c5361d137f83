from .step import TrainState, init_train_state, build_train_step  # noqa: F401
from .loop import train_epochs  # noqa: F401
