from .schemes import bce_loss, mse_loss, make_labels, criterion  # noqa: F401
