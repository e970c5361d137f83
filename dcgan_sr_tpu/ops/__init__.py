from .nn import (  # noqa: F401
    conv2d,
    conv_transpose2d,
    batch_norm,
    leaky_relu,
    relu,
    sigmoid,
    tanh,
    upsample_nearest,
)
from .adam import adam_init, adam_update  # noqa: F401
from .init import init_conv, init_bn  # noqa: F401
