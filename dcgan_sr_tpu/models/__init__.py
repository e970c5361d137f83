from .network import init_network, apply_network, param_count  # noqa: F401
from .specs import generator_spec, discriminator_spec  # noqa: F401
