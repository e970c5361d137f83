from .config import Config, VARIANTS, get_config, apply_env_overrides  # noqa: F401
