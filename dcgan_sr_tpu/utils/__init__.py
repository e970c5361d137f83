from .timers import Timer  # noqa: F401
from .stats import tensor_stats, print_tensor_stats  # noqa: F401
from .logging import MetricsLogger  # noqa: F401
from .profiling import profile_trace  # noqa: F401
