from .mesh import create_mesh, device_count  # noqa: F401
from .collectives import psum, pmean, all_gather, ppermute, reduce_scatter  # noqa: F401
from .dp import build_dp_multi_step, build_dp_train_step, shard_batch  # noqa: F401
