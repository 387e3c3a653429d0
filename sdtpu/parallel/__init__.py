from .mesh import create_mesh  # noqa: F401
from .sharding import shard_params, unet_partition_specs  # noqa: F401
