from .mesh import create_mesh  # noqa: F401
from .ring_attention import ring_attention  # noqa: F401
from .sharding import shard_params, unet_partition_specs  # noqa: F401
from .streaming import BlockStreamer, WanStreamer, split_stacked_params  # noqa: F401

# the rules cover every transformer family (UNet/FLUX/Wan/MMDiT/T5)
partition_specs = unet_partition_specs
