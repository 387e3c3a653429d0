from .basic import (  # noqa: F401
    conv2d,
    gelu,
    group_norm,
    layer_norm,
    linear,
    quick_gelu,
    rms_norm,
    timestep_embedding,
)
from .attention import attention  # noqa: F401
