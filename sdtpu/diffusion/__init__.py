from .denoiser import (  # noqa: F401
    CompVisDenoiser,
    CompVisVDenoiser,
    DiscreteFlowDenoiser,
    EDMVDenoiser,
    FluxFlowDenoiser,
    MiniT2IFlowDenoiser,
)
from .schedule import get_sigmas  # noqa: F401
from .samplers import sample  # noqa: F401
