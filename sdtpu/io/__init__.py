from .safetensors import load_safetensors, save_safetensors  # noqa: F401
from .gguf import load_gguf  # noqa: F401
