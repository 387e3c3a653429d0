"""sdtpu — TPU-native diffusion inference framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
leejet/stable-diffusion.cpp (see SURVEY.md for the reference inventory).

Layer map (mirrors SURVEY.md §1, re-expressed TPU-first):
  ops/           fused TPU ops: attention (Pallas flash), norms, conv, quant matmul
  io/            checkpoint parsing: safetensors/GGUF/pickle, name conversion,
                 version fingerprinting (reference: src/model_loader.cpp)
  tokenizers/    byte-level BPE, CLIP/T5/... (reference: src/tokenizers/)
  models/        model zoo: CLIP, UNet, VAE, MMDiT, FLUX, ... (reference: src/model/)
  conditioning/  prompt parsing + token-weighted embeddings (reference: src/conditioning/)
  diffusion/     denoisers, sigma schedules, samplers, guidance — all run as a
                 single on-device lax.scan (reference: src/runtime/denoiser.hpp)
  parallel/      jax.sharding meshes + TP/DP rules (reference: layer/row split)
  utils/         images, logging, config
"""

__version__ = "0.2.0"


def get_system_info() -> str:
    """Runtime/device summary (reference sd_get_system_info,
    include/stable-diffusion.h:431)."""
    import jax

    try:
        devs = jax.devices()
        dev_desc = ", ".join(f"{d.platform}:{d.device_kind}" for d in devs)
    except Exception as e:  # backend init can fail in restricted envs
        dev_desc = f"unavailable ({e})"
    from sdtpu.native import get_native

    return (
        f"sdtpu {__version__} | jax {jax.__version__} | "
        f"devices: {dev_desc} | native loader: "
        f"{'yes' if get_native() is not None else 'numpy fallback'}"
    )
