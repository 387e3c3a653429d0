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

__version__ = "0.1.0"
