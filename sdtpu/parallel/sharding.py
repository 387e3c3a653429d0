"""Parameter partition rules — megatron-style tensor parallelism for the
diffusion backbones (TPU-native analog of the reference's CUDA row-split,
docs/backend.md:88-116, register_row_split_runner_params).

Rules map checkpoint param names → PartitionSpec:
  - attention to_q/to_k/to_v and MLP in-projections: shard OUT features ("tp")
  - attention to_out / MLP out-projections: shard IN features ("tp")
  - everything else (convs, norms, embeddings): replicated
Activations are sharded over batch ("dp").  XLA/GSPMD inserts the psum over
ICI after the row-parallel matmuls automatically.
"""
from __future__ import annotations

import re
from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# column-parallel (shard output dim 0 of torch [out,in] weights) — UNet
# attention/GEGLU, FLUX fused qkv/mlp/single-stream linear1, Wan/MMDiT
# q/k/v + ffn in-proj, T5 q/k/v + gated-FF in-projections
_COL_PAT = re.compile(
    r"(to_q|to_k|to_v|q_proj|k_proj|v_proj|ff\.net\.0\.proj|mlp\.fc1"
    r"|attn\.qkv|self_attn\.[qkv]|cross_attn\.(q|k|v|k_img|v_img)|ffn\.0"
    r"|img_mlp\.0|txt_mlp\.0|linear1|SelfAttention\.[qkv]"
    r"|DenseReluDense\.wi_0|DenseReluDense\.wi_1)\.weight$"
)
_COL_BIAS_PAT = re.compile(
    r"(q_proj|k_proj|v_proj|ff\.net\.0\.proj|mlp\.fc1|attn\.qkv"
    r"|self_attn\.[qkv]|cross_attn\.(q|k|v|k_img|v_img)|ffn\.0"
    r"|img_mlp\.0|txt_mlp\.0|linear1)\.bias$"
)
# row-parallel (shard input dim 1; output gathered by psum)
_ROW_PAT = re.compile(
    r"(to_out\.0|out_proj|ff\.net\.2|mlp\.fc2|attn\.proj|self_attn\.o"
    r"|cross_attn\.o|ffn\.2|img_mlp\.2|txt_mlp\.2|linear2"
    r"|SelfAttention\.o|DenseReluDense\.wo)\.weight$"
)


def unet_partition_specs(params: Dict[str, object], tp_axis: str = "tp") -> Dict[str, P]:
    """PartitionSpec per param name for TP sharding of transformer weights."""
    specs: Dict[str, P] = {}
    for name, v in params.items():
        shape = getattr(v, "shape", ())
        if _COL_PAT.search(name) and len(shape) == 2:
            specs[name] = P(tp_axis, None)
        elif _COL_BIAS_PAT.search(name) and len(shape) == 1:
            specs[name] = P(tp_axis)
        elif _ROW_PAT.search(name) and len(shape) == 2:
            specs[name] = P(None, tp_axis)
        else:
            specs[name] = P()
    return specs


def shard_params(params: Dict[str, object], mesh: Mesh, tp_axis: str = "tp"):
    """Place params on the mesh with TP specs (divisibility-checked: params
    whose sharded dim is not divisible by the axis size stay replicated)."""
    tp = mesh.shape[tp_axis]
    specs = unet_partition_specs(params, tp_axis)
    out = {}
    for name, v in params.items():
        spec = specs[name]
        ok = True
        for dim, axis in enumerate(spec):
            if axis is not None and v.shape[dim] % tp != 0:
                ok = False
        if not ok:
            spec = P()
        out[name] = jax.device_put(v, NamedSharding(mesh, spec))
    return out
