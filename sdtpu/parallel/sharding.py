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


def _quant_sharding_tree(v, spec: P, mesh: Mesh, tp_axis: str):
    """Per-leaf sharding tree for a quantized weight (QuantTensor /
    QuantLoraTensor / GroupQuantTensor / Q4Tensor) given the *logical*
    [out, in] PartitionSpec.  Returns None when the tensor's packing grid
    cannot be split evenly along the requested axis (caller replicates).

    This is the TPU analog of the reference's row-split of *quantized*
    buffers (docs/backend.md:88-116, register_row_split_runner_params,
    stable-diffusion.cpp:363): the int8/4-bit payload is sliced along the
    spec'd dim with the group scales sharded along the same axis, and
    GSPMD inserts the psum after row-parallel contractions.
    """
    tp = mesh.shape[tp_axis]
    tname = type(v).__name__
    is_col = len(spec) == 2 and spec[0] is not None  # shard out features
    is_row = len(spec) == 2 and spec[1] is not None  # shard in features
    if not (is_col or is_row):
        return None
    out_dim, in_dim = v.shape  # logical [N, K]

    def ns(p):
        return NamedSharding(mesh, p)

    if tname in ("QuantTensor", "QuantLoraTensor"):
        # q: int8 [out, in], scale: f32 [out]
        if is_col:
            if out_dim % tp:
                return None
            d = dict(q=ns(P(tp_axis, None)), scale=ns(P(tp_axis)))
            if tname == "QuantLoraTensor":
                d.update(lora_down=ns(P()), lora_up=ns(P(tp_axis, None)))
        else:
            if in_dim % tp:
                return None
            d = dict(q=ns(P(None, tp_axis)), scale=ns(P()))
            if tname == "QuantLoraTensor":
                d.update(lora_down=ns(P(None, tp_axis)), lora_up=ns(P()))
        return type(v)(**d)

    if tname == "GroupQuantTensor":
        # stored transposed: q int8 [Kp, N], scale f32 [Kp//group, N]
        kq = v.q.shape[0]
        if is_col:
            if out_dim % tp:
                return None
            qs, ss = ns(P(None, tp_axis)), ns(P(None, tp_axis))
        else:
            # K split must land on whole scale groups per shard
            if kq % tp or (kq // v.group) % tp:
                return None
            qs, ss = ns(P(tp_axis, None)), ns(P(tp_axis, None))
        return type(v)(q=qs, scale=ss, zero=None if v.zero is None else ss,
                       k=v.k, group=v.group)

    if tname == "LoraTensor":
        # dense base with runtime LoRA factors: base follows the logical
        # spec; the factor on the sharded side splits with it, the other
        # factor replicates (rank dim is tiny)
        if is_col:
            if out_dim % tp:
                return None
            return type(v)(w=ns(P(tp_axis, None)), lora_down=ns(P()),
                           lora_up=ns(P(tp_axis, None)))
        if in_dim % tp:
            return None
        return type(v)(w=ns(P(None, tp_axis)),
                       lora_down=ns(P(None, tp_axis)), lora_up=ns(P()))

    if tname == "Q4Tensor":
        # packed uint8 [Kp//2, N] (nibbles tile-local per block_k), scale
        # [Kp//group, N]
        kp = v.packed.shape[0] * 2
        if is_col:
            if out_dim % tp:
                return None
            ps, ss = ns(P(None, tp_axis)), ns(P(None, tp_axis))
        else:
            # each shard must hold whole block_k nibble tiles
            if (kp // v.block_k) % tp or (kp // v.group) % tp:
                return None
            ps, ss = ns(P(tp_axis, None)), ns(P(tp_axis, None))
        return type(v)(packed=ps, scale=ss, k=v.k, block_k=v.block_k,
                       group=v.group)

    return None


_QUANT_LEAVES = ("QuantTensor", "QuantLoraTensor", "GroupQuantTensor",
                 "Q4Tensor", "LoraTensor")


def shard_params(params: Dict[str, object], mesh: Mesh, tp_axis: str = "tp",
                 report: bool = True):
    """Place params on the mesh with TP specs.

    Dense weights follow the partition rules directly; quantized leaves
    (QuantTensor / QuantLoraTensor / GroupQuantTensor / Q4Tensor) get a
    per-component sharding tree that slices the packed payload and its
    scales coherently (the reference row-splits quantized buffers the same
    way, docs/backend.md:88-116).  Params whose sharded dim is not divisible
    by the axis size stay replicated.  A placement report is logged so
    silent replication is visible (reference prints per-module placement,
    stable-diffusion.cpp:~1660).
    """
    from sdtpu.utils.logging import log_info, log_warn

    tp = mesh.shape[tp_axis]
    specs = unet_partition_specs(params, tp_axis)
    out = {}
    stats = {"col": 0, "row": 0, "bias": 0, "replicated": 0, "quant": 0}
    fallbacks = []
    for name, v in params.items():
        spec = specs[name]
        if type(v).__name__ in _QUANT_LEAVES:
            tree = _quant_sharding_tree(v, spec, mesh, tp_axis)
            if tree is not None:
                out[name] = jax.device_put(v, tree)
                stats["quant"] += 1
                stats["col" if spec[0] is not None else "row"] += 1
            else:
                out[name] = jax.device_put(v, NamedSharding(mesh, P()))
                stats["replicated"] += 1
                if spec != P():
                    fallbacks.append(name)
            continue
        ok = True
        for dim, axis in enumerate(spec):
            if axis is not None and v.shape[dim] % tp != 0:
                ok = False
        if not ok:
            fallbacks.append(name)
            spec = P()
        if spec == P():
            stats["replicated"] += 1
        elif len(spec) == 1:
            stats["bias"] += 1
        elif spec[0] is not None:
            stats["col"] += 1
        else:
            stats["row"] += 1
        out[name] = jax.device_put(v, NamedSharding(mesh, spec))
    if report:
        log_info(
            f"shard_params: tp={tp} over '{tp_axis}' — "
            f"{stats['col']} col-parallel, {stats['row']} row-parallel "
            f"({stats['quant']} quantized), {stats['bias']} sharded biases, "
            f"{stats['replicated']} replicated"
        )
        if fallbacks:
            shown = ", ".join(fallbacks[:8])
            more = f" (+{len(fallbacks) - 8} more)" if len(fallbacks) > 8 else ""
            log_warn(
                f"shard_params: {len(fallbacks)} TP-eligible params replicated "
                f"(dim not divisible by {tp} or packing grid unsplittable): "
                f"{shown}{more}"
            )
    return out
