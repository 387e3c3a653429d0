"""Host-RAM weight streaming — run models larger than HBM on one chip.

TPU-native replacement for the reference's params-backend offload +
--stream-layers prefetch streaming (docs/performance.md:56-74,
ModelManager::prepare_params, ggml_graph_cut.h residency annotation):

- Non-block ("resident") params live in HBM permanently.
- Each transformer block's weights live in host RAM (numpy) and are
  device_put ahead of use with a prefetch window; jax transfers are async, so
  block i+1..i+prefetch upload over PCIe/DMA while block i computes on the
  MXU.  Consumed device blocks are dropped so XLA frees their HBM.
- The per-block compute is ONE jitted program reused for every layer (blocks
  are shape-homogeneous), so there is no per-layer recompilation.

Peak HBM = resident params + prefetch × block size + activations — the same
bound the reference's streamed graph-cut plan achieves, without graphs or
schedulers: the Python loop IS the schedule, XLA overlaps the DMAs.
"""
from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def split_stacked_params(
    params: Dict[str, np.ndarray], prefix: str = "blocks"
) -> Tuple[Dict[str, np.ndarray], List[Dict[str, np.ndarray]]]:
    """Split a param dict into (resident, per-block local dicts).

    ``{prefix}.N.<local>`` keys land in blocks[N] under ``<local>``; everything
    else stays resident.  Block arrays are kept as host numpy (NOT jnp) so
    nothing is uploaded until the streamer asks for it.
    """
    pat = re.compile(rf"^{re.escape(prefix)}\.(\d+)\.(.*)$")
    resident: Dict[str, np.ndarray] = {}
    blocks: Dict[int, Dict[str, np.ndarray]] = {}
    for k, v in params.items():
        m = pat.match(k)
        if m:
            blocks.setdefault(int(m.group(1)), {})[m.group(2)] = np.asarray(v)
        else:
            resident[k] = v
    ordered = [blocks[i] for i in sorted(blocks)]
    assert sorted(blocks) == list(range(len(ordered))), "non-contiguous block ids"
    return resident, ordered


class DiskBlockSource:
    """Disk-residency block provider (reference ResidencyMode::Disk,
    model_manager.h:31-48 + --stream-layers): block weights stay in the
    checkpoint FILE; each block's tensors are read from the mmap at upload
    time, so neither HBM nor host RSS holds the full model.  Presents the
    list-of-dicts interface BlockStreamer consumes (len + indexing)."""

    def __init__(self, st_file, prefix: str = "blocks",
                 strip: str = "model.diffusion_model.", dtype=np.float32,
                 cache_bytes: int = 0):
        """st_file: sdtpu.io.safetensors.SafetensorsFile (mmap-backed).

        cache_bytes > 0 enables a host-RAM LRU of decoded blocks so a
        multi-step sample doesn't re-read + re-convert the checkpoint once
        per step (VERDICT r2 weak #6).  The budget bounds host RSS; with a
        budget ≥ model size this degenerates to one read total.
        """
        self.file = st_file
        self.dtype = dtype
        self.cache_bytes = int(cache_bytes)
        from collections import OrderedDict

        self._cache: "OrderedDict[int, Dict[str, np.ndarray]]" = OrderedDict()
        self._cache_used = 0
        self.block_reads = 0  # underlying file decodes, for tests/telemetry
        pat = re.compile(rf"^{re.escape(prefix)}\.(\d+)\.(.*)$")
        self._blocks: Dict[int, Dict[str, str]] = {}
        for full in st_file.names():
            name = full[len(strip):] if full.startswith(strip) else full
            m = pat.match(name)
            if m:
                self._blocks.setdefault(int(m.group(1)), {})[m.group(2)] = full
        self._order = sorted(self._blocks)

    def __len__(self):
        return len(self._order)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        blk = self._cache.get(i)
        if blk is not None:
            self._cache.move_to_end(i)
            return blk
        names = self._blocks[self._order[i]]
        blk = {
            local: np.asarray(self.file.tensor(full), dtype=self.dtype)
            for local, full in names.items()
        }
        self.block_reads += 1
        if self.cache_bytes:
            size = sum(v.nbytes for v in blk.values())
            if size <= self.cache_bytes:
                self._cache[i] = blk
                self._cache_used += size
                while self._cache_used > self.cache_bytes:
                    _, old = self._cache.popitem(last=False)
                    self._cache_used -= sum(v.nbytes for v in old.values())
        return blk

    def resident_params(self, dtype=None) -> Dict[str, np.ndarray]:
        """All non-block tensors (loaded eagerly — they stay in HBM)."""
        strip_set = {v for b in self._blocks.values() for v in b.values()}
        out = {}
        for full in self.file.names():
            if full in strip_set:
                continue
            name = full
            for s in ("model.diffusion_model.",):
                if name.startswith(s):
                    name = name[len(s):]
            arr = np.asarray(self.file.tensor(full))
            out[name] = arr if dtype is None else arr.astype(dtype)
        return out


def disk_sources(st_file, prefixes: Tuple[str, ...],
                 strip: str = "model.diffusion_model.",
                 dtype=np.float32, cache_bytes: int = 0):
    """(resident_params, [DiskBlockSource per prefix]) for a checkpoint whose
    block stacks should stay on disk (reference ResidencyMode::Disk applied
    per stack).  resident = every tensor not claimed by any stack; block
    tensors are never materialized here."""
    sources = [
        DiskBlockSource(st_file, prefix=p, strip=strip, dtype=dtype,
                        cache_bytes=cache_bytes)
        for p in prefixes
    ]
    claimed = set()
    for s in sources:
        for blk in s._blocks.values():
            claimed.update(blk.values())
    resident: Dict[str, np.ndarray] = {}
    for full in st_file.names():
        if full in claimed:
            continue
        name = full[len(strip):] if full.startswith(strip) else full
        resident[name] = np.asarray(st_file.tensor(full))
    return resident, sources


class BlockStreamer:
    """Run ``carry = block_fn(block_params, carry)`` over a host-resident
    stack with double-buffered uploads.

    block_fn is jitted once (same shapes every layer).  ``aux`` values are
    passed through to every call (activations shared across layers: text
    context, RoPE tables, modulation vectors...).
    """

    def __init__(self, block_fn: Callable, prefetch: int = 2, device=None,
                 mesh=None, tp_axis: str = "tp"):
        """mesh: optional jax.sharding.Mesh — streamed blocks upload directly
        into their TP shardings (streaming × tensor parallelism: each chip
        holds only its slice of the in-flight window, so the streamed-model
        ceiling scales with the mesh; the reference cannot combine row-split
        with --stream-layers)."""
        self.block_fn = jax.jit(block_fn)
        self.prefetch = max(1, int(prefetch))
        self.device = device
        self.mesh = mesh
        self.tp_axis = tp_axis
        self._spec_cache: Dict[str, object] = {}
        self.peak_resident_blocks = 0  # observability for tests/telemetry

    def _sharding_for(self, name: str, arr) -> object:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .sharding import unet_partition_specs

        s = self._spec_cache.get(name)
        if s is None:
            spec = unet_partition_specs({name: arr}, self.tp_axis)[name]
            tp = self.mesh.shape[self.tp_axis]
            for dim, axis in enumerate(spec):
                if axis is not None and arr.shape[dim] % tp:
                    spec = P()  # indivisible → replicate this leaf
            s = NamedSharding(self.mesh, spec)
            self._spec_cache[name] = s
        return s

    def _upload(self, block: Dict[str, np.ndarray]):
        if self.mesh is not None:
            return {k: jax.device_put(v, self._sharding_for(k, v))
                    for k, v in block.items()}
        if self.device is not None:
            return {k: jax.device_put(v, self.device) for k, v in block.items()}
        return {k: jax.device_put(v) for k, v in block.items()}

    def __call__(self, blocks_host: List[Dict[str, np.ndarray]], carry, *aux):
        window: Dict[int, dict] = {}
        n = len(blocks_host)
        for j in range(min(self.prefetch, n)):
            window[j] = self._upload(blocks_host[j])
        for i in range(n):
            self.peak_resident_blocks = max(self.peak_resident_blocks, len(window))
            dev_block = window.pop(i)
            nxt = i + self.prefetch
            if nxt < n:
                window[nxt] = self._upload(blocks_host[nxt])  # async, overlaps
            carry = self.block_fn(dev_block, carry, *aux)
            del dev_block  # release HBM once the block's compute retires
        return carry


class FluxStreamer:
    """Weight-streamed FLUX forward: FLUX.1-dev bf16 (~24 GB params) samples
    on a 16 GB v5e (resident embeds/head ≈ 0.3 GB + prefetch × block +
    activations).  Covers the standard FLUX family (dev/schnell/FLUX.2 shared
    modulation); chroma/sefi/radiance keep the resident path.

    The double_blocks and single_blocks stacks stream independently — each
    has its own jitted block program (shape-homogeneous within a stack).
    Reference analog: any-model residency streaming, ggml_graph_cut.h:125 +
    docs/performance.md:56-74."""

    STACKS = ("double_blocks", "single_blocks")

    def __init__(self, params, cfg, prefetch: int = 2, device=None,
                 resident=None, sources=None, mesh=None, tp_axis: str = "tp"):
        """params=None + resident/sources: pre-split stacks (e.g. from
        disk_sources) — blocks come from any len+getitem provider instead of
        host lists (true disk residency, no full-model host materialize).

        mesh: stream into TP shardings — blocks upload pre-sliced per chip
        and the resident prologue/head params shard with the standard
        partition rules (streaming × mesh, SURVEY §5 / VERDICT r3 item 5)."""
        from sdtpu.models.flux import (
            flux_double_block,
            flux_head,
            flux_prologue,
            flux_single_block,
        )

        self.cfg = cfg
        if params is not None:
            rest, self.double_host = split_stacked_params(params, "double_blocks")
            self.resident, self.single_host = split_stacked_params(
                rest, "single_blocks")
        else:
            self.resident = resident
            self.double_host, self.single_host = sources
        if mesh is not None:
            from .sharding import shard_params

            self.resident = shard_params(self.resident, mesh, tp_axis,
                                         report=False)
        elif device is not None:
            self.resident = {
                k: jax.device_put(v, device) for k, v in self.resident.items()
            }

        def _prologue(p, x, t, ctx, y, g):
            return flux_prologue(p, x, t, ctx, y, g, cfg)

        def _dblock(bp, carry, vec, rot, mods):
            img, txt = carry
            return flux_double_block(bp, "", img, txt, vec, rot, None, cfg,
                                     mods=mods)

        def _sblock(bp, xx, vec, rot, mods):
            return flux_single_block(bp, "", xx, vec, rot, None, cfg,
                                     mods=mods)

        def _head(p, img, vec, dims):
            return flux_head(p, img, vec, dims, cfg)

        self._prologue = jax.jit(_prologue)
        self._head_jit = jax.jit(_head, static_argnames=("dims",))
        self._double = BlockStreamer(_dblock, prefetch=prefetch, device=device,
                                     mesh=mesh, tp_axis=tp_axis)
        self._single = BlockStreamer(_sblock, prefetch=prefetch, device=device,
                                     mesh=mesh, tp_axis=tp_axis)
        self.last_peak_blocks = 0

    def __call__(self, x, timesteps, context, y, guidance=None):
        cfg = self.cfg
        b, h, w, c = x.shape
        img, txt, vec, rot, shared = self._prologue(
            self.resident, x, timesteps, context, y, guidance
        )
        l_txt = txt.shape[1]
        dmods = (shared[0], shared[1]) if shared is not None else None
        smods = shared[2] if shared is not None else None
        img, txt = self._double(self.double_host, (img, txt), vec, rot, dmods)
        xx = jnp.concatenate([txt, img], axis=1)
        xx = self._single(self.single_host, xx, vec, rot, smods)
        self.last_peak_blocks = max(self._double.peak_resident_blocks,
                                    self._single.peak_resident_blocks)
        return self._head_jit(self.resident, xx[:, l_txt:], vec, (b, h, w, c))


class HunyuanStreamer:
    """Weight-streamed HunyuanVideo forward (double-stream stack from host
    RAM; prologue/token-refiner/head resident)."""

    STACKS = ("double_blocks",)

    def __init__(self, params, cfg, prefetch: int = 2, device=None,
                 resident=None, sources=None):
        from sdtpu.models.hunyuan import (
            hunyuan_double_block,
            hunyuan_head,
            hunyuan_prologue,
        )

        self.cfg = cfg
        if params is not None:
            self.resident, self.blocks_host = split_stacked_params(
                params, "double_blocks")
        else:
            self.resident, (self.blocks_host,) = resident, sources
        if device is not None:
            self.resident = {
                k: jax.device_put(v, device) for k, v in self.resident.items()
            }

        def _prologue(p, x, t, ctx, g, tr, byt5):
            img, txt, vec, rot, _ = hunyuan_prologue(p, x, t, ctx, g, cfg,
                                                     timestep_r=tr,
                                                     context_byt5=byt5)
            return img, txt, vec, rot

        def _block(bp, carry, vec, rot):
            img, txt = carry
            return hunyuan_double_block(bp, "", img, txt, vec, rot, cfg)

        def _head(p, img, vec, dims):
            return hunyuan_head(p, img, vec, dims, cfg)

        self._prologue = jax.jit(_prologue)
        self._head_jit = jax.jit(_head, static_argnames=("dims",))
        self._streamer = BlockStreamer(_block, prefetch=prefetch, device=device)
        self.last_peak_blocks = 0

    def __call__(self, x, timesteps, context, guidance=None, timestep_r=None,
                 context_byt5=None):
        b, t, hh, ww, _ = x.shape
        pt, ph, pw = self.cfg.patch_size
        dims = (b, t, hh, ww, -(-t // pt), -(-hh // ph), -(-ww // pw))
        img, txt, vec, rot = self._prologue(
            self.resident, x, timesteps, context, guidance, timestep_r,
            context_byt5
        )
        img, txt = self._streamer(self.blocks_host, (img, txt), vec, rot)
        self.last_peak_blocks = self._streamer.peak_resident_blocks
        return self._head_jit(self.resident, img, vec, dims)


class LTXVStreamer:
    """Weight-streamed LTX(-AV) forward: the transformer_blocks stack streams
    from host RAM via ltxav_forward's ``run_blocks`` hook; prologue/head run
    eagerly on the resident params (tiny vs the 48-block stack)."""

    STACKS = ("transformer_blocks",)

    def __init__(self, params, cfg, prefetch: int = 2, device=None,
                 resident=None, sources=None):
        from sdtpu.models.ltxv import _av_block

        self.cfg = cfg
        if params is not None:
            self.resident, self.blocks_host = split_stacked_params(
                params, "transformer_blocks")
        else:
            self.resident, (self.blocks_host,) = resident, sources
        if device is not None:
            self.resident = {
                k: jax.device_put(v, device) for k, v in self.resident.items()
            }

        def _block(bp, carry, *aux):
            # re-prefix block-local keys so _av_block's f"{pre}.…" lookups hit
            bp2 = {f"blk.{k}": v for k, v in bp.items()}
            vx, ax = carry
            return _av_block(bp2, "blk", vx, ax, *aux, cfg)

        self._streamer = BlockStreamer(_block, prefetch=prefetch, device=device)
        self.last_peak_blocks = 0

    def __call__(self, x, timesteps, context=None, audio_x=None,
                 audio_timesteps=None, frame_rate=24.0, video_positions=None):
        from sdtpu.models.ltxv import ltxav_forward

        def run_blocks(vx, ax, aux):
            out = self._streamer(self.blocks_host, (vx, ax), *aux)
            self.last_peak_blocks = self._streamer.peak_resident_blocks
            return out

        return ltxav_forward(
            self.resident, x, timesteps, context=context, audio_x=audio_x,
            audio_timesteps=audio_timesteps, frame_rate=frame_rate,
            video_positions=video_positions, cfg=self.cfg,
            run_blocks=run_blocks,
        )


class WanStreamer:
    """Weight-streamed Wan forward: Wan-14B bf16 (~28 GB params) samples on a
    16 GB v5e (resident ≈ 1.5 GB + 2 blocks ≈ 1.4 GB + activations).

    Drop-in for ``wan_forward`` on t2v/i2v models (no VACE on the streamed
    path — VACE control runs resident).  Prologue and head are jitted with
    the resident params; the block stack streams through BlockStreamer.
    """

    STACKS = ("blocks",)

    def __init__(self, params, cfg, prefetch: int = 2, device=None,
                 resident=None, sources=None):
        from sdtpu.models.wan import wan_block_forward, wan_head, wan_prologue

        self.cfg = cfg
        if params is not None:
            self.resident, self.blocks_host = split_stacked_params(params, "blocks")
        else:
            self.resident, (self.blocks_host,) = resident, sources
        if device is not None:
            self.resident = {
                k: jax.device_put(v, device) for k, v in self.resident.items()
            }

        def _prologue(p, x, timesteps, context, clip_fea):
            return wan_prologue(p, x, timesteps, context, clip_fea, cfg)

        def _block(bp, h, e0, ctx, rot, context_img_len):
            return wan_block_forward(
                bp, h, e0, ctx, rot, cfg, context_img_len=context_img_len
            )

        def _head(p, h, e, dims):
            return wan_head(p, h, e, cfg, dims)

        self._prologue = jax.jit(_prologue)
        self._head_jit = jax.jit(_head, static_argnames=("dims",))
        # context_img_len is a static python int → jit per distinct value
        self._streamers: Dict[int, BlockStreamer] = {}
        self._prefetch = prefetch
        self._device = device
        self._block_local = _block
        self.last_peak_blocks = 0

    def __call__(self, x, timesteps, context, clip_fea=None):
        # static facts derived host-side (jit outputs are arrays, not ints)
        cfg = self.cfg
        cil = (
            clip_fea.shape[1]
            if (clip_fea is not None and cfg.model_type == "i2v")
            else 0
        )
        b, t, hh, ww, _ = x.shape
        pt, ph, pw = cfg.patch_size
        dims = (b, t, hh, ww, -(-t // pt), -(-hh // ph), -(-ww // pw))

        img, e, e0, ctx, _, rot, _ = self._prologue(
            self.resident, x, timesteps, context, clip_fea
        )
        streamer = self._streamers.get(cil)
        if streamer is None:

            def block_fn(bp, h, e0, ctx, rot, _cil=cil):
                return self._block_local(bp, h, e0, ctx, rot, _cil)

            streamer = BlockStreamer(block_fn, prefetch=self._prefetch,
                                     device=self._device)
            self._streamers[cil] = streamer
        h = streamer(self.blocks_host, img, e0, ctx, rot)
        self.last_peak_blocks = streamer.peak_resident_blocks
        return self._head_jit(self.resident, h, e, dims)
