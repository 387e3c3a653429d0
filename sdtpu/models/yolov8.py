"""YOLOv8 detector (ADetailer face/hand/person models).

Reference analog: YOLOv8Runner (src/model/detector/yolov8.h:319; upstream
ultralytics YOLOv8).  Checkpoints are BN-fused safetensors produced by the
reference's convert_yolov8_to_safetensors.py: ``model.N.conv.weight`` /
``model.N.{cv1,cv2,m.K.cv1,…}.conv.weight`` / ``model.22.{cv2,cv3}.{i}.{j}``.

Backbone: Conv(s2)×2 → C2f → Conv(s2) → C2f → … → SPPF; PAN neck with nearest
upsampling; decoupled detect head with DFL box regression (reg_max bins per
side).  Output: [N_anchors, 4*reg_max + num_classes]; host-side decode
(softmax-DFL → ltrb, anchors × stride) + NMS.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from sdtpu.ops import conv2d
from sdtpu.ops.basic import silu


@dataclasses.dataclass(frozen=True)
class YOLOv8Config:
    out_channels: Tuple[int, ...] = ()  # per layer index 0..21 (sparse)
    hidden: Dict[int, int] = None
    repeats: Dict[int, int] = None
    reg_max: int = 16
    num_classes: int = 1


def detect_yolov8_config(shapes: Dict[str, tuple]) -> YOLOv8Config:
    """Config from fused-checkpoint shapes (reference yolov8.h:25-80)."""
    def conv_out(name):
        s = shapes.get(name)
        return int(s[0]) if s else 0

    out = {}
    for layer in (0, 1, 3, 5, 7, 16, 19):
        out[layer] = conv_out(f"model.{layer}.conv.weight")
    hidden, repeats = {}, {}
    for layer in (2, 4, 6, 8, 12, 15, 18, 21):
        out[layer] = conv_out(f"model.{layer}.cv2.conv.weight")
        hidden[layer] = conv_out(f"model.{layer}.cv1.conv.weight") // 2
        r = 0
        while f"model.{layer}.m.{r}.cv1.conv.weight" in shapes:
            r += 1
        repeats[layer] = r
    out[9] = conv_out("model.9.cv2.conv.weight")
    box_out = conv_out("model.22.cv2.0.2.weight")
    return YOLOv8Config(
        out_channels=tuple(out.get(i, 0) for i in range(22)),
        hidden=hidden,
        repeats=repeats,
        reg_max=box_out // 4 if box_out else 16,
        num_classes=conv_out("model.22.cv3.0.2.weight") or 1,
    )


def _conv(p, pre, x, stride=1):
    w = p[f"{pre}.conv.weight"]
    pad = w.shape[2] // 2
    return silu(conv2d(x, w, p[f"{pre}.conv.bias"], stride=stride, padding=pad))


def _bottleneck(p, pre, x, shortcut):
    h = _conv(p, f"{pre}.cv2", _conv(p, f"{pre}.cv1", x))
    return x + h if shortcut else h


def _c2f(p, pre, x, hidden, repeats, shortcut):
    h = _conv(p, f"{pre}.cv1", x)
    y0, y1 = h[..., :hidden], h[..., hidden:]
    parts = [y0, y1]
    last = y1
    for i in range(repeats):
        last = _bottleneck(p, f"{pre}.m.{i}", last, shortcut)
        parts.append(last)
    return _conv(p, f"{pre}.cv2", jnp.concatenate(parts, axis=-1))


def _sppf(p, pre, x):
    import jax

    x = _conv(p, f"{pre}.cv1", x)

    def pool(v):
        return jax.lax.reduce_window(
            v, -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
            [(0, 0), (2, 2), (2, 2), (0, 0)],
        )

    y1 = pool(x)
    y2 = pool(y1)
    y3 = pool(y2)
    return _conv(p, f"{pre}.cv2", jnp.concatenate([x, y1, y2, y3], axis=-1))


def _upsample2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def yolov8_forward(p, x: jnp.ndarray, cfg: YOLOv8Config) -> jnp.ndarray:
    """x: [B, H, W, 3] in [0,1] (H,W multiples of 32) →
    [B, N_anchors, 4*reg_max + nc] raw predictions (P3+P4+P5 order)."""
    oc, hid, rep = cfg.out_channels, cfg.hidden, cfg.repeats
    x0 = _conv(p, "model.0", x, stride=2)
    x1 = _conv(p, "model.1", x0, stride=2)
    x2 = _c2f(p, "model.2", x1, hid[2], rep[2], True)
    x3 = _conv(p, "model.3", x2, stride=2)
    x4 = _c2f(p, "model.4", x3, hid[4], rep[4], True)
    x5 = _conv(p, "model.5", x4, stride=2)
    x6 = _c2f(p, "model.6", x5, hid[6], rep[6], True)
    x7 = _conv(p, "model.7", x6, stride=2)
    x8 = _c2f(p, "model.8", x7, hid[8], rep[8], True)
    x9 = _sppf(p, "model.9", x8)

    x12 = _c2f(p, "model.12", jnp.concatenate([_upsample2(x9), x6], axis=-1),
               hid[12], rep[12], False)
    x15 = _c2f(p, "model.15", jnp.concatenate([_upsample2(x12), x4], axis=-1),
               hid[15], rep[15], False)
    x16 = _conv(p, "model.16", x15, stride=2)
    x18 = _c2f(p, "model.18", jnp.concatenate([x16, x12], axis=-1),
               hid[18], rep[18], False)
    x19 = _conv(p, "model.19", x18, stride=2)
    x21 = _c2f(p, "model.21", jnp.concatenate([x19, x9], axis=-1),
               hid[21], rep[21], False)

    outs = []
    for i, feat in enumerate((x15, x18, x21)):
        box = _conv(p, f"model.22.cv2.{i}.1", _conv(p, f"model.22.cv2.{i}.0", feat))
        box = conv2d(box, p[f"model.22.cv2.{i}.2.weight"], p[f"model.22.cv2.{i}.2.bias"], padding=0)
        cls = _conv(p, f"model.22.cv3.{i}.1", _conv(p, f"model.22.cv3.{i}.0", feat))
        cls = conv2d(cls, p[f"model.22.cv3.{i}.2.weight"], p[f"model.22.cv3.{i}.2.bias"], padding=0)
        o = jnp.concatenate([box, cls], axis=-1)
        outs.append(o.reshape(o.shape[0], -1, o.shape[-1]))
    return jnp.concatenate(outs, axis=1)


def decode_detections(
    raw: np.ndarray,
    input_size: int,
    cfg: YOLOv8Config,
    conf_threshold: float = 0.3,
    iou_threshold: float = 0.5,
) -> List[Tuple[float, float, float, float, float, int]]:
    """Host-side decode: DFL softmax → ltrb distances, anchor grids per
    stride (8/16/32), sigmoid class scores, NMS.  Returns
    [(x1, y1, x2, y2, score, cls)] in input pixels."""
    raw = np.asarray(raw[0], dtype=np.float32)  # [N, 4*reg_max + nc]
    rm = cfg.reg_max
    # anchor centers per scale
    centers = []
    strides = []
    for s in (8, 16, 32):
        g = input_size // s
        yy, xx = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
        c = np.stack([xx.reshape(-1) + 0.5, yy.reshape(-1) + 0.5], axis=-1)
        centers.append(c)
        strides.append(np.full((g * g,), s, dtype=np.float32))
    centers = np.concatenate(centers, axis=0)
    strides = np.concatenate(strides, axis=0)

    box_logits = raw[:, : 4 * rm].reshape(-1, 4, rm)
    e = np.exp(box_logits - box_logits.max(axis=-1, keepdims=True))
    probs = e / e.sum(axis=-1, keepdims=True)
    dist = (probs * np.arange(rm, dtype=np.float32)).sum(axis=-1)  # [N, 4] ltrb
    scores_all = 1.0 / (1.0 + np.exp(-raw[:, 4 * rm :]))
    cls_ids = scores_all.argmax(axis=-1)
    scores = scores_all.max(axis=-1)

    keep = scores >= conf_threshold
    if not keep.any():
        return []
    dist, c, s = dist[keep], centers[keep], strides[keep]
    scores, cls_ids = scores[keep], cls_ids[keep]
    x1 = (c[:, 0] - dist[:, 0]) * s
    y1 = (c[:, 1] - dist[:, 1]) * s
    x2 = (c[:, 0] + dist[:, 2]) * s
    y2 = (c[:, 1] + dist[:, 3]) * s
    boxes = np.stack([x1, y1, x2, y2], axis=-1)

    # NMS
    order = scores.argsort()[::-1]
    out = []
    while order.size:
        i = order[0]
        out.append((float(x1[i]), float(y1[i]), float(x2[i]), float(y2[i]),
                    float(scores[i]), int(cls_ids[i])))
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(area_i + area_r - inter, 1e-9)
        order = rest[iou <= iou_threshold]
    return out


def detect_objects(params, image: np.ndarray, cfg: YOLOv8Config,
                   input_size: int = 640, conf_threshold: float = 0.3,
                   iou_threshold: float = 0.5):
    """image: [H, W, 3] uint8/float → detections in ORIGINAL image pixels
    (letterbox resize like the reference detailer)."""
    import jax

    img = np.asarray(image, dtype=np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    h, w = img.shape[:2]
    scale = input_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = np.asarray(
        jax.image.resize(jnp.asarray(img), (nh, nw, 3), method="bilinear")
    )
    canvas = np.full((input_size, input_size, 3), 0.5, dtype=np.float32)
    canvas[:nh, :nw] = resized
    raw = yolov8_forward(params, jnp.asarray(canvas[None]), cfg)
    dets = decode_detections(np.asarray(raw), input_size, cfg,
                             conf_threshold, iou_threshold)
    out = []
    for x1, y1, x2, y2, score, cls in dets:
        out.append((
            max(x1 / scale, 0.0), max(y1 / scale, 0.0),
            min(x2 / scale, float(w)), min(y2 / scale, float(h)), score, cls,
        ))
    return out


def init_yolov8_params(cfg: YOLOv8Config, seed: int = 0, dtype=jnp.float32):
    g = np.random.default_rng(seed)
    p = {}

    def conv(name, o, i, k):
        p[f"{name}.weight"] = jnp.asarray(
            g.standard_normal((o, i, k, k), dtype=np.float32) * 0.05, dtype=dtype
        )
        p[f"{name}.bias"] = jnp.zeros((o,), dtype=dtype)

    def yconv(name, o, i, k=3):
        conv(f"{name}.conv", o, i, k)

    def c2f(layer, cin):
        h, r = cfg.hidden[layer], cfg.repeats[layer]
        yconv(f"model.{layer}.cv1", 2 * h, cin, 1)
        yconv(f"model.{layer}.cv2", cfg.out_channels[layer], h * (2 + r), 1)
        for i in range(r):
            yconv(f"model.{layer}.m.{i}.cv1", h, h)
            yconv(f"model.{layer}.m.{i}.cv2", h, h)

    oc = cfg.out_channels
    yconv("model.0", oc[0], 3)
    yconv("model.1", oc[1], oc[0])
    c2f(2, oc[1])
    yconv("model.3", oc[3], oc[2])
    c2f(4, oc[3])
    yconv("model.5", oc[5], oc[4])
    c2f(6, oc[5])
    yconv("model.7", oc[7], oc[6])
    c2f(8, oc[7])
    yconv("model.9.cv1", oc[8] // 2, oc[8], 1)
    yconv("model.9.cv2", oc[9], oc[8] * 2, 1)
    c2f(12, oc[9] + oc[6])
    c2f(15, oc[12] + oc[4])
    yconv("model.16", oc[16], oc[15])
    c2f(18, oc[16] + oc[12])
    yconv("model.19", oc[19], oc[18])
    c2f(21, oc[19] + oc[9])
    bch = max(16, oc[15] // 4)
    cch = max(cfg.num_classes, oc[15])
    for i, cin in enumerate((oc[15], oc[18], oc[21])):
        yconv(f"model.22.cv2.{i}.0", bch, cin)
        yconv(f"model.22.cv2.{i}.1", bch, bch)
        conv(f"model.22.cv2.{i}.2", 4 * cfg.reg_max, bch, 1)
        yconv(f"model.22.cv3.{i}.0", cch, cin)
        yconv(f"model.22.cv3.{i}.1", cch, cch)
        conv(f"model.22.cv3.{i}.2", cfg.num_classes, cch, 1)
    return p
