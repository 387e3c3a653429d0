"""Test-only torch ESRGAN (RRDBNet) + YOLOv8 references (transcribed from
the reference C++ math, src/model/esrgan.hpp:227 and
src/model/detector/yolov8.h:319).  Consume the same checkpoint-named param
dicts as sdtpu.models.esrgan / sdtpu.models.yolov8."""
import torch
import torch.nn.functional as F


def _conv(p, name, x, stride=1, padding=1):
    y = F.conv2d(x.permute(0, 3, 1, 2), p[f"{name}.weight"],
                 p.get(f"{name}.bias"), stride=stride, padding=padding)
    return y.permute(0, 2, 3, 1)


# -------------------------------------------------------------------- ESRGAN


def _lrelu(x):
    return F.leaky_relu(x, 0.2)


def _rdb(p, pre, x):
    x1 = _lrelu(_conv(p, f"{pre}.conv1", x))
    x2 = _lrelu(_conv(p, f"{pre}.conv2", torch.cat([x, x1], -1)))
    x3 = _lrelu(_conv(p, f"{pre}.conv3", torch.cat([x, x1, x2], -1)))
    x4 = _lrelu(_conv(p, f"{pre}.conv4", torch.cat([x, x1, x2, x3], -1)))
    x5 = _conv(p, f"{pre}.conv5", torch.cat([x, x1, x2, x3, x4], -1))
    return x5 * 0.2 + x


def _rrdb(p, pre, x):
    out = _rdb(p, f"{pre}.rdb1", x)
    out = _rdb(p, f"{pre}.rdb2", out)
    out = _rdb(p, f"{pre}.rdb3", out)
    return out * 0.2 + x


def esrgan_forward_torch(p, x, cfg):
    feat = _conv(p, "conv_first", x)
    body = feat
    for i in range(cfg.num_block):
        body = _rrdb(p, f"body.{i}", body)
    body = _conv(p, "conv_body", body)
    feat = feat + body
    feat = feat.repeat_interleave(2, 1).repeat_interleave(2, 2)
    feat = _lrelu(_conv(p, "conv_up1", feat))
    feat = feat.repeat_interleave(2, 1).repeat_interleave(2, 2)
    feat = _lrelu(_conv(p, "conv_up2", feat))
    feat = _lrelu(_conv(p, "conv_hr", feat))
    return _conv(p, "conv_last", feat)


# -------------------------------------------------------------------- YOLOv8


def _yconv(p, pre, x, stride=1):
    w = p[f"{pre}.conv.weight"]
    pad = w.shape[2] // 2
    return F.silu(_conv(p, f"{pre}.conv", x, stride=stride, padding=pad))


def _bottleneck(p, pre, x, shortcut):
    h = _yconv(p, f"{pre}.cv2", _yconv(p, f"{pre}.cv1", x))
    return x + h if shortcut else h


def _c2f(p, pre, x, hidden, repeats, shortcut):
    h = _yconv(p, f"{pre}.cv1", x)
    parts = [h[..., :hidden], h[..., hidden:]]
    last = parts[1]
    for i in range(repeats):
        last = _bottleneck(p, f"{pre}.m.{i}", last, shortcut)
        parts.append(last)
    return _yconv(p, f"{pre}.cv2", torch.cat(parts, dim=-1))


def _sppf(p, pre, x):
    x = _yconv(p, f"{pre}.cv1", x)

    def pool(v):
        return F.max_pool2d(v.permute(0, 3, 1, 2), 5, stride=1,
                            padding=2).permute(0, 2, 3, 1)

    y1 = pool(x)
    y2 = pool(y1)
    y3 = pool(y2)
    return _yconv(p, f"{pre}.cv2", torch.cat([x, y1, y2, y3], dim=-1))


def _upsample2(x):
    return x.repeat_interleave(2, dim=1).repeat_interleave(2, dim=2)


def yolov8_forward_torch(p, x, cfg):
    hid, rep = cfg.hidden, cfg.repeats
    x0 = _yconv(p, "model.0", x, stride=2)
    x1 = _yconv(p, "model.1", x0, stride=2)
    x2 = _c2f(p, "model.2", x1, hid[2], rep[2], True)
    x3 = _yconv(p, "model.3", x2, stride=2)
    x4 = _c2f(p, "model.4", x3, hid[4], rep[4], True)
    x5 = _yconv(p, "model.5", x4, stride=2)
    x6 = _c2f(p, "model.6", x5, hid[6], rep[6], True)
    x7 = _yconv(p, "model.7", x6, stride=2)
    x8 = _c2f(p, "model.8", x7, hid[8], rep[8], True)
    x9 = _sppf(p, "model.9", x8)

    x12 = _c2f(p, "model.12", torch.cat([_upsample2(x9), x6], dim=-1),
               hid[12], rep[12], False)
    x15 = _c2f(p, "model.15", torch.cat([_upsample2(x12), x4], dim=-1),
               hid[15], rep[15], False)
    x16 = _yconv(p, "model.16", x15, stride=2)
    x18 = _c2f(p, "model.18", torch.cat([x16, x12], dim=-1),
               hid[18], rep[18], False)
    x19 = _yconv(p, "model.19", x18, stride=2)
    x21 = _c2f(p, "model.21", torch.cat([x19, x9], dim=-1),
               hid[21], rep[21], False)

    outs = []
    for i, feat in enumerate((x15, x18, x21)):
        box = _yconv(p, f"model.22.cv2.{i}.1",
                     _yconv(p, f"model.22.cv2.{i}.0", feat))
        box = _conv(p, f"model.22.cv2.{i}.2", box, padding=0)
        cls = _yconv(p, f"model.22.cv3.{i}.1",
                     _yconv(p, f"model.22.cv3.{i}.0", feat))
        cls = _conv(p, f"model.22.cv3.{i}.2", cls, padding=0)
        o = torch.cat([box, cls], dim=-1)
        outs.append(o.reshape(o.shape[0], -1, o.shape[-1]))
    return torch.cat(outs, dim=1)
