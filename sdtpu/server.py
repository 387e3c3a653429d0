"""HTTP server exposing the reference's three API families
(examples/server/routes_{sdcpp,sdapi,openai}.cpp):

  native:  POST /sdcpp/v1/img_gen, GET /sdcpp/v1/jobs/<id>,
           POST /sdcpp/v1/jobs/<id>/cancel, GET /sdcpp/v1/capabilities
  A1111:   POST /sdapi/v1/txt2img, POST /sdapi/v1/img2img,
           GET /sdapi/v1/{samplers,schedulers,sd-models,options,progress}
  OpenAI:  POST /v1/images/generations, GET /v1/models

Single generation context guarded by a mutex (runtime.h:48 semantics); the
native family is async with a job queue + cancellation.
"""
from __future__ import annotations

import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

from sdtpu.config import GenerationParams
from sdtpu.diffusion.samplers import SAMPLE_METHODS
from sdtpu.diffusion.schedule import SCHEDULERS
from sdtpu.utils import log_info


class Job:
    def __init__(self, params: dict):
        self.id = uuid.uuid4().hex[:16]
        self.params = params
        self.status = "queued"  # queued | running | completed | failed | cancelled
        self.images = []
        self.error = None
        self.cancel_requested = threading.Event()
        self.created = time.time()
        self.step = 0
        self.steps = 0

    @property
    def progress(self) -> float:
        return self.step / self.steps if self.steps else 0.0


class JobManager:
    """Async worker queue (reference async_jobs.h:31-50)."""

    def __init__(self, pipeline, max_jobs: int = 64,
                 lora_dir: str = "", upscaler_dir: str = ""):
        self.pipeline = pipeline
        self.jobs: Dict[str, Job] = {}
        self.queue = []
        self.lock = threading.Lock()
        self.wake = threading.Condition(self.lock)
        self.ctx_mutex = threading.Lock()  # one generation at a time
        self.lora_dir = lora_dir  # reference server lora dir cache
        self.upscaler_dir = upscaler_dir
        self.esrgan_cache: Dict[str, dict] = {}  # hr_upscaler model params
        self.options: Dict[str, object] = {"sd_model_checkpoint": "loaded"}
        self.worker = threading.Thread(target=self._run, daemon=True)
        self.worker.start()

    def list_model_files(self, directory: str):
        """Checkpoint files in a directory (reference lora/upscaler dir
        caches, examples/server/routes_sdapi.cpp)."""
        import os

        if not directory or not os.path.isdir(directory):
            return []
        out = []
        for fn in sorted(os.listdir(directory)):
            if fn.lower().endswith((".safetensors", ".ckpt", ".pt", ".pth", ".gguf")):
                out.append(os.path.splitext(fn)[0])
        return out

    def submit(self, params: dict) -> Job:
        job = Job(params)
        with self.wake:
            self.jobs[job.id] = job
            self.queue.append(job.id)
            self.wake.notify()
        return job

    def cancel(self, job_id: str) -> bool:
        with self.lock:
            job = self.jobs.get(job_id)
            if job is None:
                return False
            if job.status == "queued":
                self.queue.remove(job_id)
                job.status = "cancelled"
            else:
                job.cancel_requested.set()
            return True

    def _run(self):
        while True:
            with self.wake:
                while not self.queue:
                    self.wake.wait()
                job = self.jobs[self.queue.pop(0)]
                job.status = "running"
            try:
                with self.ctx_mutex:
                    if job.cancel_requested.is_set():
                        job.status = "cancelled"
                        continue
                    job.images = run_generation(
                        self.pipeline, job.params, job=job,
                        lora_dir=self.lora_dir,
                        upscaler_dir=self.upscaler_dir,
                        esrgan_cache=self.esrgan_cache)
                    job.status = (
                        "cancelled" if job.cancel_requested.is_set() else "completed"
                    )
            except Exception as e:  # noqa: BLE001 — job error surface
                job.error = str(e)
                job.status = "failed"


def flatten_native_params(data: dict) -> dict:
    """Flatten the native nested schema (sample_params / guidance / slg /
    hires objects, reference make_sample_params_json routes_sdcpp.cpp:80-104)
    onto the flat request keys params_from_json reads.  Flat keys already
    present win (they came from the outer body)."""
    out = dict(data)
    sp = data.get("sample_params") or {}
    for k in ("scheduler", "sample_method", "sample_steps", "eta",
              "shifted_timestep", "flow_shift"):
        if k in sp and sp[k] is not None:
            out.setdefault("schedule" if k == "scheduler" else k, sp[k])
    g = sp.get("guidance")
    if not isinstance(g, dict) and isinstance(data.get("guidance"), dict):
        g = data["guidance"]
    if isinstance(g, dict):
        if g.get("txt_cfg") is not None:
            out.setdefault("cfg_scale", g["txt_cfg"])
        if g.get("img_cfg") is not None:
            out.setdefault("img_cfg_scale", g["img_cfg"])
        if g.get("distilled_guidance") is not None:
            out.setdefault("guidance", g["distilled_guidance"])
        slg = g.get("slg") or {}
        if slg.get("scale") is not None:
            out.setdefault("slg_scale", slg["scale"])
        if slg.get("layers"):
            out.setdefault("skip_layers", slg["layers"])
        if slg.get("layer_start") is not None:
            out.setdefault("slg_start", slg["layer_start"])
        if slg.get("layer_end") is not None:
            out.setdefault("slg_end", slg["layer_end"])
    hr = data.get("hires") or {}
    if hr.get("enabled"):
        out.setdefault("enable_hr", True)
        for src, dst in (("upscaler", "hr_upscaler"), ("scale", "hr_scale"),
                         ("target_width", "hr_resize_x"),
                         ("target_height", "hr_resize_y"),
                         ("steps", "hr_steps"),
                         ("denoising_strength", "denoising_strength")):
            if hr.get(src) is not None:
                out.setdefault(dst, hr[src])
    if isinstance(out.get("guidance"), dict):
        out.pop("guidance")
    return out


_EXTRA_ARGS_RE = None


def extract_extra_args(data: dict) -> dict:
    """Pull a ``<sd_cpp_extra_args>{json}</sd_cpp_extra_args>`` block out of
    the prompt and merge its native-schema fields over the request (reference
    extract_and_remove_sd_cpp_extra_args, routes_openai.cpp:11-21 + api.md
    "sd_cpp_extra_args").  Raises ValueError on malformed JSON."""
    global _EXTRA_ARGS_RE
    import re

    if _EXTRA_ARGS_RE is None:
        _EXTRA_ARGS_RE = re.compile(
            r"<sd_cpp_extra_args>(.*?)</sd_cpp_extra_args>", re.S)
    prompt = data.get("prompt", "")
    if not isinstance(prompt, str):
        return data
    m = _EXTRA_ARGS_RE.search(prompt)
    if not m:
        return data
    try:
        extra = json.loads(m.group(1))
    except json.JSONDecodeError as e:
        raise ValueError(f"invalid sd_cpp_extra_args: {e}")
    if not isinstance(extra, dict):
        raise ValueError("sd_cpp_extra_args must be a json object")
    out = dict(data)
    out["prompt"] = _EXTRA_ARGS_RE.sub("", prompt).strip()
    out.update(extra)  # native fields override the outer compat body
    return flatten_native_params(out)


def params_from_json(data: dict) -> GenerationParams:
    """Map request JSON (native/A1111 field names) onto GenerationParams."""
    data = flatten_native_params(data)
    seed = int(data.get("seed", 42))
    if seed < 0:  # A1111 convention: -1 = randomize (api.md seed field)
        import random

        seed = random.randrange(1 << 31)
    return GenerationParams(
        prompt=data.get("prompt", ""),
        negative_prompt=data.get("negative_prompt", ""),
        width=int(data.get("width", 512)),
        height=int(data.get("height", 512)),
        sample_steps=int(data.get("sample_steps", data.get("steps", 20))),
        cfg_scale=float(data.get("cfg_scale", 7.0)),
        guidance=float(data.get("guidance", 3.5)),
        seed=seed,
        batch_count=int(data.get("batch_count", data.get("batch_size", 1))),
        sample_method=str(
            data.get("sample_method", data.get("sampler_name", "euler_a"))
        ).lower().replace(" ", "_"),
        schedule=str(data.get("schedule", data.get("scheduler", "discrete"))).lower(),
        clip_skip=int(data.get("clip_skip", -1)),
        strength=float(data.get("strength", data.get("denoising_strength", 0.75))),
        eta=float(data.get("eta", 0.0)),
        slg_scale=float(data.get("slg_scale", 0.0)),
        skip_layers=tuple(data.get("skip_layers", (7, 8, 9))),
        slg_start=float(data.get("slg_start", 0.01)),
        slg_end=float(data.get("slg_end", 0.2)),
        img_cfg_scale=(float(data["img_cfg_scale"])
                       if data.get("img_cfg_scale") is not None else None),
    )


def _resolve_model_file(directory: str, name: str) -> Optional[str]:
    import os

    if not directory:
        return None
    for ext in ("", ".safetensors", ".ckpt", ".pt", ".pth", ".gguf"):
        path = os.path.join(directory, name + ext)
        if os.path.isfile(path):
            return path
    return None


def apply_structured_loras(pipeline, data: dict, lora_dir: str):
    """Structured `lora` request field (api.md: server APIs take LoRA as
    structured fields, never <lora:...> prompt tags): list of
    {name, multiplier} resolved against --lora-model-dir and applied via
    set_loras (re-derives from the pristine base each call)."""
    spec = data.get("lora")
    if spec is None:
        return
    from sdtpu.io.model_loader import read_checkpoint_file

    loras = []
    for item in spec:
        name = item.get("name", "")
        mult = float(item.get("multiplier", item.get("strength", 1.0)))
        path = _resolve_model_file(lora_dir, name)
        if path is None:
            raise ValueError(f"lora {name!r} not found in lora dir")
        loras.append((read_checkpoint_file(path), mult))
    pipeline.set_loras(loras)


def run_generation(pipeline, data: dict, job: Optional[Job] = None,
                   lora_dir: str = "", upscaler_dir: str = "",
                   esrgan_cache: Optional[dict] = None):
    from sdtpu.utils.image import base64_png_to_image, build_parameters_text, image_to_base64

    data = flatten_native_params(data)
    gp = params_from_json(data)
    out_fmt = str(data.get("output_format", "png")).lower()
    out_q = int(data.get("output_compression", 90) or 90)
    apply_structured_loras(pipeline, data, lora_dir)
    init_image = mask_image = None
    init_b64 = data.get("init_images") or data.get("init_image")
    if isinstance(init_b64, list):
        init_b64 = init_b64[0] if init_b64 else None
    if init_b64:
        init_image = base64_png_to_image(init_b64)
    if data.get("mask"):
        mask_image = base64_png_to_image(data["mask"])[..., 0]
    if data.get("video_frames") or data.get("frames"):
        # vid_gen: result is one base64 animated WebP per batch item
        # (reference POST /sdcpp/v1/vid_gen, routes_sdcpp.cpp)
        import base64
        import io as _io

        frames = int(data.get("video_frames", data.get("frames", 81)))
        fps = int(data.get("fps", 16))
        vkw = {}
        from sdtpu.pipeline import LTXAVPipeline

        if isinstance(pipeline, LTXAVPipeline):
            vkw = {"fps": fps, "audio": bool(data.get("audio", True))}
        vres = pipeline.generate_video(gp, frames=frames, **vkw)
        out = []
        for clip in vres.frames:
            from PIL import Image

            imgs = [Image.fromarray(f) for f in clip]
            buf = _io.BytesIO()
            imgs[0].save(buf, format="WEBP", save_all=True, append_images=imgs[1:],
                         duration=max(1, round(1000 / fps)), loop=0)
            out.append(base64.b64encode(buf.getvalue()).decode())
        if getattr(vres, "audio", None) is not None:
            # trailing element: {"audio": base64 WAV, "sample_rate": N}
            import tempfile

            from sdtpu.utils.video import write_wav

            with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                write_wav(f.name, vres.audio, vres.sample_rate)
                wav_b64 = base64.b64encode(open(f.name, "rb").read()).decode()
            out.append({"audio": wav_b64, "sample_rate": vres.sample_rate})
        return out

    kw = {}
    if data.get("ref_images_np"):
        # decoded reference images (OpenAI /v1/images/edits → ref-image
        # conditioning, reference routes_openai.cpp:160-174)
        kw["ref_images"] = data["ref_images_np"]
    elif data.get("extra_images"):
        # A1111-route ref images as base64/data-URLs (api.md extra_images)
        kw["ref_images"] = [base64_png_to_image(s)
                            for s in data["extra_images"]]
    if data.get("mask_np") is not None:
        mask_image = data["mask_np"]
    if job is not None:
        # per-step progress + mid-run cancellation (reference
        # async_jobs.h:44-46 + cancellation polling, stable-diffusion.cpp:2532)
        def _progress(step, steps, _x):
            job.step, job.steps = step, steps

        kw["progress_callback"] = _progress
        kw["cancel_check"] = job.cancel_requested.is_set
    if data.get("enable_hr") and init_image is None:
        # highres fix on txt2img (api.md enable_hr/hr_*; reference
        # stable-diffusion.cpp:5523-5642).  hr_upscaler: a Latent* mode uses
        # latent-space resize; a model name from --upscaler-dir runs ESRGAN.
        hr_name = str(data.get("hr_upscaler", "Latent"))
        esr, upscaler = None, "latent"
        if not hr_name.lower().startswith(("latent", "lanczos", "nearest",
                                           "none")):
            path = _resolve_model_file(upscaler_dir, hr_name)
            if path is not None:
                if esrgan_cache is not None and path in esrgan_cache:
                    esr = esrgan_cache[path]
                else:
                    from sdtpu.cli import _load_esrgan

                    esr, _cfg = _load_esrgan(path)
                    if esrgan_cache is not None:
                        esrgan_cache[path] = esr
                upscaler = "esrgan"
        res = pipeline.txt2img_hires(
            gp,
            hires_scale=float(data.get("hr_scale", 2.0) or 2.0),
            hires_steps=int(data.get("hr_steps", 0) or 0) or None,
            hires_strength=float(data.get("denoising_strength", 0.7)),
            upscaler=upscaler,
            esrgan_params=esr,
            hires_width=int(data.get("hr_resize_x", 0) or 0),
            hires_height=int(data.get("hr_resize_y", 0) or 0),
        )
    else:
        res = pipeline.generate(gp, init_image=init_image,
                                mask_image=mask_image, **kw)
    out = []
    for i, img in enumerate(res.images):
        meta = build_parameters_text(
            GenerationParams(**{**gp.__dict__, "seed": res.seeds[i]})
        )
        out.append(image_to_base64(img, fmt=out_fmt, quality=out_q,
                                   parameters=meta))
    return out


# Embedded web UI (reference: frontend submodule baked into
# gen_index_html.h, served by routes_index.cpp).  The full client
# lives in sdtpu/webui.py.
from sdtpu.webui import INDEX_HTML as _INDEX_HTML  # noqa: E402


def make_handler(manager: JobManager):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through our logger
            log_info("http: " + fmt % args)

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_multipart(self):
            """multipart/form-data → (fields: dict[str,str],
            files: dict[str, list[bytes]]); None + 400 reply on bad input."""
            from email.parser import BytesParser
            from email.policy import default as _default_policy

            ctype = self.headers.get("Content-Type", "")
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            try:
                msg = BytesParser(policy=_default_policy).parsebytes(
                    b"Content-Type: " + ctype.encode() + b"\r\n\r\n" + body
                )
                fields, files = {}, {}
                for part in msg.iter_parts():
                    name = part.get_param("name", header="content-disposition")
                    if name is None:
                        continue
                    payload = part.get_payload(decode=True) or b""
                    if part.get_filename():
                        files.setdefault(name, []).append(payload)
                    else:
                        fields[name] = payload.decode("utf-8", "replace")
                return fields, files
            except Exception as e:  # malformed multipart
                self._json({"error": f"invalid multipart body: {e}"}, 400)
                return None

        def _read_json(self) -> Optional[dict]:
            """→ parsed body, or None after replying 400 to a bad payload."""
            n = int(self.headers.get("Content-Length", 0))
            if n == 0:
                return {}
            try:
                body = json.loads(self.rfile.read(n))
            except (json.JSONDecodeError, UnicodeDecodeError) as e:
                self._json({"error": f"invalid json: {e}"}, 400)
                return None
            if not isinstance(body, dict):
                self._json({"error": "request body must be a json object"}, 400)
                return None
            return body

        # ----------------------------------------------------------- GET
        def do_GET(self):
            p = self.path.split("?")[0]
            if p == "/sdcpp/v1/capabilities":
                self._json(
                    {
                        "modes": ["img_gen", "vid_gen"],
                        "samplers": SAMPLE_METHODS,
                        "schedulers": sorted(SCHEDULERS),
                        "version": "sdtpu-0.1",
                    }
                )
            elif p.startswith("/sdcpp/v1/jobs/"):
                job_id = p.rsplit("/", 1)[-1]
                job = manager.jobs.get(job_id)
                if job is None:
                    self._json({"error": "not found"}, 404)
                    return
                out = {
                    "id": job.id,
                    "status": job.status,
                    "error": job.error,
                    "progress": job.progress,
                    "step": job.step,
                    "steps": job.steps,
                }
                if job.status == "completed":
                    out["images"] = job.images
                self._json(out)
            elif p == "/sdapi/v1/samplers":
                self._json([{"name": s, "aliases": [s], "options": {}} for s in SAMPLE_METHODS])
            elif p == "/sdapi/v1/schedulers":
                self._json([{"name": s, "label": s} for s in sorted(SCHEDULERS)])
            elif p == "/sdapi/v1/sd-models":
                self._json([{"title": "loaded", "model_name": "loaded"}])
            elif p == "/sdapi/v1/loras":
                # reference lora dir listing (routes_sdapi.cpp loras route)
                self._json([
                    {"name": n, "alias": n, "path": n}
                    for n in manager.list_model_files(manager.lora_dir)
                ])
            elif p == "/sdapi/v1/latent-upscale-modes":
                # WebUI-compatible latent mode names (api.md; all map onto
                # the latent bilinear resize path here)
                self._json([
                    {"name": n} for n in (
                        "Latent", "Latent (nearest)", "Latent (nearest-exact)",
                        "Latent (antialiased)", "Latent (bicubic)",
                        "Latent (bicubic antialiased)")
                ])
            elif p == "/sdapi/v1/upscalers":
                names = manager.list_model_files(manager.upscaler_dir)
                self._json(
                    [{"name": "Latent", "model_name": None, "scale": 2.0}]
                    + [{"name": n, "model_name": n, "scale": 4.0} for n in names]
                )
            elif p == "/sdapi/v1/options":
                self._json(dict(manager.options))
            elif p == "/sdapi/v1/progress":
                running = [j for j in manager.jobs.values() if j.status == "running"]
                j = running[0] if running else None
                self._json(
                    {
                        "progress": j.progress if j else 0.0,
                        "state": (
                            {"sampling_step": j.step, "sampling_steps": j.steps}
                            if j
                            else {}
                        ),
                    }
                )
            elif p == "/v1/models":
                self._json({"object": "list", "data": [{"id": "sdtpu", "object": "model"}]})
            elif p == "/" or p == "/index.html":
                # embedded web UI (reference gen_index_html.h /
                # routes_index.cpp)
                body = _INDEX_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif p == "/api":
                self._json({"name": "sdtpu server", "apis": ["/sdcpp/v1", "/sdapi/v1", "/v1"]})
            else:
                self._json({"error": "not found"}, 404)

        # ---------------------------------------------------------- POST
        def do_POST(self):
            p = self.path.split("?")[0]
            if p in ("/sdcpp/v1/img_gen", "/sdcpp/v1/vid_gen"):
                data = self._read_json()
                if data is None:
                    return
                if p.endswith("vid_gen"):
                    data.setdefault("video_frames", 81)
                job = manager.submit(data)
                self._json({"id": job.id, "status": job.status}, 202)
            elif p.startswith("/sdcpp/v1/jobs/") and p.endswith("/cancel"):
                job_id = p.split("/")[-2]
                ok = manager.cancel(job_id)
                self._json({"cancelled": ok}, 200 if ok else 404)
            elif p == "/sdapi/v1/options":
                data = self._read_json()
                if data is None:
                    return
                manager.options.update(data)
                self._json({})
            elif p in ("/sdapi/v1/txt2img", "/sdapi/v1/img2img"):
                data = self._read_json()
                if data is None:
                    return
                try:
                    data = extract_extra_args(data)
                    with manager.ctx_mutex:
                        images = run_generation(
                            manager.pipeline, data,
                            lora_dir=manager.lora_dir,
                            upscaler_dir=manager.upscaler_dir,
                            esrgan_cache=manager.esrgan_cache)
                except ValueError as e:
                    self._json({"error": str(e)}, 400)
                    return
                self._json({"images": images, "parameters": data, "info": "{}"})
            elif p == "/v1/images/generations":
                data = self._read_json()
                if data is None:
                    return
                req = {
                    "prompt": data.get("prompt", ""),
                    "batch_count": int(data.get("n", 1)),
                    "output_format": data.get("output_format", "png"),
                    "output_compression": data.get("output_compression", 90),
                }
                size = data.get("size", "512x512")
                if "x" in str(size):
                    w, h = str(size).split("x")
                    req["width"], req["height"] = int(w), int(h)
                try:
                    req = extract_extra_args(req)
                    with manager.ctx_mutex:
                        images = run_generation(
                            manager.pipeline, req,
                            lora_dir=manager.lora_dir,
                            upscaler_dir=manager.upscaler_dir,
                            esrgan_cache=manager.esrgan_cache)
                except ValueError as e:
                    self._json({"error": str(e)}, 400)
                    return
                self._json(
                    {
                        "created": int(time.time()),
                        "output_format": req.get("output_format", "png"),
                        "data": [{"b64_json": b64} for b64 in images],
                    }
                )
            elif p == "/v1/images/edits":
                # OpenAI image edits: multipart form with image[]/image file
                # parts + prompt (+ optional mask) → ref-image conditioned
                # generation (reference routes_openai.cpp:84-174)
                import io as _io

                import numpy as np
                from PIL import Image

                ctype = self.headers.get("Content-Type", "")
                if "multipart/form-data" in ctype:
                    parsed = self._read_multipart()
                    if parsed is None:
                        return
                    fields, files = parsed
                    raw_imgs = files.get("image[]", []) or files.get("image", [])
                    mask_raw = (files.get("mask") or [None])[0]
                    prompt = fields.get("prompt", "")
                    n = int(fields.get("n", 1) or 1)
                    size = fields.get("size", "")
                else:  # JSON fallback: b64-encoded images
                    data = self._read_json()
                    if data is None:
                        return
                    import base64 as _b64

                    imgs = data.get("image", [])
                    if isinstance(imgs, str):
                        imgs = [imgs]
                    raw_imgs = [_b64.b64decode(s) for s in imgs]
                    mask_raw = (
                        _b64.b64decode(data["mask"]) if data.get("mask") else None
                    )
                    prompt = data.get("prompt", "")
                    n = int(data.get("n", 1))
                    size = data.get("size", "")
                if not raw_imgs:
                    self._json({"error": "at least one image[] required"}, 400)
                    return
                refs = [
                    np.asarray(Image.open(_io.BytesIO(b)).convert("RGB"))
                    for b in raw_imgs
                ]
                req = {
                    "prompt": prompt,
                    "batch_count": n,
                    "ref_images_np": refs,
                    "width": refs[0].shape[1],
                    "height": refs[0].shape[0],
                }
                if "multipart/form-data" in ctype:
                    req["output_format"] = fields.get("output_format", "png")
                    req["output_compression"] = fields.get(
                        "output_compression", 90)
                else:
                    req["output_format"] = data.get("output_format", "png")
                    req["output_compression"] = data.get(
                        "output_compression", 90)
                if "x" in str(size):
                    w, h = str(size).split("x")
                    req["width"], req["height"] = int(w), int(h)
                if mask_raw:
                    req["mask_np"] = np.asarray(
                        Image.open(_io.BytesIO(mask_raw)).convert("L")
                    )
                try:
                    req = extract_extra_args(req)
                    with manager.ctx_mutex:
                        images = run_generation(
                            manager.pipeline, req,
                            lora_dir=manager.lora_dir,
                            upscaler_dir=manager.upscaler_dir,
                            esrgan_cache=manager.esrgan_cache)
                except ValueError as e:
                    self._json({"error": str(e)}, 400)
                    return
                self._json(
                    {
                        "created": int(time.time()),
                        "output_format": req.get("output_format", "png"),
                        "data": [{"b64_json": b64} for b64 in images],
                    }
                )
            else:
                self._json({"error": "not found"}, 404)

    return Handler


def serve(pipeline, host: str = "127.0.0.1", port: int = 7860,
          lora_dir: str = "", upscaler_dir: str = ""):
    manager = JobManager(pipeline, lora_dir=lora_dir, upscaler_dir=upscaler_dir)
    server = ThreadingHTTPServer((host, port), make_handler(manager))
    log_info(f"sdtpu server listening on http://{host}:{port}")
    server.serve_forever()


def main(argv=None):
    import argparse

    from sdtpu.cli import build_parser, _load_pipeline

    ap = build_parser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--upscaler-dir", default="",
                    help="dir listed by /sdapi/v1/upscalers")
    args = ap.parse_args(argv)
    pipe, _ = _load_pipeline(args)
    serve(pipe, args.host, args.port, lora_dir=args.lora_model_dir,
          upscaler_dir=args.upscaler_dir)


if __name__ == "__main__":
    main()
