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
                    job.images = run_generation(self.pipeline, job.params, job=job)
                    job.status = (
                        "cancelled" if job.cancel_requested.is_set() else "completed"
                    )
            except Exception as e:  # noqa: BLE001 — job error surface
                job.error = str(e)
                job.status = "failed"


def params_from_json(data: dict) -> GenerationParams:
    """Map request JSON (native/A1111 field names) onto GenerationParams."""
    return GenerationParams(
        prompt=data.get("prompt", ""),
        negative_prompt=data.get("negative_prompt", ""),
        width=int(data.get("width", 512)),
        height=int(data.get("height", 512)),
        sample_steps=int(data.get("sample_steps", data.get("steps", 20))),
        cfg_scale=float(data.get("cfg_scale", 7.0)),
        guidance=float(data.get("guidance", 3.5)),
        seed=int(data.get("seed", 42)),
        batch_count=int(data.get("batch_count", data.get("batch_size", 1))),
        sample_method=str(
            data.get("sample_method", data.get("sampler_name", "euler_a"))
        ).lower().replace(" ", "_"),
        schedule=str(data.get("schedule", data.get("scheduler", "discrete"))).lower(),
        clip_skip=int(data.get("clip_skip", -1)),
        strength=float(data.get("strength", data.get("denoising_strength", 0.75))),
        eta=float(data.get("eta", 0.0)),
    )


def run_generation(pipeline, data: dict, job: Optional[Job] = None):
    from sdtpu.utils.image import base64_png_to_image, build_parameters_text, image_to_base64_png

    gp = params_from_json(data)
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
    if data.get("mask_np") is not None:
        mask_image = data["mask_np"]
    if job is not None:
        # per-step progress + mid-run cancellation (reference
        # async_jobs.h:44-46 + cancellation polling, stable-diffusion.cpp:2532)
        def _progress(step, steps, _x):
            job.step, job.steps = step, steps

        kw["progress_callback"] = _progress
        kw["cancel_check"] = job.cancel_requested.is_set
    res = pipeline.generate(gp, init_image=init_image, mask_image=mask_image, **kw)
    out = []
    for i, img in enumerate(res.images):
        meta = build_parameters_text(
            GenerationParams(**{**gp.__dict__, "seed": res.seeds[i]})
        )
        out.append(image_to_base64_png(img, parameters=meta))
    return out


# Embedded web UI (reference: frontend submodule baked into gen_index_html.h,
# served by routes_index.cpp).  Minimal single-file client of the native
# async API: submit → poll job → render images.
_INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>sdtpu</title>
<style>
body{font-family:system-ui,sans-serif;margin:2rem auto;max-width:720px;
     color:#ddd;background:#16161a}
input,textarea,select{width:100%;box-sizing:border-box;margin:.25rem 0 .75rem;
     background:#232329;color:#eee;border:1px solid #444;border-radius:4px;
     padding:.45rem}
label{font-size:.85rem;color:#aaa}
.row{display:flex;gap:1rem}.row>div{flex:1}
button{background:#4663ff;color:#fff;border:0;border-radius:4px;
     padding:.6rem 1.4rem;font-size:1rem;cursor:pointer}
#status{margin:.75rem 0;color:#8f8}
img{max-width:100%;border-radius:6px;margin-top:.5rem}
</style></head><body>
<h2>sdtpu</h2>
<label>prompt</label><textarea id="p" rows="3">a photograph of an astronaut riding a horse</textarea>
<label>negative prompt</label><textarea id="n" rows="1"></textarea>
<div class="row">
 <div><label>width</label><input id="w" type="number" value="512"></div>
 <div><label>height</label><input id="h" type="number" value="512"></div>
 <div><label>steps</label><input id="s" type="number" value="20"></div>
 <div><label>cfg</label><input id="c" type="number" step="0.5" value="7"></div>
 <div><label>seed</label><input id="seed" type="number" value="42"></div>
</div>
<button onclick="gen()">Generate</button>
<div id="status"></div><div id="out"></div>
<script>
async function gen(){
 const st=document.getElementById('status');
 st.textContent='submitting…';
 const body={prompt:p.value,negative_prompt:n.value,width:+w.value,
   height:+h.value,sample_steps:+s.value,cfg_scale:+c.value,seed:+seed.value};
 const r=await fetch('/sdcpp/v1/img_gen',{method:'POST',
   headers:{'Content-Type':'application/json'},body:JSON.stringify(body)});
 const job=await r.json();
 for(;;){
  const jr=await fetch('/sdcpp/v1/jobs/'+job.id);const j=await jr.json();
  st.textContent=j.status+' '+(j.step||0)+'/'+(j.steps||0);
  if(j.status==='completed'){
   out.innerHTML='';
   for(const b64 of j.images){const im=document.createElement('img');
     im.src='data:image/png;base64,'+b64;out.appendChild(im);}
   break;
  }
  if(j.status==='failed'){st.textContent='failed: '+j.error;break;}
  if(j.status==='cancelled'){break;}
  await new Promise(res=>setTimeout(res,500));
 }
}
</script></body></html>
"""


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
                with manager.ctx_mutex:
                    images = run_generation(manager.pipeline, data)
                self._json({"images": images, "parameters": data, "info": "{}"})
            elif p == "/v1/images/generations":
                data = self._read_json()
                if data is None:
                    return
                req = {
                    "prompt": data.get("prompt", ""),
                    "batch_count": int(data.get("n", 1)),
                }
                size = data.get("size", "512x512")
                if "x" in str(size):
                    w, h = str(size).split("x")
                    req["width"], req["height"] = int(w), int(h)
                with manager.ctx_mutex:
                    images = run_generation(manager.pipeline, req)
                self._json(
                    {
                        "created": int(time.time()),
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
                if "x" in str(size):
                    w, h = str(size).split("x")
                    req["width"], req["height"] = int(w), int(h)
                if mask_raw:
                    req["mask_np"] = np.asarray(
                        Image.open(_io.BytesIO(mask_raw)).convert("L")
                    )
                with manager.ctx_mutex:
                    images = run_generation(manager.pipeline, req)
                self._json(
                    {
                        "created": int(time.time()),
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
