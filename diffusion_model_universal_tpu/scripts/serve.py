"""Sampling server: serve a trained diffusion model over HTTP.

The deployment surface the reference stops short of (its pipeline ends at
`scripts/generate.py` batch generation). TPU-native serving design:

* **One static batch shape.** XLA compiles per shape; a naive
  per-request batch size would recompile on every new ``num_samples``.
  The server compiles the sampler ONCE for ``--serve_batch`` at startup
  (same key-churn-free warmup) and slices each request out of it —
  requests never pay a compile.
* **Mesh-distributed generation.** Sampling runs under
  :func:`parallel.mesh.sampling_scope`, so all local devices share each
  batch (DP via the UNet's "batch" logical axis, TP/SP if configured).
* **Stdlib only** (`http.server` threading server): zero extra
  dependencies, adequate for a single-host model server; put a real
  load balancer in front for fleets.

Endpoints:
    GET  /healthz             → 200 JSON {status, model, batch, devices}
    POST /generate            → PNG grid (default) or raw .npy
         body: {"num_samples": int ≤ serve_batch, "seed": int,
                "format": "png" | "npy",
                "class_id": int (conditional ckpts; CFG),
                "guidance_scale": float (default 3.0),
                "sampler": "default" | "dpm++" | "heun" | "strided"
                    (fast samplers; ddpm/ddim checkpoints),
                "sampler_steps": int (default 20)}

Usage:
    python -m diffusion_model_universal_tpu.scripts.serve \
        --config configs/ddpm_config.yaml --model_type ddim \
        --checkpoint outputs/run/checkpoints/best_model --port 8000
"""

from __future__ import annotations

import argparse
import io
import json
import math
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

MODEL_TYPES = ("ddpm", "ddim", "score_based", "energy_based")


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--model_type", type=str, required=True,
                   choices=MODEL_TYPES)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--serve_batch", type=int, default=16,
                   help="Static sampler batch compiled at startup; "
                        "requests are sliced from it (max num_samples)")
    p.add_argument("--ema", action="store_true",
                   help="Serve the EMA weights from a trainer checkpoint")
    p.add_argument("--num_devices", type=int, default=None)
    return p


class SamplerService:
    """Owns the model, params and the pre-compiled fixed-batch sampler.

    Thread-safe: JAX dispatch is internally synchronized, and the
    service keeps no mutable state besides a request counter.
    """

    def __init__(self, model, params, serve_batch: int, mesh):
        from ..parallel.mesh import mesh_replicated
        self.model = model
        # Mesh-form the params once (parallel.mesh.mesh_replicated — a
        # single-device-committed tree under the sampling mesh can make
        # GSPMD pick unrecoverable partial output shardings).
        self.params = mesh_replicated(mesh, params)
        self.serve_batch = serve_batch
        self.mesh = mesh
        self.requests = 0
        self._lock = threading.Lock()

    def warmup(self) -> float:
        import jax
        t0 = time.perf_counter()
        self.generate(self.serve_batch, seed=0)
        return time.perf_counter() - t0

    _FAST_SAMPLERS = {"dpm++": "generate_samples_dpm",
                      "heun": "generate_samples_heun",
                      "strided": "generate_samples_strided"}

    def generate(self, num_samples: int, seed: int,
                 class_id=None, guidance_scale: float = 3.0,
                 sampler: str = "default", sampler_steps: int = 20):
        """Sample ``num_samples`` images (≤ serve_batch) as float32 NHWC
        in [-1, 1]. Always dispatches a compiled serve_batch program —
        static shapes, zero recompiles per request (each distinct
        (sampler, sampler_steps, guidance_scale) combination compiles
        once on first use, then caches; only the warmup default is
        pre-compiled)."""
        import jax
        import numpy as np

        from ..parallel.mesh import mesh_replicated, sampling_scope

        if not 1 <= num_samples <= self.serve_batch:
            raise ValueError(
                f"num_samples must be in [1, {self.serve_batch}] "
                f"(got {num_samples}); raise --serve_batch to serve more")
        if sampler != "default" and sampler not in self._FAST_SAMPLERS:
            raise ValueError(
                f"sampler must be one of "
                f"{('default', *self._FAST_SAMPLERS)} (got {sampler!r})")
        labels = None
        if class_id is not None:
            if not hasattr(self.model, "make_class_labels"):
                raise ValueError(
                    "class_id unsupported for this model family")
            labels = self.model.make_class_labels(class_id,
                                                  self.serve_batch)
        key = mesh_replicated(self.mesh, jax.random.PRNGKey(seed))
        with sampling_scope(self.mesh):
            if sampler != "default":
                method = self._FAST_SAMPLERS[sampler]
                if not hasattr(self.model, method):
                    raise ValueError(
                        f"sampler {sampler!r} needs an ε-prediction "
                        "model (ddpm/ddim)")
                batch = getattr(self.model, method)(
                    self.params, key, self.serve_batch,
                    num_steps=int(sampler_steps), labels=labels,
                    guidance_scale=(float(guidance_scale)
                                    if labels is not None else 1.0))
            elif labels is not None:
                batch = self.model.generate_samples_cfg(
                    self.params, key, self.serve_batch, labels,
                    guidance_scale=float(guidance_scale))
            else:
                batch = self.model.generate_samples(
                    self.params, key, self.serve_batch)
        with self._lock:
            self.requests += 1
        return np.asarray(batch[:num_samples], dtype=np.float32)


def make_handler(service: SamplerService, model_type: str):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path != "/healthz":
                return self._send_json(404, {"error": "not found"})
            import jax
            self._send_json(200, {
                "status": "ok",
                "model": model_type,
                "serve_batch": service.serve_batch,
                "devices": len(jax.devices()),
                "requests": service.requests,
            })

        def do_POST(self):
            if self.path != "/generate":
                return self._send_json(404, {"error": "not found"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                num = int(req.get("num_samples", 1))
                seed = int(req.get("seed", 0))
                fmt = req.get("format", "png")
                if fmt not in ("png", "npy"):
                    raise ValueError(
                        f"format must be 'png' or 'npy' (got {fmt!r})")
                samples = service.generate(
                    num, seed, class_id=req.get("class_id"),
                    guidance_scale=req.get("guidance_scale", 3.0),
                    sampler=req.get("sampler", "default"),
                    sampler_steps=req.get("sampler_steps", 20))
            except (ValueError, TypeError) as e:
                # TypeError covers malformed field types (null num_samples,
                # string guidance_scale, ...) — client errors, not 500s.
                return self._send_json(400, {"error": str(e)})
            except Exception as e:  # surface, don't kill the server
                return self._send_json(500, {"error": repr(e)})
            if fmt == "npy":
                import numpy as np
                buf = io.BytesIO()
                np.save(buf, samples)
                return self._send(200, buf.getvalue(),
                                  "application/octet-stream")
            from ..utils.images import to_grid_png_bytes
            nrow = int(math.ceil(math.sqrt(len(samples))))
            return self._send(200, to_grid_png_bytes(samples, nrow),
                              "image/png")

    return Handler


def make_server(args) -> ThreadingHTTPServer:
    """Build the service + HTTP server (separated from main() so tests
    can run it on an ephemeral port in a thread)."""
    import jax

    from ..models import MODEL_REGISTRY
    from ..parallel.mesh import local_devices, make_mesh
    from ..utils.config import load_config, resolve_interpolations
    from .generate import load_params, resolve_model_config

    config = resolve_interpolations(load_config(args.config))
    model_cfg = resolve_model_config(config, args.checkpoint)
    model = MODEL_REGISTRY[args.model_type](model_cfg)
    params = load_params(model, args.checkpoint, args.ema)

    devices = local_devices(args.num_devices)
    service = SamplerService(model, params, args.serve_batch,
                             make_mesh(devices))
    srv = ThreadingHTTPServer((args.host, args.port),
                              make_handler(service, args.model_type))
    srv.service = service  # for tests / introspection
    return srv


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    srv = make_server(args)
    dt = srv.service.warmup()
    host, port = srv.server_address[:2]
    print(f"serving {args.model_type} on http://{host}:{port} "
          f"(batch {args.serve_batch} compiled+warmed in {dt:.1f}s)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
