"""Serving CLI: a stdlib HTTP endpoint over :class:`fit_tpu.serve.SamplingServer`.

No reference counterpart (the reference only ships the offline batch script
``FiT/sample_lightning.py``); this is the live-deployment face of the same
sampling pipeline — static-shape packed batching keeps one compiled TPU
executable hot across arbitrary request arrival.

Usage:
  python -m fit_tpu.cli.serve --checkpoint_path results/checkpoints \
      --port 8000 --serve-batch-size 8 --num_sampling_steps 50 \
      [--quant int8] [--sampler dpm] [--vae-checkpoint sd-vae-ft-ema/...]

Endpoints:
  POST /sample   body {"label": 3, "height": 256, "width": 256, "seed": 7,
                 "deadline_s": 30}
                 -> .npy bytes of the (C, h, w) float32 latent, or a PNG
                 image when the server was started with --vae-checkpoint
                 (on-TPU decode; the reference predict_step contract).
                 seed gives bit-reproducible results under the
                 deterministic samplers ddim/dpm.
                 429 (+Retry-After) when the bounded queue is full;
                 504 when deadline_s elapsed before dispatch
  GET  /stats    -> JSON: served, batches, occupancy, queue depth/bound,
                 rejected/expired counts, latency percentiles
  GET  /healthz  -> 200 "ok"
"""

import argparse
import io
import json
import os
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def make_handler(server):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through one line per req
            print(f"[serve] {self.address_string()} {fmt % args}")

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok"})
            elif self.path == "/stats":
                self._json(200, server.stats())
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/sample":
                self._json(404, {"error": "unknown path"})
                return
            from fit_tpu.serve import DeadlineExceeded, ServerOverloaded

            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                deadline = req.get("deadline_s")
                fut = server.submit(
                    int(req.get("label", 0)),
                    int(req.get("height", 256)),
                    int(req.get("width", 256)),
                    seed=req.get("seed"),
                    deadline_s=float(deadline) if deadline is not None else None,
                )
            except ServerOverloaded as exc:
                # backpressure: bounded queue full — shed load, tell the
                # client to retry after roughly one batch latency
                self.send_response(429)
                body = json.dumps({"error": str(exc)}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Retry-After", "1")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            except (ValueError, KeyError, json.JSONDecodeError) as exc:
                self._json(400, {"error": str(exc)})
                return
            try:
                result = fut.result()
            except DeadlineExceeded as exc:
                self._json(504, {"error": str(exc)})
                return
            except Exception as exc:  # noqa: BLE001 — surface batch failures
                self._json(500, {"error": str(exc)})
                return
            buf = io.BytesIO()
            if result.dtype == np.uint8:  # decoded (H, W, 3) image
                from PIL import Image

                Image.fromarray(result).save(buf, format="PNG")
                ctype = "image/png"
            else:
                np.save(buf, result)
                ctype = "application/octet-stream"
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main():
    from fit_tpu.utils.config import SampleConfig, add_dataclass_args, from_args

    parser = argparse.ArgumentParser(description="Serve a trained FiT over HTTP")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--torch-checkpoint", type=str, default=None)
    parser.add_argument("--quant", choices=["none", "int8"], default="none",
                        help="int8 = w8a8 quantized serving path (ops.quant)")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--serve-batch-size", type=int, default=8,
                        help="static TPU batch: requests pack into exactly "
                             "this many slots per dispatch")
    parser.add_argument("--max-batch-wait-s", type=float, default=0.25,
                        help="max seconds the first request in a batch waits "
                             "for the batch to fill")
    parser.add_argument("--max-queue", type=int, default=None,
                        help="bounded request-queue depth (default 8x batch); "
                             "full queue returns HTTP 429. 0 = unbounded")
    parser.add_argument("--no-warmup", action="store_true",
                        help="skip the startup compile batch (first request "
                             "pays it instead)")
    add_dataclass_args(parser, SampleConfig)
    args = parser.parse_args()

    config_path = args.config
    if config_path is None and args.checkpoint_path:
        for cand in (
            os.path.join(os.path.dirname(args.checkpoint_path.rstrip("/")), "config.json"),
            os.path.join(args.checkpoint_path, "config.json"),
        ):
            if os.path.exists(cand):
                config_path = cand
                break
    cfg = from_args(SampleConfig, args, config_path)

    from fit_tpu.cli.sample import load_model_and_params
    from fit_tpu.serve import SamplingServer

    model, params = load_model_and_params(
        cfg, torch_checkpoint=args.torch_checkpoint, quant=args.quant
    )
    vae = vae_params = None
    if cfg.vae_checkpoint:
        # serve decoded PNGs (the reference predict_step contract) instead
        # of raw latents — same converter path as the sample CLI
        import jax.numpy as jnp

        from fit_tpu.cli.sample import _resolve_vae_checkpoint
        from fit_tpu.vae import AutoencoderKL, load_torch_checkpoint

        vae_path = _resolve_vae_checkpoint(cfg.vae_checkpoint, cfg.vae)
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]
        vae = AutoencoderKL(dtype=dtype)
        vae_params = load_torch_checkpoint(vae_path)
        print(f"[serve] decoding with sd-vae ({vae_path}); /sample returns PNG")
    server = SamplingServer(
        model, params,
        batch_size=args.serve_batch_size,
        max_batch_wait_s=args.max_batch_wait_s,
        max_queue=args.max_queue,
        num_sampling_steps=cfg.num_sampling_steps,
        cfg_scale=cfg.cfg_scale,
        sampler=cfg.sampler,
        num_classes=cfg.num_classes,
        vae=vae,
        vae_params=vae_params,
    )
    if not args.no_warmup:
        print("[serve] warming up (compiling the serving executable)...")
        print(f"[serve] warmup done in {server.warmup():.1f}s")

    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(server))
    print(f"[serve] listening on http://{args.host}:{args.port}")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        server.close()


if __name__ == "__main__":
    main()
