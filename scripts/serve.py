#!/usr/bin/env python
"""HTTP serving front end for probabilistic zero-shot inference.

No reference counterpart — the reference is batch scripts only
(ref:scripts/zeroshot.py:25-128); this is the TPU-native online-serving
lane: `bayesvlm_tpu.serve.BatchingServer` (dynamic micro-batching into
the AOT-compiled fused predict program) behind a stdlib
ThreadingHTTPServer. Zero extra dependencies.

Endpoints
---------
POST /predict            (single-model mode; or multi mode with one model)
POST /predict/<model>    (multi-model mode)
    application/octet-stream: raw image bytes + headers
        X-Image-Shape: "224,224,3"   (row-major, channels-last)
        X-Image-Dtype: "float32" | "uint8"
    application/json: {"image": [[[...]]]}  (nested lists)
    -> {"probs": [...], "class": <argmax>, "latency_ms": ...}
POST /class_prompts           (single-model mode)
POST /class_prompts/<model>   (multi-model mode)
    {"prompts": ["a photo of a cat", ...]}  — swaps the label set
    (drains in-flight requests, re-encodes prompts, recompiles if the
    class count changed; in multi mode the swap briefly pauses ALL
    resident models — the lanes share one dispatcher).
GET /healthz   -> {"ok": true, ...compiled signature(s)...}
GET /stats     -> server counters (fill, p50/p95 latency, ...;
                  per-model in multi mode)

Multi-model co-residency (`--models_json`): several VLMs resident on one
chip behind `bayesvlm_tpu.multiserve.MultiModelServer` (the measured
memory envelope fits ~12 ViT-H-class towers per 16 GiB chip —
BASELINE.md). The manifest is a JSON dict name -> {model_str,
hessian_dir, classes_json, [weights_dir, tokenizer_dir, text_prompt,
batch_size, buckets, input_dtype, dtype, mlp_int8]}; omitted fields
default to the corresponding CLI flags.

Example
-------
  python scripts/serve.py --model_str clip-base --hessian_dir hessians/... \
      --weights_dir weights/clip-base --port 8000 --batch_size 8
  curl -X POST localhost:8000/predict -H 'Content-Type: application/octet-stream' \
      -H 'X-Image-Shape: 224,224,3' -H 'X-Image-Dtype: uint8' \
      --data-binary @image.raw
  # multi-model:
  python scripts/serve.py --models_json fleet.json --port 8000
  curl -X POST localhost:8000/predict/siglip ...
"""

import argparse
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


class ServingApp:
    """Owns the VLM + BatchingServer; serializes label-set swaps."""

    def __init__(self, vlm, batch_size: int, max_wait_ms: float,
                 input_dtype: str, predict_timeout_s: float = 120.0,
                 buckets=None, pipeline_depth: int = 0):
        import jax.numpy as jnp

        from bayesvlm_tpu.serve import BatchingServer

        self._dtype = {"float32": jnp.float32, "uint8": jnp.uint8}[input_dtype]
        self._make = lambda: BatchingServer(
            vlm, batch_size, max_wait_ms=max_wait_ms,
            input_dtype=self._dtype, buckets=buckets,
            pipeline_depth=pipeline_depth,
        )
        self.vlm = vlm
        self.verbose = False
        self.predict_timeout_s = predict_timeout_s
        self.server = self._make().start()
        self._swap_lock = threading.Lock()

    def predict(self, image: np.ndarray, model=None) -> np.ndarray:
        if model is not None:
            raise KeyError(
                "single-model server: POST /predict (no model path)")
        # A request can race a /class_prompts swap into the stopped
        # window; retry on the replacement server after the swap ends
        # (waiting on _swap_lock) instead of surfacing a client error.
        for _ in range(2):
            try:
                return self.server.predict(
                    image, timeout=self.predict_timeout_s)
            except RuntimeError as exc:
                if "not accepting" not in str(exc):
                    raise
                with self._swap_lock:
                    pass  # swap (or shutdown) finished; retry once
        return self.server.predict(image, timeout=self.predict_timeout_s)

    def set_class_prompts(self, prompts, model=None):
        """Drain, swap labels (recompile happens inside BatchingServer
        if the class count invalidated the AOT program), restart.
        timeout=None: never mutate shared VLM state while the old
        dispatcher might still be mid-predict (a bounded join that
        expires would do exactly that). Exception-safe: the endpoint
        comes back up even if the swap itself fails."""
        if model is not None:
            raise KeyError(
                "single-model server: POST /class_prompts (no model path)")
        with self._swap_lock:
            self.server.stop(drain=True, timeout=None)
            try:
                self.vlm.set_class_prompts(prompts)
            finally:
                # restart with whatever labels the VLM now holds (new on
                # success, old if set_class_prompts raised) so /predict
                # keeps working either way
                self.server = self._make().start()

    def signature(self) -> dict:
        return {"ok": True, **self.server.signature()}

    def stats_dict(self) -> dict:
        return vars(self.server.stats())


class MultiServingApp:
    """Owns N co-resident VLMs behind one MultiModelServer.

    Same swap contract as ServingApp, with one multi-model caveat
    documented in the module docstring: a /class_prompts/<model> swap
    drains and rebuilds the WHOLE multiplexer (the lanes share one
    dispatcher thread), so other models pause for the swap duration.
    """

    def __init__(self, vlms: dict, batch_size, max_wait_ms: float,
                 input_dtype, predict_timeout_s: float = 120.0,
                 buckets=None, pipeline_depth: int = 0):
        import jax.numpy as jnp

        from bayesvlm_tpu.multiserve import MultiModelServer

        jmap = {"float32": jnp.float32, "uint8": jnp.uint8}
        dt = ({k: jmap[v] for k, v in input_dtype.items()}
              if isinstance(input_dtype, dict) else jmap[input_dtype])
        self.vlms = dict(vlms)
        self._make = lambda: MultiModelServer(
            self.vlms, batch_size, max_wait_ms=max_wait_ms,
            input_dtype=dt, buckets=buckets,
            pipeline_depth=pipeline_depth,
        )
        self.verbose = False
        self.predict_timeout_s = predict_timeout_s
        self.server = self._make().start()
        self._swap_lock = threading.Lock()

    def _resolve(self, model):
        if model is None:
            if len(self.vlms) == 1:
                return next(iter(self.vlms))
            raise KeyError(
                f"model name required (POST /predict/<model>); resident: "
                f"{sorted(self.vlms)}")
        if model not in self.vlms:
            raise KeyError(
                f"unknown model {model!r}; resident: {sorted(self.vlms)}")
        return model

    def predict(self, image: np.ndarray, model=None) -> np.ndarray:
        model = self._resolve(model)
        for _ in range(2):
            try:
                return self.server.predict(
                    model, image, timeout=self.predict_timeout_s)
            except RuntimeError as exc:
                if "not accepting" not in str(exc):
                    raise
                with self._swap_lock:
                    pass  # swap (or shutdown) finished; retry once
        return self.server.predict(model, image,
                                   timeout=self.predict_timeout_s)

    def set_class_prompts(self, prompts, model=None):
        model = self._resolve(model)
        with self._swap_lock:
            self.server.stop(drain=True, timeout=None)
            try:
                self.vlms[model].set_class_prompts(prompts)
            finally:
                self.server = self._make().start()

    def signature(self) -> dict:
        return {"ok": True, "models": self.server.signature(),
                "hbm_gib": self.server.hbm_footprint()}

    def stats_dict(self) -> dict:
        return {name: vars(s) for name, s in self.server.stats().items()}


def _parse_image(handler: BaseHTTPRequestHandler) -> np.ndarray:
    length = int(handler.headers.get("Content-Length", 0))
    body = handler.rfile.read(length)
    ctype = handler.headers.get("Content-Type", "")
    if ctype.startswith("application/octet-stream"):
        shape = tuple(
            int(x) for x in handler.headers["X-Image-Shape"].split(","))
        dtype = np.dtype(handler.headers.get("X-Image-Dtype", "float32"))
        arr = np.frombuffer(body, dtype=dtype)
        if arr.size != int(np.prod(shape)):
            raise ValueError(
                f"payload has {arr.size} elements, shape {shape} needs "
                f"{int(np.prod(shape))}")
        return arr.reshape(shape)
    payload = json.loads(body)
    return np.asarray(payload["image"], dtype=np.float32)


def make_handler(app: ServingApp):
    class Handler(BaseHTTPRequestHandler):
        # quiet by default; --verbose restores BaseHTTPRequestHandler logs
        def log_message(self, fmt, *args):  # noqa: D102
            if app.verbose:
                super().log_message(fmt, *args)

        def _send(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self._responded = True  # no second status line after this
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        @staticmethod
        def _status_for(exc: Exception) -> int:
            """Client errors -> 4xx, server faults -> 5xx (so clients and
            load balancers retry the right things)."""
            import concurrent.futures
            import queue as queue_mod

            if isinstance(exc, queue_mod.Full):
                return 429  # backpressure: retry later
            if isinstance(exc, concurrent.futures.TimeoutError):
                return 504  # device did not answer within predict_timeout_s
            if isinstance(exc, (ValueError, KeyError, TypeError)):
                return 400  # malformed request (shape/dtype/JSON)
            if isinstance(exc, RuntimeError) and "not accepting" in str(exc):
                return 503  # shutting down / mid-swap
            return 500

        @staticmethod
        def _route(path: str, stem: str):
            """Match `/<stem>` (None model) or `/<stem>/<model>`;
            no-match -> (False, None)."""
            if path == f"/{stem}":
                return True, None
            prefix = f"/{stem}/"
            if path.startswith(prefix) and len(path) > len(prefix):
                return True, path[len(prefix):]
            return False, None

        def do_GET(self):  # noqa: N802 (stdlib casing)
            if self.path == "/healthz":
                self._send(200, app.signature())
            elif self.path == "/stats":
                self._send(200, app.stats_dict())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            import time

            self._responded = False
            try:
                hit, model = self._route(self.path, "predict")
                if hit:
                    t0 = time.monotonic()
                    probs = app.predict(_parse_image(self), model=model)
                    self._send(200, {
                        "probs": np.asarray(probs, np.float64).tolist(),
                        "class": int(np.argmax(probs)),
                        "latency_ms": (time.monotonic() - t0) * 1000.0,
                    })
                    return
                hit, model = self._route(self.path, "class_prompts")
                if hit:
                    length = int(self.headers.get("Content-Length", 0))
                    prompts = json.loads(self.rfile.read(length))["prompts"]
                    app.set_class_prompts(prompts, model=model)
                    self._send(200, {"ok": True, "num_classes": len(prompts)})
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})
            except Exception as exc:  # noqa: BLE001 — client-visible error
                if self._responded:
                    # failure mid-write (e.g. client hung up): the status
                    # line is already on the wire — never write a second
                    # response onto a half-written stream
                    self.close_connection = True
                    return
                self._send(self._status_for(exc),
                           {"error": f"{type(exc).__name__}: {exc}"})

    return Handler


def _parse_buckets(spec):
    if not spec:
        return None
    return "pow2" if spec == "pow2" else [int(b) for b in spec.split(",")]


def _build_prompts(classes_json, text_prompt):
    return [text_prompt.format(class_name=c)
            for c in json.loads(Path(classes_json).read_text())]


def _load_vlm(args, model_str, hessian_dir, weights_dir, tokenizer_dir,
              dtype, mlp_int8, classes_json, text_prompt):
    from bayesvlm_tpu.pipeline import ProbabilisticVLM

    vlm = ProbabilisticVLM.from_pretrained(
        model_str, hessian_dir,
        weights_dir=weights_dir, tokenizer_dir=tokenizer_dir,
        dtype=dtype, mesh="auto" if args.use_mesh else None,
        mlp_int8=mlp_int8,
    )
    return vlm.set_class_prompts(_build_prompts(classes_json, text_prompt))


def _aot_full_restore(path, verbose, *, model_str, weights_dir,
                      tokenizer_dir, dtype, mlp_int8, use_mesh, prompts):
    """Try the ZERO-COMPILE restart lane (pipeline.from_serving_cache):
    towers built weights-only, labels/head/λ restored from the cache
    file, ladder deserialized — no Hessian artifacts, no λ re-opt, no
    text-tower compile. Returns (vlm, restored_serving) or (None, None)
    when the file is absent/stale or was saved from a DIFFERENT prompt
    set than the one configured now (the labels in the file would be
    stale — the caller falls back to the full build, which re-encodes
    prompts and can still reuse the ladder programs via _aot_restore:
    labels are runtime arguments, only their shape is baked in)."""
    from bayesvlm_tpu.pipeline import ProbabilisticVLM

    try:
        vlm = ProbabilisticVLM.from_serving_cache(
            model_str, path, weights_dir=weights_dir,
            tokenizer_dir=tokenizer_dir, dtype=dtype,
            mesh="auto" if use_mesh else None, mlp_int8=mlp_int8)
    except FileNotFoundError:
        return None, None
    except Exception as exc:  # noqa: BLE001 — any stale cache -> rebuild
        print(f"[aot_cache] full restore unavailable ({exc}); building",
              flush=True)
        return None, None
    if vlm._class_prompts != list(prompts):
        print("[aot_cache] configured prompt set differs from the cached "
              "labels; rebuilding", flush=True)
        return None, None
    if verbose:
        print(f"[aot_cache] zero-compile restore from {path}", flush=True)
    return vlm, vlm._serving


def _aot_restore(vlm, path, verbose):
    """Try the instant-restart lane (pipeline.load_serving); returns the
    restored serving dict (the staleness sentinel for _aot_persist) or
    None when the cache is absent/stale — the caller's BatchingServer
    then compiles as usual."""
    try:
        vlm.load_serving(path)
        if verbose:
            print(f"[aot_cache] restored serving ladder from {path}",
                  flush=True)
        return vlm._serving
    except FileNotFoundError:
        return None
    except Exception as exc:  # noqa: BLE001 — any stale cache -> recompile
        print(f"[aot_cache] stale ({exc}); recompiling", flush=True)
        return None


def _aot_persist(vlm, path, restored, verbose, refresh=False):
    """Save the ladder iff BatchingServer (re)compiled it — i.e. the
    serving dict is not the one load_serving restored — or when
    `refresh` says the file's runtime block is missing/stale (the
    ladder was reused but the next restart should get the zero-compile
    lane with CURRENT labels)."""
    if vlm._serving is None or (vlm._serving is restored and not refresh):
        return
    try:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        vlm.save_serving(path)
    except Exception as exc:  # noqa: BLE001 — persistence is best-effort;
        # the server must come up even where executables can't serialize
        print(f"[aot_cache] save failed ({exc}); serving without cache",
              flush=True)
        return
    if verbose:
        print(f"[aot_cache] saved serving ladder to {path}", flush=True)


def build_app(args):
    from bayesvlm_tpu.utils import apply_device_flag

    apply_device_flag(args.device)

    if args.models_json:
        manifest = json.loads(Path(args.models_json).read_text())
        if not isinstance(manifest, dict) or not manifest:
            raise ValueError("--models_json must be a non-empty JSON dict "
                             "name -> model spec")
        aot_cache = getattr(args, "aot_cache", None)
        vlms, batch_size, buckets = {}, {}, {}
        input_dtype, restored, refresh = {}, {}, {}
        for name, spec in manifest.items():
            vlm = rst = None
            if aot_cache:
                vlm, rst = _aot_full_restore(
                    Path(aot_cache) / f"{name}.aotserv", args.verbose,
                    model_str=spec.get("model_str", args.model_str),
                    weights_dir=spec.get("weights_dir", args.weights_dir),
                    tokenizer_dir=spec.get("tokenizer_dir",
                                           args.tokenizer_dir),
                    dtype=spec.get("dtype", args.dtype),
                    mlp_int8=bool(spec.get("mlp_int8", args.mlp_int8)),
                    use_mesh=args.use_mesh,
                    prompts=_build_prompts(
                        spec["classes_json"],
                        spec.get("text_prompt", args.text_prompt)),
                )
            if vlm is None:
                vlm = _load_vlm(
                    args, spec.get("model_str", args.model_str),
                    spec["hessian_dir"],
                    spec.get("weights_dir", args.weights_dir),
                    spec.get("tokenizer_dir", args.tokenizer_dir),
                    spec.get("dtype", args.dtype),
                    bool(spec.get("mlp_int8", args.mlp_int8)),
                    spec["classes_json"],
                    spec.get("text_prompt", args.text_prompt),
                )
                if aot_cache:
                    rst = _aot_restore(
                        vlm, Path(aot_cache) / f"{name}.aotserv",
                        args.verbose)
                    # ladder reused but the zero-compile lane refused:
                    # refresh the file's runtime block for next restart
                    refresh[name] = rst is not None
            vlms[name], restored[name] = vlm, rst
            batch_size[name] = int(spec.get("batch_size", args.batch_size))
            buckets[name] = _parse_buckets(spec.get("buckets", args.buckets))
            input_dtype[name] = spec.get("input_dtype", args.input_dtype)
        app = MultiServingApp(vlms, batch_size, args.max_wait_ms,
                              input_dtype,
                              predict_timeout_s=args.predict_timeout_s,
                              buckets=buckets,
                              pipeline_depth=getattr(
                                  args, "pipeline_depth", 0))
        app.verbose = args.verbose
        if aot_cache:
            for name, vlm in vlms.items():
                _aot_persist(vlm, Path(aot_cache) / f"{name}.aotserv",
                             restored.get(name), args.verbose,
                             refresh=refresh.get(name, False))
        return app

    aot_cache = getattr(args, "aot_cache", None)
    vlm = restored = None
    if aot_cache:
        vlm, restored = _aot_full_restore(
            Path(aot_cache) / "serving.aotserv", args.verbose,
            model_str=args.model_str, weights_dir=args.weights_dir,
            tokenizer_dir=args.tokenizer_dir, dtype=args.dtype,
            mlp_int8=args.mlp_int8, use_mesh=args.use_mesh,
            prompts=_build_prompts(args.classes_json, args.text_prompt))
    refresh = False
    if vlm is None:
        vlm = _load_vlm(args, args.model_str, args.hessian_dir,
                        args.weights_dir, args.tokenizer_dir, args.dtype,
                        args.mlp_int8, args.classes_json, args.text_prompt)
        if aot_cache:
            restored = _aot_restore(
                vlm, Path(aot_cache) / "serving.aotserv", args.verbose)
            # ladder reused but the zero-compile lane refused: refresh
            # the file's runtime block for next restart
            refresh = restored is not None
    app = ServingApp(vlm, args.batch_size, args.max_wait_ms,
                     args.input_dtype,
                     predict_timeout_s=args.predict_timeout_s,
                     buckets=_parse_buckets(args.buckets),
                     pipeline_depth=getattr(args, "pipeline_depth", 0))
    app.verbose = args.verbose
    if aot_cache:
        _aot_persist(vlm, Path(aot_cache) / "serving.aotserv",
                     restored, args.verbose, refresh=refresh)
    return app


def main(args) -> None:
    if not args.models_json and not (args.hessian_dir and args.classes_json):
        raise SystemExit(
            "--hessian_dir and --classes_json are required "
            "(or pass --models_json for multi-model mode)")
    app = build_app(args)
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(app))
    what = (f"models={sorted(app.vlms)}" if hasattr(app, "vlms")
            else f"batch_size={args.batch_size}")
    print(f"serving on {args.host}:{httpd.server_address[1]} "
          f"({what}, wait={args.max_wait_ms}ms)", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        app.server.stop(drain=False)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model_str", default="clip-base")
    p.add_argument("--hessian_dir", default=None,
                   help="required unless --models_json is given")
    p.add_argument("--weights_dir", default=None)
    p.add_argument("--tokenizer_dir", default=None)
    p.add_argument("--classes_json", default=None,
                   help="JSON list of class names (required unless "
                        "--models_json is given)")
    p.add_argument("--models_json", default=None,
                   help="multi-model co-residency manifest: JSON dict "
                        "name -> {model_str, hessian_dir, classes_json, "
                        "[weights_dir, tokenizer_dir, text_prompt, "
                        "batch_size, buckets, input_dtype, dtype, "
                        "mlp_int8]}; omitted fields default to the CLI "
                        "flags. Serves POST /predict/<name>.")
    p.add_argument("--text_prompt", default="An image of a {class_name}")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--input_dtype", choices=["float32", "uint8"],
                   default="float32")
    p.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--no_mesh", dest="use_mesh", action="store_false")
    p.add_argument("--mlp_int8", action="store_true")
    p.add_argument("--device", type=str, default="tpu",
                   help="'cpu' forces the CPU platform; anything else "
                        "keeps default resolution (TPU when present)")
    p.add_argument("--buckets", default=None,
                   help="batch-size ladder for partial batches: 'pow2' "
                        "or a comma list (e.g. '1,4'); partial batches "
                        "dispatch to the smallest compiled size that "
                        "fits instead of padding to --batch_size")
    p.add_argument(
        "--pipeline_depth", type=int, default=0,
        help="0 resolves each batch inline; >0 overlaps the device->host "
        "fetch of one batch with the execution of the next (async-fetch "
        "resolver thread; bounds in-flight unfetched batches). Use 2-8 "
        "when throughput matters and the device round trip is long.")
    p.add_argument("--predict_timeout_s", type=float, default=120.0,
                   help="bound on a single request's wait for its batch "
                        "result; expiry returns HTTP 504 instead of "
                        "leaking a blocked handler thread")
    p.add_argument(
        "--aot_cache", default=None,
        help="directory for serialized AOT serving ladders "
             "(pipeline.save_serving): a restart deserializes the "
             "compiled executables (~ms) instead of recompiling; a "
             "stale/mismatched cache is detected and recompiled. "
             "Multi-model mode writes <name>.aotserv per lane")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--verbose", action="store_true")
    return p.parse_args()


if __name__ == "__main__":
    main(parse_args())
