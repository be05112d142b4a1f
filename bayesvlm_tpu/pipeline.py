"""One-call serving API for probabilistic zero-shot inference.

The reference exposes its pipeline only through scripts
(ref:scripts/zeroshot.py:25-128); a user deploying it must re-assemble
load_model + load_hessians + optimize_prior_precision +
compute_covariances + precompute + probit by hand. `ProbabilisticVLM`
packages that exact Stage-2 chain behind one constructor and one call,
with the same semantics (lambda re-opt with pseudo_data_count=10,
init 300, 1000 Adam steps; probit softmax when num_samples=0;
MC sampling otherwise) and the TPU-native conveniences: bf16 towers,
batch-sharded GSPMD inference when more than one device is visible,
cached class-prompt features for repeated serving calls.

    vlm = ProbabilisticVLM.from_pretrained(
        "clip-base", hessian_dir, weights_dir=..., tokenizer_dir=...)
    vlm.set_class_prompts(["An image of a cat", "An image of a dog"])
    probs = vlm.predict(images)           # [B, C] calibrated probs
    logits = vlm.logits(images)           # ProbabilisticLogits (mean+var)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from bayesvlm_tpu.types import EncoderResult, ProbabilisticLogits

# Bump when the save_serving payload layout or the serve() calling
# convention changes: load_serving refuses older files.
_AOT_CACHE_VERSION = 1


class ProbabilisticVLM:
    def __init__(self, image_encoder, text_encoder, head, info: dict,
                 transform=None, mesh=None):
        self.image_encoder = image_encoder
        self.text_encoder = text_encoder
        self.head = head
        self.info = dict(info)
        self.transform = transform
        self.mesh = mesh
        self._label_features: Optional[EncoderResult] = None
        self._class_prompts: Optional[list] = None
        self._serving: Optional[dict] = None

    # -- construction ---------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        model_str: str,
        hessian_dir: str,
        weights_dir: Optional[str] = None,
        tokenizer_dir: Optional[str] = None,
        pseudo_data_count: int = 10,
        dtype: str = "bf16",
        mesh="auto",
        lambda_init: float = 300.0,
        prior_lr: float = 1e-2,
        prior_num_steps: int = 1000,
        mlp_int8: bool = False,
        attn_int8: bool = False,
        seed: int = 0,
    ) -> "ProbabilisticVLM":
        """Load towers + K-FAC posterior and finalize covariances — the
        Stage-2 preamble (ref:scripts/zeroshot.py:54-94) as one call.

        `seed` only matters when weights_dir is None (random-init towers
        for tests/benchmarks): it makes co-resident lanes of the same
        family carry DISTINCT weight sets (bench --metric fleet)."""
        from bayesvlm_tpu.bayes.kfac import compute_covariances
        from bayesvlm_tpu.bayes.prior import optimize_prior_precision
        from bayesvlm_tpu.io.artifacts import load_hessians

        image_encoder, text_encoder, head, mesh, transform = (
            cls._build_towers(model_str, weights_dir, tokenizer_dir,
                              dtype, mesh, mlp_int8, attn_int8, seed))

        A_img, B_img = load_hessians(hessian_dir, tag="img")
        A_txt, B_txt = load_hessians(hessian_dir, tag="txt")
        info = {"n_img": pseudo_data_count, "n_txt": pseudo_data_count}
        info["lambda_img"] = float(optimize_prior_precision(
            image_encoder.projection_l2(),
            image_encoder.projection_num_params(),
            A=A_img, B=B_img, lmbda_init=lambda_init, n=info["n_img"],
            lr=prior_lr, num_steps=prior_num_steps,
        ))
        info["lambda_txt"] = float(optimize_prior_precision(
            text_encoder.projection_l2(),
            text_encoder.projection_num_params(),
            A=A_txt, B=B_txt, lmbda_init=lambda_init, n=info["n_txt"],
            lr=prior_lr, num_steps=prior_num_steps,
        ))
        cov_img, cov_txt = compute_covariances(A_img, B_img, A_txt, B_txt, info)
        head = head.set_covariances(cov_img, cov_txt)
        return cls(image_encoder, text_encoder, head, info,
                   transform=transform, mesh=mesh)

    @classmethod
    def _build_towers(cls, model_str, weights_dir, tokenizer_dir, dtype,
                      mesh, mlp_int8, attn_int8, seed):
        """Weights-only tower construction shared by from_pretrained and
        from_serving_cache: load/init encoders, pre-cast GEMM weights to
        the compute dtype, place on the mesh, attach tokenizer and
        transform. No Hessian artifacts, no XLA compilation."""
        from bayesvlm_tpu.data.tokenizer import HashTokenizer, HFTokenizer
        from bayesvlm_tpu.data.transforms import get_transform
        from bayesvlm_tpu.dist.mesh import resolve_auto_mesh
        from bayesvlm_tpu.models import load_model
        from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME
        from bayesvlm_tpu.utils import get_image_size

        config = CONFIGS_BY_NAME[model_str]
        jdtype = {"bf16": jnp.bfloat16, "fp32": jnp.float32}[dtype]
        image_encoder, text_encoder, head = load_model(
            model_str, weights_dir=weights_dir, dtype=jdtype,
            mlp_int8=mlp_int8, attn_int8=attn_int8, seed=seed,
        )
        if jdtype != jnp.float32:
            # pre-cast the GEMM weights to the compute dtype — otherwise
            # every forward pays the fp32->bf16 convert on device
            # (~2.9 ms/batch at ViT-L B=64; bit-identical results — see
            # cast_gemm_params). The benches do this; the packaged API
            # must too.
            import dataclasses as _dc

            from bayesvlm_tpu.models.encoders import cast_gemm_params

            image_encoder = _dc.replace(
                image_encoder,
                params=cast_gemm_params(image_encoder.params, jdtype))
            text_encoder = _dc.replace(
                text_encoder,
                params=cast_gemm_params(text_encoder.params, jdtype))
        mesh = resolve_auto_mesh(mesh)
        if mesh is not None:
            image_encoder = image_encoder.with_mesh(mesh)
        # skip per-call W8A8 weight quantization (~1 ms/call at ViT-L;
        # ~25% of a B=1 serving forward) — no-op unless mlp_int8
        image_encoder = image_encoder.prequantize_int8()
        if tokenizer_dir is not None:
            text_encoder.tokenizer = HFTokenizer.from_local(
                tokenizer_dir, config.text.max_length
            )
        elif text_encoder.tokenizer is None:
            text_encoder.tokenizer = HashTokenizer(
                config.text.vocab_size, config.text.max_length,
                eos_id=config.text.eos_token_id,
            )
        transform = get_transform(config.family, get_image_size(model_str))
        return image_encoder, text_encoder, head, mesh, transform

    @classmethod
    def from_serving_cache(
        cls,
        model_str: str,
        path,
        weights_dir: Optional[str] = None,
        tokenizer_dir: Optional[str] = None,
        dtype: str = "bf16",
        mesh="auto",
        mlp_int8: bool = False,
        attn_int8: bool = False,
        seed: int = 0,
    ) -> "ProbabilisticVLM":
        """Bring a serving VLM up from a `save_serving(...,
        include_runtime=True)` file with NO XLA compilation and NO
        Hessian artifacts: towers are built weights-only
        (`_build_towers`), label features / covariance-finalized head /
        λ info are restored from the file, and the compiled ladder is
        deserialized (`load_serving`). Restart cost = weights load +
        deserialize (~ms of XLA work) instead of the full Stage-2
        preamble (λ re-opt + covariances + text-tower compile + prompt
        encode — 82-240 s for ViT-L on this host, BASELINE.md).

        All `load_serving` signature checks apply (device kind/count,
        mesh layout, every runtime-arg shape/dtype), so a file from a
        different family, dtype, class count, or int8 configuration is
        refused. The weights under `weights_dir` must be the ones the
        ladder was compiled against — shapes are checked, value
        identity is the operator's contract (as with any checkpoint).
        Label swaps still work afterwards: `set_class_prompts`
        invalidates the ladder and the text tower compiles then.
        """
        import pickle

        import jax

        with open(path, "rb") as f:
            payload = pickle.load(f)
        if payload.get("version") != _AOT_CACHE_VERSION:
            raise ValueError(
                f"AOT cache version {payload.get('version')} != "
                f"{_AOT_CACHE_VERSION}")
        runtime = payload.get("runtime")
        if runtime is None:
            raise ValueError(
                "AOT cache was saved with include_runtime=False — it has "
                "no label features / head; use from_pretrained + "
                "load_serving instead")
        image_encoder, text_encoder, head0, mesh, transform = (
            cls._build_towers(model_str, weights_dir, tokenizer_dir,
                              dtype, mesh, mlp_int8, attn_int8, seed))

        def tree_from_host(stored):
            treedef, leaves = stored
            return jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(x) for x in leaves])

        vlm = cls(image_encoder, text_encoder,
                  tree_from_host(runtime["head"]),
                  info=dict(runtime["info"]),
                  transform=transform, mesh=mesh)
        vlm._label_features = tree_from_host(runtime["label_features"])
        vlm._class_prompts = runtime.get("class_prompts")
        return vlm.load_serving(path)

    # -- encoding -------------------------------------------------------

    def _pixels(self, images) -> jnp.ndarray:
        """Accept NHWC float arrays (already normalized) or PIL images
        (run through the model's reference transform)."""
        if isinstance(images, (list, tuple)):
            if self.transform is None:
                raise ValueError("PIL inputs need a transform; construct "
                                 "via from_pretrained")
            images = np.stack([self.transform(im) for im in images])
        return jnp.asarray(images)

    def encode_images(self, images, batch_size: int = 256) -> EncoderResult:
        """Encode in fixed-size batches (one jit signature, bounded
        device memory for large serving batches)."""
        pixels = self._pixels(images)
        n = pixels.shape[0]
        if n <= batch_size:
            return self.image_encoder(pixels)
        return EncoderResult.concatenate([
            self.image_encoder(pixels[i:i + batch_size])
            for i in range(0, n, batch_size)
        ])

    def encode_texts(self, prompts: Sequence[str]) -> EncoderResult:
        return self.text_encoder.encode_texts(list(prompts))

    def set_class_prompts(self, prompts: Sequence[str]) -> "ProbabilisticVLM":
        """Embed and cache the label set once for repeated predict calls."""
        old = self._label_features
        self._class_prompts = list(prompts)
        self._label_features = self.encode_texts(prompts)
        if self._serving is not None and (
            old is None
            or old.embeds.shape != self._label_features.embeds.shape
        ):
            # the AOT program's label avals no longer match: drop it
            # (recompile via compile_serving if the fast path is wanted)
            self._serving = None
        return self

    # -- AOT serving fast path (VERDICT round-2 item 6) ------------------

    def compile_serving(self, batch_size,
                        input_dtype=jnp.float32) -> "ProbabilisticVLM":
        """AOT-compile fused XLA programs (pixels -> encoder -> Smith
        head -> probit softmax) for fixed [B, H, W, 3] input signatures,
        with the pixel buffer donated.

        `batch_size` may be one int or a sequence of ints: each size gets
        its own compiled program (XLA requires static shapes, so the
        TPU-idiomatic answer to variable serving load is a LADDER of
        programs — a partial batch dispatches to the smallest compiled
        size that fits instead of padding all the way up; see
        serve.BatchingServer's `buckets`). A repeat call replaces the
        whole ladder (sizes + dtype).

        Why: the default predict() chain issues several separate jitted
        programs and make_predictions fetches logits to host between the
        head and the softmax — at B=1 the per-call dispatch + that extra
        round trip dominate device compute. The fused program is one
        dispatch, keeps intermediates on device, and donation lets XLA
        reuse the input buffer for intermediates.

        predict() dispatches to it automatically when the input matches
        the compiled signature (and num_samples=0 with cached class
        prompts); anything else falls back to the general path. Labels /
        params / covariances stay runtime arguments, so projection or
        covariance updates do NOT require recompilation — only a changed
        class count does (set_class_prompts invalidates then).

        On a >1-device mesh the same program is compiled batch-sharded
        (GSPMD over the mesh's data axis: pixels split across chips,
        params/labels replicated) — the throughput-serving lane.
        `batch_size` must then divide evenly over the data axis; the
        fast path re-pins runtime arguments to their compiled shardings
        per call (a no-op when nothing moved).
        """
        import jax

        from bayesvlm_tpu.probforward.smith import probabilistic_logits

        if self._label_features is None:
            raise ValueError("call set_class_prompts before compile_serving")
        batch_sizes = sorted({int(b) for b in (
            batch_size if isinstance(batch_size, (list, tuple, set, frozenset))
            else [batch_size])})
        if not batch_sizes or batch_sizes[0] < 1:
            raise ValueError(f"batch sizes must be >= 1, got {batch_sizes}")
        sharded = self.mesh is not None and self.mesh.devices.size > 1
        pix_sharding = rep = None
        if sharded:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = self.mesh
            axis = "data" if "data" in mesh.axis_names else mesh.axis_names[0]
            n = mesh.shape[axis]
            bad = [b for b in batch_sizes if b % n != 0]
            if bad:
                raise ValueError(
                    f"compile_serving on a {n}-way '{axis}' mesh needs "
                    f"batch sizes divisible by {n}, got {bad}")
            pix_sharding = NamedSharding(mesh, P(axis, None, None, None))
            rep = NamedSharding(mesh, P())
            if self.image_encoder.mesh is not mesh:
                self.image_encoder = self.image_encoder.with_mesh(mesh)
            # AOT executables require inputs committed with the compiled
            # shardings — pin the cached runtime arguments now
            self._label_features = jax.device_put(self._label_features, rep)
            self.head = jax.device_put(self.head, rep)
        enc = self.image_encoder
        enc._validate_quant_cache()
        vcfg = enc.config.vision

        def serve(params, quant, labels, head, pixels):
            feats = enc.forward_graph(params, quant, pixels)
            return probabilistic_logits(head, feats, labels).probit_softmax()

        programs = {}
        for b in batch_sizes:
            shape = (b, vcfg.image_size, vcfg.image_size, 3)
            pixel_aval = (
                jax.ShapeDtypeStruct(shape, input_dtype,
                                     sharding=pix_sharding)
                if sharded else jax.ShapeDtypeStruct(shape, input_dtype)
            )
            programs[b] = (
                jax.jit(serve, donate_argnums=(4,))
                .lower(enc.params, enc.quant_vars, self._label_features,
                       self.head, pixel_aval)
                .compile()
            )
        self._serving = dict(
            programs=programs,
            image_shape=(vcfg.image_size, vcfg.image_size, 3),
            dtype=jnp.dtype(input_dtype),
            pix_sharding=pix_sharding, rep=rep,
            # pytree structure the programs were lowered with — checked
            # per call so a structural change (e.g. the int8 cache
            # appearing after compile) falls back instead of a TypeError
            arg_treedef=jax.tree_util.tree_structure(
                (enc.params, enc.quant_vars, self._label_features,
                 self.head)),
        )
        return self

    def save_serving(self, path, include_runtime: bool = True) -> str:
        """Serialize the compiled AOT serving ladder to `path` so a
        server restart can skip XLA compilation entirely
        (`jax.experimental.serialize_executable` — measured GO on this
        runtime, BASELINE.md "Serving cold-start economics").

        With `include_runtime` (default) the file also carries the
        serving-state runtime arguments — class-prompt label features,
        the covariance-finalized Bayesian head, and `info` (the
        optimized λs) — so `from_serving_cache` can bring a server up
        WITHOUT Hessian artifacts, λ re-optimization, or any text-tower
        compile: restart cost becomes weights load + deserialize.
        Weights themselves are NOT stored (point `from_serving_cache`
        at the same weights_dir); shape/dtype mismatches are refused,
        value identity of the weights is the operator's contract, as
        with any checkpoint directory.

        The file stores, per ladder size, the serialized executable plus
        its calling convention, and a signature block (platform, device
        kind, device count, mesh layout, input signature, and the
        shape/dtype of every runtime-argument leaf). `load_serving`
        refuses the file unless the signature matches EXACTLY — a stale
        cache must never serve: executables bake in shapes (class count,
        projection dim, int8 caches) that the pickled blob cannot
        re-derive. Written atomically (tmp + rename, the io/orbax_ckpt
        convention), so a crash mid-save never leaves a torn cache.
        """
        import os
        import pickle

        import jax
        from jax.experimental import serialize_executable as se

        if self._serving is None:
            raise ValueError("no compiled serving ladder: call "
                             "compile_serving before save_serving")

        def serialize_ladder():
            """Serialize every ladder program and VERIFY each blob by
            deserializing and executing it against the live executable
            (bit-equal outputs — same binary). Returns None on any
            failure: XLA:CPU quirk (measured, /tmp repro in
            tests/test_aot_cache.py's docstring lineage): an executable
            that was itself LOADED from the persistent compilation
            cache re-serializes into a blob missing its kernel-registry
            entries — it deserializes, then fails at result fetch with
            'Buffer Definition Event: Function ... not found'. The TPU
            backend is unaffected (bench --metric coldstart GO with a
            warm cache)."""
            srv = self._serving
            enc = self.image_encoder
            args = (enc.params, enc.quant_vars, self._label_features,
                    self.head)
            exec_devices = (tuple(self.mesh.devices.flat)
                            if srv["pix_sharding"] is not None
                            else (jax.devices()[0],))

            def pixels(b):  # fresh per call: the executable donates it
                z = jnp.zeros((b, *srv["image_shape"]), srv["dtype"])
                if srv["pix_sharding"] is not None:
                    z = jax.device_put(z, srv["pix_sharding"])
                return z

            out = {}
            for b, exe in sorted(srv["programs"].items()):
                blob, in_tree, out_tree = se.serialize(exe)
                try:
                    g = se.deserialize_and_load(
                        blob, in_tree, out_tree,
                        execution_devices=exec_devices)
                    want = np.asarray(exe(*args, pixels(b)))
                    got = np.asarray(g(*args, pixels(b)))
                except Exception:  # noqa: BLE001 — any break -> recompile
                    return None
                if not np.array_equal(want, got):
                    return None
                out[int(b)] = (blob, in_tree, out_tree)
            return out

        programs = serialize_ladder()
        if programs is None:
            # recompile fresh with the persistent cache disabled — fresh
            # CPU executables serialize faithfully (measured). reset_cache()
            # on both sides: jax memoizes the is-cache-used verdict at first
            # compile, so toggling the config alone is a no-op
            from jax.experimental.compilation_cache import (
                compilation_cache as _cc)

            prev = jax.config.jax_enable_compilation_cache
            jax.config.update("jax_enable_compilation_cache", False)
            _cc.reset_cache()
            try:
                self.compile_serving(sorted(self._serving["programs"]),
                                     input_dtype=self._serving["dtype"])
            finally:
                jax.config.update("jax_enable_compilation_cache", prev)
                _cc.reset_cache()
            programs = serialize_ladder()
        if programs is None:
            raise RuntimeError(
                "serving ladder does not survive serialize/deserialize on "
                "this backend even when freshly compiled — AOT persistence "
                "unavailable here; rely on the persistent compilation cache")

        srv = self._serving
        enc = self.image_encoder
        args_tree = (enc.params, enc.quant_vars, self._label_features,
                     self.head)
        mesh_info = None
        if srv["pix_sharding"] is not None:
            axis = srv["pix_sharding"].spec[0]
            mesh_info = {"axis": axis, "size": int(self.mesh.shape[axis])}
        dev = jax.devices()[0]
        payload = {
            "version": _AOT_CACHE_VERSION,
            "platform": dev.platform,
            "device_kind": dev.device_kind,
            "num_devices": len(jax.devices()),
            "mesh": mesh_info,
            "image_shape": tuple(srv["image_shape"]),
            "dtype": str(srv["dtype"]),
            "arg_treedef": srv["arg_treedef"],
            "arg_avals": [(tuple(x.shape), str(jnp.asarray(x).dtype))
                          for x in jax.tree_util.tree_leaves(args_tree)],
            "programs": programs,
        }
        if include_runtime:
            def tree_to_host(tree):
                leaves, treedef = jax.tree_util.tree_flatten(tree)
                return treedef, [np.asarray(x) for x in leaves]

            payload["runtime"] = {
                "label_features": tree_to_host(self._label_features),
                "head": tree_to_host(self.head),
                "info": dict(self.info),
                # provenance for staleness checks (scripts/serve.py
                # refuses a full restore when the configured prompt set
                # no longer matches what the labels were encoded from)
                "class_prompts": (list(self._class_prompts)
                                  if self._class_prompts is not None
                                  else None),
            }
        path = str(path)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
        return path

    def load_serving(self, path) -> "ProbabilisticVLM":
        """Restore an AOT serving ladder saved by `save_serving`,
        skipping XLA compilation: the instant-restart lane (measured:
        deserialize+load ~1s vs minutes of ladder compile on a cold
        cache — BASELINE.md). Raises ValueError on ANY signature
        mismatch (platform/device/mesh/arg shapes); callers should
        catch and fall back to compile_serving (scripts/serve.py
        --aot_cache does exactly that).

        Call this at process start. XLA's deserialize is one of the two
        code-emitting ops behind the suite's resident-state flake
        (tests/conftest.py diagnosis); a fresh, lean server process —
        the production restart scenario — is the regime where it is
        reliable, and how this is tested.
        """
        import pickle

        import jax
        from jax.experimental import serialize_executable as se

        if self._label_features is None:
            raise ValueError("call set_class_prompts before load_serving")
        with open(path, "rb") as f:
            payload = pickle.load(f)
        if payload.get("version") != _AOT_CACHE_VERSION:
            raise ValueError(
                f"AOT cache version {payload.get('version')} != "
                f"{_AOT_CACHE_VERSION}")
        dev = jax.devices()[0]
        expect = {"platform": dev.platform, "device_kind": dev.device_kind,
                  "num_devices": len(jax.devices())}
        for key, want in expect.items():
            if payload[key] != want:
                raise ValueError(
                    f"AOT cache {key} mismatch: saved "
                    f"{payload[key]!r}, runtime {want!r}")
        sharded = self.mesh is not None and self.mesh.devices.size > 1
        if bool(payload["mesh"]) != sharded:
            raise ValueError(
                f"AOT cache mesh layout mismatch: saved "
                f"{payload['mesh']}, runtime "
                f"{'sharded' if sharded else 'single-device'}")
        pix_sharding = rep = None
        if sharded:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = payload["mesh"]["axis"]
            if (axis not in self.mesh.axis_names
                    or int(self.mesh.shape[axis]) != payload["mesh"]["size"]):
                raise ValueError(
                    f"AOT cache mesh mismatch: saved {payload['mesh']}, "
                    f"runtime axes {dict(self.mesh.shape)}")
            pix_sharding = NamedSharding(self.mesh, P(axis, None, None, None))
            rep = NamedSharding(self.mesh, P())
            if self.image_encoder.mesh is not self.mesh:
                self.image_encoder = self.image_encoder.with_mesh(self.mesh)
            self._label_features = jax.device_put(self._label_features, rep)
            self.head = jax.device_put(self.head, rep)
        enc = self.image_encoder
        enc._validate_quant_cache()
        args_tree = (enc.params, enc.quant_vars, self._label_features,
                     self.head)
        treedef = jax.tree_util.tree_structure(args_tree)
        if treedef != payload["arg_treedef"]:
            raise ValueError(
                "AOT cache runtime-argument structure mismatch "
                "(e.g. int8 cache present on one side only)")
        avals = [(tuple(x.shape), str(jnp.asarray(x).dtype))
                 for x in jax.tree_util.tree_leaves(args_tree)]
        if avals != payload["arg_avals"]:
            bad = next((i, a, b) for i, (a, b) in
                       enumerate(zip(avals, payload["arg_avals"])) if a != b)
            raise ValueError(
                f"AOT cache runtime-argument shape/dtype mismatch at "
                f"leaf {bad[0]}: runtime {bad[1]}, saved {bad[2]} "
                f"(changed class count / projection / weights layout?)")
        vcfg = enc.config.vision
        if tuple(payload["image_shape"]) != (vcfg.image_size,
                                             vcfg.image_size, 3):
            raise ValueError(
                f"AOT cache image shape {payload['image_shape']} != model "
                f"{(vcfg.image_size, vcfg.image_size, 3)}")
        # deserialize_and_load defaults execution_devices to EVERY backend
        # device — wrong for a 1-device program on a multi-device backend
        # (and for a mesh narrower than the backend): pass the devices the
        # program was actually compiled for
        exec_devices = (tuple(self.mesh.devices.flat) if sharded
                        else (jax.devices()[0],))
        programs = {
            int(b): se.deserialize_and_load(blob, in_tree, out_tree,
                                            execution_devices=exec_devices)
            for b, (blob, in_tree, out_tree) in payload["programs"].items()
        }
        self._serving = dict(
            programs=programs,
            image_shape=tuple(payload["image_shape"]),
            dtype=jnp.dtype(payload["dtype"]),
            pix_sharding=pix_sharding, rep=rep,
            arg_treedef=treedef,
        )
        return self

    def _predict_fast(self, images, num_samples: int,
                      class_prompts) -> Optional[jnp.ndarray]:
        """Run the AOT program when the call matches its signature;
        None -> caller falls back to the general path."""
        if (self._serving is None or num_samples != 0
                or class_prompts is not None
                or isinstance(images, EncoderResult)):
            return None
        import jax

        srv = self._serving
        pixels = self._pixels(images)
        if tuple(pixels.shape[1:]) != srv["image_shape"]:
            return None
        exe = srv["programs"].get(int(pixels.shape[0]))
        if exe is None:  # no program compiled for this batch size
            return None
        if pixels.dtype != srv["dtype"]:
            if not (jnp.issubdtype(pixels.dtype, jnp.floating)
                    and jnp.issubdtype(srv["dtype"], jnp.floating)):
                # coercing across the uint8/float boundary would silently
                # skip (or fake) the in-graph uint8 normalization lane
                # (forward_graph branches on pixels.dtype == uint8):
                # fall back to the general path instead
                return None
            pixels = pixels.astype(srv["dtype"])
        enc = self.image_encoder
        enc._validate_quant_cache()
        params, quant, labels, head = (enc.params, enc.quant_vars,
                                       self._label_features, self.head)
        if jax.tree_util.tree_structure(
                (params, quant, labels, head)) != srv["arg_treedef"]:
            # runtime-argument structure changed since compile (e.g.
            # prequantize_int8 ran after compile_serving, or the encoder
            # was swapped): the AOT program can't serve it — fall back
            return None
        if srv["pix_sharding"] is not None:
            # sharded lane: the AOT executable rejects inputs whose
            # committed sharding differs from the compiled one — re-pin
            # everything (no-op when nothing moved; catches e.g. a
            # with_projection update that introduced unplaced leaves or
            # re-encoded same-shape class prompts)
            pixels = jax.device_put(pixels, srv["pix_sharding"])
            params = jax.device_put(params, srv["rep"])
            quant = jax.device_put(quant, srv["rep"]) \
                if quant is not None else None
            labels = jax.device_put(labels, srv["rep"])
            head = jax.device_put(head, srv["rep"])
        if isinstance(images, jax.Array) and pixels is images:
            # the executable donates its pixel argument; never invalidate
            # a buffer the caller still owns (a no-op device_put above
            # returns the same object; jnp.array copy keeps the sharding)
            pixels = jnp.array(pixels, copy=True)
        return exe(params, quant, labels, head, pixels)

    # -- inference ------------------------------------------------------

    def logits(self, images, class_prompts: Optional[Sequence[str]] = None,
               batch_size: int = 256) -> ProbabilisticLogits:
        """Probabilistic similarity logits (mean + variance) of images
        vs the class prompts (ref:bayesvlm/precompute.py:18-65 +
        vlm.py:630-684 semantics)."""
        if class_prompts is not None:
            labels = self.encode_texts(class_prompts)
        elif self._label_features is not None:
            labels = self._label_features
        else:
            raise ValueError("pass class_prompts or call set_class_prompts")
        feats = images if isinstance(images, EncoderResult) \
            else self.encode_images(images, batch_size=batch_size)
        if self.mesh is not None:
            from bayesvlm_tpu.inference.predictions import (
                make_predictions_sharded,
            )

            # honor batch_size on the sharded path too: chunk the head
            # program so large serving sets never land on device whole
            n = len(feats)
            step = max(batch_size, self.mesh.devices.size)
            return ProbabilisticLogits.concatenate([
                make_predictions_sharded(
                    self.head, feats[i:i + step], labels, self.mesh)
                for i in range(0, n, step)
            ])
        from bayesvlm_tpu.inference.predictions import make_predictions

        return make_predictions(self.head, feats, labels,
                                batch_size=batch_size)

    def predict(self, images, class_prompts: Optional[Sequence[str]] = None,
                num_samples: int = 0, seed: int = 0,
                batch_size: int = 256) -> jnp.ndarray:
        """Calibrated class probabilities [B, C]: probit approximation
        when num_samples=0 (ref:scripts/zeroshot.py:119-120), MC softmax
        otherwise (ref:bayesvlm/vlm.py:80-103). Delegates to
        ProbabilisticLogits.softmax, which handles the full-covariance
        variance shape correctly as well. When compile_serving() has
        been called and the input matches its signature, the fused AOT
        program serves the call in one dispatch."""
        fast = self._predict_fast(images, num_samples, class_prompts)
        if fast is not None:
            return fast
        pl = self.logits(images, class_prompts, batch_size=batch_size)
        return pl.softmax(num_samples=num_samples, seed=seed)
