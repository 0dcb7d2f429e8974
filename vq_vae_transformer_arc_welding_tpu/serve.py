"""Production inference pipeline: checkpoints -> batched on-device serving.

The reference has no serving path (training scripts only); this module
packages the deployment story for the rebuilt stack: load a VQ-VAE
checkpoint (ours or a reference Lightning .ckpt) plus optionally a
transformer/classifier checkpoint, and serve welding-quality decisions
for streams of cycle windows with fixed-shape jitted calls (pad +
mask), device-resident weights, and optional Pallas kernels.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .data.asimow import CYCLE_LEN
from .models.transformer import TransformerDecoder
from .models.vqvae_patch import VQVAEPatch


class WeldingQualityPipeline:
    """Fused encode + VQ + transformer-classify serving pipeline.

    vqvae / transformer are (model, params, state) / (model, params)
    triples-or-pairs; use `from_checkpoints` for file-based loading.
    """

    #: classify() warns (and sets needs_recalibration) when the
    #: monitored clipped-activation fraction exceeds this. 1% clipped
    #: activations is well past the measured graceful-degradation
    #: envelope (tests/test_serve.py shifted-distribution case) —
    #: recalibrate on recent windows or fall back to precision='f32'.
    saturation_threshold: float = 0.01

    def __init__(self, vqvae, transformer, n_cycles: int,
                 max_batch: int = 64, precision: str = "f32",
                 start_token: int | None = None, mesh=None,
                 encoder_precision: str = "f32",
                 encoder_impl: str = "xla",
                 monitor_saturation: bool = True):
        """precision: 'f32' (exact), 'bf16' (half-traffic activations),
        or 'int8' (calibrated MXU int8 with whole-block Pallas fusion —
        call calibrate() with sample windows before classify; ~2x the
        f32 throughput at the bench config, label-identical).

        start_token: the <start> id the transformer was trained with.
        The training pipeline derives it as observed_max_token + 1
        (data/datasets.py::make_autoregressive, reproducing the
        reference quirk), which equals num_embeddings only when every
        codebook entry occurs in the training data. Pass the trained
        value explicitly when the codebook has dead codes; the default
        assumes full codebook usage.

        mesh: an optional `jax.sharding.Mesh` with a 'data' axis
        (parallel.mesh.make_mesh). When given, weights are replicated
        across the mesh and every batched entry point shards its batch
        over 'data' via shard_map — serving throughput scales over
        chips with zero model changes (each device runs the same fused
        kernels on its local shard; no collectives are needed for
        inference). Results are identical to single-device serving."""
        self.vq_model, self.vq_params, self.vq_state = vqvae
        self.tr_model, self.tr_params = transformer
        if precision == "bf16":
            self.tr_model.compute_dtype = jnp.bfloat16
        self.precision = precision
        self.qparams = None
        # encoder_precision='int8' (opt-in, calibrate() first) quantizes
        # the VQ-VAE encoder's center-tap matmuls; codebook indices are
        # then no longer bit-comparable to the reference (BASELINE.md
        # contract) — measure the flip rate / label agreement on your
        # checkpoint first (models/quantized.encode_indices_quantized)
        self.encoder_precision = encoder_precision
        # encoder_impl='xla' (default) keeps classify()'s encoder on
        # the exact XLA path so results are stable across versions.
        # 'fused' (opt-in) runs the f32 resblock chain through the
        # fused Pallas kernel (ops/pallas_encoder.py) — +15%
        # end-to-end; on-TPU indices can differ from the XLA path on
        # ~0.25% of codes (gelu erf-approximation ulps at Voronoi
        # boundaries). The 100% label agreement backing 'fused' was
        # measured on the bench checkpoint (BENCHMARKS.md round 4) —
        # measure label agreement on YOUR checkpoint before opting in.
        # The PUBLIC token API (encode_tokens) and calibration always
        # use the exact XLA path, as does training (data/latent.py).
        self.encoder_impl = encoder_impl
        self.qenc = None
        self.n_cycles = n_cycles
        self.max_batch = max_batch
        # monitor_saturation (DEFAULT ON): int8 classify() folds a
        # per-row clipped-activation counter into the already-computed
        # forward (rail-counts on the kernel's int8 fc input + fused
        # compares on the f32 sites — models/quantized.py sat_rows;
        # zero extra compute passes) and warns past
        # saturation_threshold — the guard against silent calibration
        # drift. The detailed per-site probe stays opt-in
        # (saturation_rate()). The flag is baked into the jitted
        # classify at trace time, so it is a property whose setter
        # re-jits — toggling after the first classify() takes effect.
        self._monitor_saturation = monitor_saturation
        self.last_saturation_rate: float | None = None
        self.needs_recalibration = False
        self.start_token = (start_token if start_token is not None
                            else self.vq_model.num_embeddings)
        # optional data.scaler.StandardScaler carrying the TRAIN-split
        # normalization stats (the model only ever saw scaled windows —
        # reference asimow_dataloader.py:174-177). classify() takes
        # pre-scaled arrays; attach the training scaler here so deploys
        # (save_artifact / the score_quality CLI) can normalize raw
        # sensor windows with the exact training statistics.
        self.scaler = None
        self.mesh = mesh
        if mesh is not None:
            from .parallel.mesh import put_replicated
            (self.vq_params, self.vq_state, self.tr_params) = put_replicated(
                (self.vq_params, self.vq_state, self.tr_params), mesh)
        self._rejit()

    @property
    def monitor_saturation(self) -> bool:
        return self._monitor_saturation

    @monitor_saturation.setter
    def monitor_saturation(self, value: bool):
        # the flag selects whether the jitted classify returns the
        # (probs, saturation) pair — changing it must drop the cached
        # trace or the toggle would be silently ignored
        if bool(value) != self._monitor_saturation:
            self._monitor_saturation = bool(value)
            self._rejit()

    def _rejit(self):
        ood_fn = lambda x: self.vq_model.forward_ood(  # noqa: E731
            self.vq_params, self.vq_state, x)
        if self.mesh is None:
            self._classify = jax.jit(self._classify_fn)
            self._encode = jax.jit(self._encode_fn)
            self._ood = jax.jit(ood_fn)
        else:
            self._classify = self._sharded(self._classify_fn)
            self._encode = self._sharded(self._encode_fn)
            self._ood = self._sharded(ood_fn)
        self._sat_probe = jax.jit(self._saturation_fn)

    def _sharded(self, fn):
        """Data-parallel wrapper: pad the batch to the 'data' axis
        size, shard it, run fn per device via shard_map, crop."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        try:
            from jax import shard_map  # jax >= 0.6: check_vma
            sm_kw = {"check_vma": False}
        except ImportError:
            # old experimental shard_map takes check_rep, not check_vma
            from jax.experimental.shard_map import shard_map
            sm_kw = {"check_rep": False}
        mesh = self.mesh
        n_data = mesh.shape["data"]
        smfn = jax.jit(shard_map(fn, mesh=mesh, in_specs=P("data"),
                                 out_specs=P("data"), **sm_kw))
        ds = NamedSharding(mesh, P("data"))

        def call(x):
            n = x.shape[0]
            pad = (-n) % n_data
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
            out = smfn(jax.device_put(x, ds))
            # fn may return a pytree of batch-leading arrays (the int8
            # classify path's (probs, saturation) pair) — crop rows per
            # leaf, never the tuple itself
            return jax.tree_util.tree_map(lambda y: y[:n], out)
        return call

    def calibrate(self, sample_windows: np.ndarray,
                  max_samples: int | None = None):
        """Calibrate int8 activation scales on representative windows
        (required before classify() when precision='int8').

        Uses ALL provided windows by default; pass max_samples to cap
        the calibration set. Coverage matters: the scales clip any
        future activation larger than what calibration saw (x1.25
        headroom margin), so calibrate on windows spanning the welding
        regimes you will serve — see tests/test_serve.py's
        shifted-distribution case for the measured envelope."""
        from .models.quantized import (calibrate_activation_absmax,
                                       quantize_transformer)
        if max_samples is not None:
            sample_windows = sample_windows[:max_samples]
        if self.encoder_precision == "int8":
            from .models.quantized import (calibrate_encoder_absmax,
                                           quantize_encoder)
            cyc = jnp.asarray(sample_windows, jnp.float32).reshape(
                -1, CYCLE_LEN, 2)
            enc_am = calibrate_encoder_absmax(
                self.vq_model, self.vq_params, self.vq_state, cyc)
            self._enc_absmax = dict(enc_am)
            self.qenc = quantize_encoder(self.vq_model, self.vq_params,
                                         enc_am)
            self._rejit()  # drop any f32-encoder trace before calibrating
        ids = self._encode(jnp.asarray(sample_windows, jnp.float32))
        ids = jnp.concatenate(
            [jnp.full((ids.shape[0], 1), self.start_token, ids.dtype), ids],
            axis=1)
        am = calibrate_activation_absmax(self.tr_model, self.tr_params, ids)
        self._act_absmax = dict(am)
        self.qparams = quantize_transformer(self.tr_params, act_absmax=am)
        self._rejit()
        return am

    # -- artifact persistence ----------------------------------------------
    #
    # A deployed pipeline is more than the two training checkpoints: the
    # int8 path adds calibration state (activation absmax tables) that a
    # naive restart would have to re-derive from representative traffic.
    # save_artifact/load_artifact make the FULL serving state a single
    # self-contained directory, so deploys are repeatable and
    # calibration is versioned alongside the weights it was measured
    # for. (No reference counterpart — the reference has no serving
    # story.) The absmax tables are tiny scalar dicts; the int8 weight
    # tables are re-derived deterministically from (weights, absmax) at
    # load, so the artifact stays small and quantization stays
    # bit-reproducible.

    ARTIFACT_VERSION = 1

    def save_artifact(self, artifact_dir: str):
        """Persist weights + serving config + int8 calibration to a
        directory. Restore with `WeldingQualityPipeline.load_artifact` —
        no re-calibration windows needed."""
        import json
        import os
        os.makedirs(artifact_dir, exist_ok=True)
        vq_params = jax.device_get(self.vq_params)
        vq_state = jax.device_get(self.vq_state)
        tr_params = jax.device_get(self.tr_params)
        self.vq_model.save(os.path.join(artifact_dir, "vqvae.ckpt"),
                           vq_params, vq_state)
        self.tr_model.save(os.path.join(artifact_dir, "transformer.ckpt"),
                           tr_params, {})
        manifest = {
            "artifact_version": self.ARTIFACT_VERSION,
            "n_cycles": self.n_cycles,
            "max_batch": self.max_batch,
            "precision": self.precision,
            "encoder_precision": self.encoder_precision,
            "encoder_impl": self.encoder_impl,
            "start_token": int(self.start_token),
            "saturation_threshold": float(self.saturation_threshold),
            "monitor_saturation": bool(self.monitor_saturation),
            "calibrated": self.qparams is not None,
            "encoder_calibrated": self.qenc is not None,
            "has_scaler": self.scaler is not None,
        }
        with open(os.path.join(artifact_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        cal = {"act_absmax": getattr(self, "_act_absmax", None),
               "enc_absmax": getattr(self, "_enc_absmax", None)}
        with open(os.path.join(artifact_dir, "calibration.json"), "w") as f:
            json.dump(cal, f, indent=2)
        if self.scaler is not None:
            with open(os.path.join(artifact_dir, "scaler.json"), "w") as f:
                json.dump({"mean": np.asarray(self.scaler.mean_).tolist(),
                           "scale": np.asarray(self.scaler.scale_).tolist()},
                          f, indent=2)
        return artifact_dir

    @classmethod
    def load_artifact(cls, artifact_dir: str, mesh=None,
                      max_batch: int | None = None):
        """Rebuild a pipeline from `save_artifact` output. int8
        quantization tables are re-derived from the stored weights +
        absmax calibration (deterministic, bit-identical to the saved
        pipeline's); `mesh`/`max_batch` may be overridden for the new
        deployment target."""
        import json
        import os
        with open(os.path.join(artifact_dir, "manifest.json")) as f:
            manifest = json.load(f)
        if manifest["artifact_version"] > cls.ARTIFACT_VERSION:
            raise ValueError(
                f"artifact version {manifest['artifact_version']} is newer "
                f"than this build supports ({cls.ARTIFACT_VERSION})")
        vq = VQVAEPatch.load(os.path.join(artifact_dir, "vqvae.ckpt"))
        tr_model, tr_params, _ = TransformerDecoder.load(
            os.path.join(artifact_dir, "transformer.ckpt"))
        pipe = cls(vq, (tr_model, tr_params), manifest["n_cycles"],
                   max_batch=(max_batch if max_batch is not None
                              else manifest["max_batch"]),
                   precision=manifest["precision"],
                   start_token=manifest["start_token"], mesh=mesh,
                   encoder_precision=manifest["encoder_precision"],
                   encoder_impl=manifest["encoder_impl"],
                   monitor_saturation=manifest.get("monitor_saturation",
                                                   True))
        pipe.saturation_threshold = manifest.get(
            "saturation_threshold", cls.saturation_threshold)
        cal_path = os.path.join(artifact_dir, "calibration.json")
        cal = {}
        if os.path.exists(cal_path):
            with open(cal_path) as f:
                cal = json.load(f)
        if manifest.get("encoder_calibrated"):
            if not cal.get("enc_absmax"):
                raise ValueError("manifest says encoder_calibrated but "
                                 "calibration.json has no enc_absmax")
            from .models.quantized import quantize_encoder
            pipe._enc_absmax = dict(cal["enc_absmax"])
            pipe.qenc = quantize_encoder(pipe.vq_model, pipe.vq_params,
                                         pipe._enc_absmax)
        if manifest.get("calibrated"):
            if not cal.get("act_absmax"):
                raise ValueError("manifest says calibrated but "
                                 "calibration.json has no act_absmax")
            from .models.quantized import quantize_transformer
            pipe._act_absmax = dict(cal["act_absmax"])
            pipe.qparams = quantize_transformer(pipe.tr_params,
                                                act_absmax=pipe._act_absmax)
        if manifest.get("encoder_calibrated") or manifest.get("calibrated"):
            pipe._rejit()
        if manifest.get("has_scaler"):
            from .data.scaler import StandardScaler
            with open(os.path.join(artifact_dir, "scaler.json")) as f:
                sc = json.load(f)
            scaler = StandardScaler()
            scaler.mean_ = np.asarray(sc["mean"], np.float64)
            scaler.scale_ = np.asarray(sc["scale"], np.float64)
            pipe.scaler = scaler
        return pipe

    @classmethod
    def from_checkpoints(cls, vqvae_ckpt: str, transformer_ckpt: str,
                         n_cycles: int = 20, max_batch: int = 64,
                         precision: str = "f32",
                         start_token: int | None = None, mesh=None,
                         encoder_precision: str = "f32",
                         encoder_impl: str = "xla"):
        from .cli.shared import load_vqvae_any
        vq = load_vqvae_any(vqvae_ckpt)
        tr_model, tr_params, _ = TransformerDecoder.load(transformer_ckpt)
        return cls(vq, (tr_model, tr_params), n_cycles, max_batch,
                   precision=precision, start_token=start_token, mesh=mesh,
                   encoder_precision=encoder_precision,
                   encoder_impl=encoder_impl)

    # -- jitted cores ------------------------------------------------------

    def _encode_cycles(self, cycles, *, fused: bool):
        if self.encoder_precision == "int8":
            if self.qenc is None:
                raise RuntimeError(
                    "encoder_precision='int8' requires calibrate(sample) "
                    "first")
            from .models.quantized import encode_indices_quantized
            return encode_indices_quantized(self.vq_model, self.qenc,
                                            self.vq_params, self.vq_state,
                                            cycles)
        if fused and self.encoder_impl == "fused":
            from .ops.pallas_encoder import encode_indices_fused
            return encode_indices_fused(self.vq_model, self.vq_params,
                                        self.vq_state, cycles)
        return self.vq_model.encode_indices(self.vq_params, self.vq_state,
                                            cycles)

    def _encode_fn(self, x):
        # public token API (encode_tokens) and calibration: exact XLA
        # encoder — ids stay bit-comparable to the training-time
        # data/latent.py tokens (BASELINE.md contract). The fused
        # kernel serves only classify(), whose label agreement is
        # measured (BENCHMARKS.md round 4).
        b = x.shape[0]
        cycles = x.reshape(b * self.n_cycles, CYCLE_LEN, 2)
        ids = self._encode_cycles(cycles, fused=False)
        return ids.reshape(b, self.n_cycles * self.vq_model.enc_out_len)

    def _classify_fn(self, x):
        b = x.shape[0]
        cycles = x.reshape(b * self.n_cycles, CYCLE_LEN, 2)
        ids = self._encode_cycles(cycles, fused=True)
        ids = ids.reshape(b, self.n_cycles * self.vq_model.enc_out_len)
        ids = jnp.concatenate(
            [jnp.full((b, 1), self.start_token, ids.dtype), ids], axis=1)
        if self.precision == "int8":
            if self.qparams is None:
                raise RuntimeError(
                    "precision='int8' requires calibrate(sample) first")
            from .models.quantized import quantized_classify
            # calibrated scales enable whole-block Pallas fusion
            # (ops/pallas_block_quant.py) — the bench-winning path
            sat_rows = [] if self.monitor_saturation else None
            logits = quantized_classify(self.tr_model, self.qparams, ids,
                                        block_fusion="attn",
                                        sat_rows=sat_rows)
            if sat_rows is not None and sat_rows:
                # per-row mean over the monitored sites; padded rows are
                # cropped by the chunking layer like the probs
                return (jax.nn.softmax(logits, axis=-1),
                        jnp.mean(jnp.stack(sat_rows), axis=0))
        else:
            logits, _ = self.tr_model.apply(self.tr_params, None, ids,
                                            generate=False)
        return jax.nn.softmax(logits, axis=-1)

    def _saturation_fn(self, x):
        from .models.quantized import saturation_stats
        b = x.shape[0]
        cycles = x.reshape(b * self.n_cycles, CYCLE_LEN, 2)
        ids = self._encode_cycles(cycles, fused=False)
        ids = ids.reshape(b, self.n_cycles * self.vq_model.enc_out_len)
        ids = jnp.concatenate(
            [jnp.full((b, 1), self.start_token, ids.dtype), ids], axis=1)
        overall, per_site = saturation_stats(self.tr_model, self.qparams,
                                             ids)
        return overall, per_site

    def saturation_rate(self, windows: np.ndarray):
        """Clipped-activation fraction of the calibrated int8 path on
        `windows` (up to max_batch of them): (overall, per_site dict).

        0 on the calibration distribution; rises when serving drifts
        beyond what calibrate() saw. Past saturation_threshold,
        recalibrate on recent windows or serve precision='f32'."""
        if self.qparams is None:
            raise RuntimeError("saturation_rate requires calibrate() first")
        if len(windows) == 0:
            # the fixed-shape padding below repeats x[-1:]; an empty
            # array would fail deep inside the jitted probe instead
            raise ValueError("saturation_rate: windows is empty")
        x = np.asarray(windows, np.float32)[: self.max_batch]
        pad = self.max_batch - len(x)
        if pad > 0:  # same single-graph contract as _batched
            x = np.concatenate(
                [x] + [x[-1:]] * pad)  # repeat real data, not zeros
        overall, per_site = self._sat_probe(jnp.asarray(x))
        return float(overall), {k: float(v) for k, v in per_site.items()}

    def _note_saturation(self, rate: float):
        import warnings
        self.last_saturation_rate = rate
        if rate > self.saturation_threshold:
            self.needs_recalibration = True
            warnings.warn(
                f"int8 activation saturation {rate:.2%} exceeds "
                f"{self.saturation_threshold:.2%}: serving distribution "
                "has drifted beyond calibration — recalibrate() on "
                "recent windows or fall back to precision='f32'",
                RuntimeWarning, stacklevel=3)

    # -- public batched API ------------------------------------------------

    def _batched(self, fn, x: np.ndarray) -> np.ndarray:
        """Run fn over fixed max_batch chunks (every block padded up to
        max_batch) so exactly ONE graph compiles regardless of request
        size — varying small requests never trigger recompiles."""
        from .data.latent import _chunked_device_map
        return _chunked_device_map(fn, x, chunk=self.max_batch)

    def classify(self, windows: np.ndarray):
        """windows: (N, n_cycles*200, 2) scaled cycles. Returns
        (labels (N,), probs (N, 2)).

        int8 pipelines also update `last_saturation_rate` from the
        in-path clipped-activation counter (free — see
        monitor_saturation) and warn past `saturation_threshold`."""
        windows = np.asarray(windows, np.float32)
        if windows.shape[0] == 0:
            raise ValueError("classify: windows is empty")
        out = self._batched(self._classify, windows)
        if isinstance(out, tuple):
            probs, sat = out
            self._note_saturation(float(np.mean(sat)))
        else:
            probs = out
        return probs.argmax(-1), probs

    def encode_tokens(self, windows: np.ndarray) -> np.ndarray:
        """(N, n_cycles*200, 2) -> (N, n_cycles*16) codebook ids."""
        windows = np.asarray(windows, np.float32)
        if windows.shape[0] == 0:
            raise ValueError("encode_tokens: windows is empty")
        return self._batched(self._encode, windows)

    def ood_score(self, cycles: np.ndarray) -> np.ndarray:
        """(N, 200, 2) single cycles -> per-sample quantization-error
        OOD score (reference forward_ood capability)."""
        return self._batched(self._ood, np.asarray(cycles, np.float32))

    def sample_tokens(self, n: int | None = None, *,
                      prompt: np.ndarray | None = None,
                      top_k: int | None = None, seed: int = 0,
                      num_steps: int | None = None,
                      cache_dtype=None, param_dtype=None,
                      cache_buckets: int | None = None) -> np.ndarray:
        """Autoregressively sample latent token sequences from the
        generation head (KV-cached: batched prefill, recompute tail once
        the context outgrows seq_len).

        Either `n` fresh sequences from the start token, or
        continuations of `prompt` (N, t) token ids — the prompt is
        prefixed with the start token, prefilled in one forward, and
        `num_steps` (default seq_len) tokens are appended. Returns the
        sampled ids without the start token (prompt included when
        given).

        cache_dtype=jnp.bfloat16 stores the K/V caches in bf16
        (scoring stays f32): measured 0.65 -> 0.42 ms/token at the
        bench config with 99.6% sampled-id agreement (BENCHMARKS.md
        round 5) — ids can differ near probability ties, so the
        default stays exact f32.

        param_dtype=jnp.bfloat16 additionally streams the decode-step
        weight matrices in bf16 (f32 accumulation; prefill and the
        recompute tail stay exact f32) — see generate_kv and the
        BENCHMARKS.md round-5 decode table.

        cache_buckets=G segments the decode scan so early steps read
        only a static cache prefix (identical masked-softmax math; the
        smaller einsum's reduction order drifts at the ulp level, so
        ~0.1-0.4% of sampled ids can flip at probability ties).
        Measured fast recipe at the bench config
        (cache_dtype=jnp.bfloat16, cache_buckets=64): **0.64 -> 0.31
        ms/token**, id agreement 0.996 (BENCHMARKS.md round 5). The
        default stays the exact single-scan f32 path.

        Batch guidance (round-3 sweep, BENCHMARKS.md): the fast
        recipe wins 2.0-3.0x from b=16 up (peak ~179k tokens/s at
        b=128) but LOSES at b=1 (0.226 vs 0.189 ms/step — a single
        stream is dispatch-latency-bound and the segment bodies add
        overhead); keep the exact default for single-stream decode."""
        if prompt is not None:
            prompt = jnp.asarray(prompt, jnp.int32)
            start = jnp.concatenate(
                [jnp.full((prompt.shape[0], 1), self.start_token, jnp.int32),
                 prompt], axis=1)
        else:
            if n is None:
                raise ValueError("pass n (fresh samples) or prompt")
            start = jnp.full((n, 1), self.start_token, jnp.int32)
        # sampling stays f32 even in int8 pipelines: the KV loop is
        # latency-bound, not weight-bandwidth-bound (int8 weights
        # measured 1.00x at the bench config), and f32 keeps sampling
        # output-equal to the reference. models/quantized.py's
        # quantized_generate_kv exists for full-int8 deployments where
        # the 4x weight-memory reduction matters more.
        out = self.tr_model.generate_kv(
            self.tr_params, start, do_sample=True, top_k=top_k,
            rng=jax.random.PRNGKey(seed), num_steps=num_steps,
            cache_dtype=cache_dtype, param_dtype=param_dtype,
            cache_buckets=cache_buckets)
        return np.asarray(out[:, 1:])
