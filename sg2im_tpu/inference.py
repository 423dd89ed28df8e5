"""Inference engine: JSON scene graphs -> images, one jitted XLA program.

Replaces the reference inference path (``scripts/run_model.py:35-82`` +
``Sg2ImModel.forward_json``, ``sg2im/model.py:229-232``).  Graphs are padded
to bucketed static shapes so repeated calls with different graph counts hit
the compile cache; the whole forward (embeddings -> GCN -> layout kernels ->
CRN) is a single ``jax.jit``.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sg2im_tpu.data.batching import GraphBatch, round_up
from sg2im_tpu.data.scene_graphs import encode_scene_graphs
from sg2im_tpu.data.transforms import imagenet_deprocess_batch
from sg2im_tpu.models import Sg2ImGenerator


def _pad_rows(arr, n: int):
    out = np.zeros((n,) + arr.shape[1:], arr.dtype)
    out[: arr.shape[0]] = arr
    return out


class InferenceEngine:
    """Holds a generator + converted variables and serves generation calls."""

    def __init__(self, vocab, model_kwargs, variables, pad_align: int = 8,
                 mesh=None, compute_dtype=None, dense_precision=None,
                 crn_mode=None, deprocess_on_device: bool = False,
                 device=None, quantize=None, quant_opts=None,
                 noise_impl=None, noise_dtype=None, noise_downsample: int = 1,
                 tensor_parallel: bool = False):
        """``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis —
        generation batches shard over it (params replicated), scaling
        serving throughput across chips.

        ``tensor_parallel``: with ``mesh``, additionally shard the GCN
        hidden dimension over the mesh's 'model' axis
        (``parallel.mesh.tp_generator_sharding`` — the framework's real
        TP rule).  Opt-in because the split hidden-dim contraction is
        psum'd across chips: equal to the replicated mode within f32
        tolerance, not bitwise.

        ``device``: optional ``jax.Device`` to pin THIS engine to (params
        and every per-call array committed there) — the per-chip replica
        serving mode: one independent engine per device, whole requests
        dispatched round-robin (lower per-request latency than sharding
        each batch over the mesh; see serve ``--replicas``).  Mutually
        exclusive with ``mesh``.

        ``compute_dtype``: e.g. ``jnp.bfloat16`` for the bf16 CRN
        activation chain (+4% e2e at 64 dB PSNR vs f32 — the bench's
        default mode); ``None`` (default) keeps exact-f32 reference
        numerics.

        ``dense_precision``: e.g. ``'high'`` (3-pass bf16, ~f32-accurate)
        for the GCN/head Dense layers — a serving speed knob; ``None``
        (default) keeps the parity-grade HIGHEST.

        ``crn_mode``: e.g. ``'split'`` (per-branch CRN stage conv0, the
        wide concat tensor never materialized — +5% e2e, exact up to sum
        reassociation); ``None`` (default) keeps the reference-shaped
        'legacy' composition.

        ``deprocess_on_device``: fold the imagenet-deprocess (denorm +
        per-image min-max rescale + uint8) into the serving program, so
        :meth:`generate` fetches uint8 instead of f32 — 4x less
        device->host traffic per request and the reductions run on-chip.
        Default off (host deprocess, bit-exact reference path).

        ``quantize``: 'int8' runs the high-res CRN stage convs on the
        int8 MXU path (the opt-in TURBO serving tier — dynamic symmetric
        quantization in-program, checkpoints unaffected).  A measured
        accuracy trade for throughput; fidelity is recorded per round in
        BENCH_*.json and SERVING.md.  Default ``None`` (no quantization).
        ``quant_opts`` selects the tier's stage band (per-key merge into
        the adopted default ``{'max_res': 64}`` — stages above 64 px and
        the head exempt; 44.4 dB u8 gate at +13% measured; an explicit
        ``{'max_res': None}`` restores the unbounded round-4 band, +19%
        at 42.2 dB with ``{'head': False}`` — frontier in SERVING.md).

        ``noise_impl``: PRNG implementation for the seeded in-program
        layout-noise draw.  Default threefry (the JAX default) carries
        the reproducibility contract (same graph+seed -> same image
        across pad buckets / coalesced batches / mesh shardings).
        'rbg' uses the hardware RngBitGenerator — measured 2.1x faster
        on the 67M-element b128 draw (scripts/profile_int8_rng.py) but
        deterministic only per (seed, padded shape): a request's noise
        CHANGES with its pad bucket / coalesced batch, so same-seed
        replay holds only under identical batching.  Turbo-tier option.

        ``noise_dtype``: dtype of the seeded noise draw (default f32,
        the reference-bit path).  ``jnp.bfloat16`` halves the draw's
        generation cost and HBM write; the CRN consumes compute_dtype
        anyway, so in bf16 mode the only delta is rounding the normals
        themselves.  Turbo-tier option (no bit-parity contract).

        ``noise_downsample``: draw the seeded layout noise at
        (H/f, W/f) and nearest-upsample on-chip (f in {1, 2, 4};
        default 1 = full-res reference path).  f=2 generates 4x fewer
        random bits — the draw is the dominant term of the serve-vs-raw
        gap (SERVING.md) — at the cost of a CHANGED noise distribution:
        the layout noise channel becomes block-constant over fxf pixel
        tiles (spatially correlated instead of iid).  Turbo-tier option:
        affects only the seeded in-program draw (``noise=None``);
        explicit noise arrays and 'zeros' are untouched."""
        # The seeded in-program noise path's reproducibility contract (same
        # graph+seed -> same image regardless of pad bucket, coalesced
        # batch, or mesh sharding) requires partitionable threefry (the
        # JAX default).  A library constructor must not mutate global
        # jax.config (that would silently change the caller's own RNG
        # streams and invalidate their compiled programs), so warn loudly
        # instead; the serve CLI, which owns its process, pins the flag.
        if noise_impl not in (None, "threefry", "rbg"):
            raise ValueError(f"unknown noise_impl {noise_impl!r}")
        self.noise_impl = noise_impl or "threefry"
        self.noise_dtype = noise_dtype
        if noise_downsample not in (1, 2, 4):
            raise ValueError(
                f"noise_downsample must be 1, 2, or 4, got "
                f"{noise_downsample!r}")
        H_chk, W_chk = (model_kwargs or {}).get("image_size", (64, 64))
        if H_chk % noise_downsample or W_chk % noise_downsample:
            raise ValueError(
                f"noise_downsample {noise_downsample} does not divide "
                f"image_size ({H_chk}, {W_chk})")
        self.noise_downsample = int(noise_downsample)
        if self.noise_impl == "threefry" and \
                not jax.config.jax_threefry_partitionable:
            import warnings

            warnings.warn(
                "jax_threefry_partitionable is disabled: InferenceEngine's "
                "seeded-noise reproducibility contract (same graph+seed -> "
                "same image across pad buckets / coalesced batches / mesh "
                "shardings) does not hold under this flag", stacklevel=2)
        self.vocab = vocab
        self.model_kwargs = dict(model_kwargs)
        if compute_dtype is not None:
            self.model_kwargs["compute_dtype"] = compute_dtype
        if dense_precision is not None:
            self.model_kwargs["dense_precision"] = dense_precision
        if crn_mode is not None:
            self.model_kwargs["crn_mode"] = crn_mode
        if quantize is not None:
            if quantize != "int8":
                raise ValueError(f"unknown quantize tier {quantize!r}")
            self.model_kwargs["crn_quant"] = quantize
            # Selective-quantization knobs (the turbo fidelity/throughput
            # frontier, SERVING.md): {'head': bool — quantize the output
            # head's 3x3; 'min_res'/'max_res': int — stage layout-
            # resolution band to quantize}.  The DEFAULT tier is the
            # round-5 adopted frontier point 'max_res': 64 — stages above
            # 64 px layout resolution (and therefore the head, which
            # follows its input stage) stay unquantized: measured on v5e
            # at vg128/b128 production-shaped, 44.4 dB u8 gate at +13%
            # serving throughput, vs 38.6 dB for the unbounded round-4
            # band (below the 40 dB north star once scored on
            # out-of-calibration inputs).  Per-key overrides merge into
            # the default; an explicit None value restores the model's
            # unbounded default for that key (e.g. {'max_res': None} is
            # the full round-4 band).
            opts = {"max_res": 64}
            opts.update(dict(quant_opts or {}))
            for k, v in opts.items():
                if k not in ("head", "min_res", "max_res"):
                    raise ValueError(f"unknown quant_opts key {k!r}")
                if v is None:
                    continue
                self.model_kwargs[f"crn_quant_{k}"] = v
        elif quant_opts:
            raise ValueError("quant_opts requires quantize='int8'")
        self.model = Sg2ImGenerator(vocab=vocab, **self.model_kwargs)
        self.mesh = mesh
        self.device = device
        if mesh is not None and device is not None:
            raise ValueError("mesh and device are mutually exclusive")
        if mesh is not None:
            if tensor_parallel:
                # Shard the GCN hidden dimension over the mesh's 'model'
                # axis (Megatron column/row-parallel rule; GSPMD inserts
                # the psum).  Results are f32-tolerance equal to the
                # replicated mode, not bitwise (the hidden-dim sum splits
                # across chips) — that is why this is opt-in.
                from sg2im_tpu.parallel.mesh import shard_generator_tp

                variables = shard_generator_tp(
                    jax.tree.map(jnp.asarray, variables), mesh)
            else:
                from sg2im_tpu.parallel.mesh import replicate_state

                variables = replicate_state(
                    jax.tree.map(jnp.asarray, variables), mesh)
        if device is not None:
            variables = jax.device_put(variables, device)
        self.variables = jax.tree.map(jnp.asarray, variables)
        self.pad_align = pad_align
        self.deprocess_on_device = bool(deprocess_on_device)

    # -- construction ------------------------------------------------------

    @classmethod
    def from_torch_checkpoint(cls, path: str, **kw) -> "InferenceEngine":
        """Load a reference ``.pt`` checkpoint (full or stripped layouts)."""
        from sg2im_tpu.ckpt.torch_convert import convert_checkpoint

        bundle = convert_checkpoint(path)
        return cls(bundle["vocab"], bundle["model_kwargs"],
                   bundle["generator"], **kw)

    @classmethod
    def from_bundle(cls, bundle, **kw) -> "InferenceEngine":
        return cls(bundle["vocab"], bundle["model_kwargs"],
                   bundle["generator"], **kw)

    # -- compiled forward --------------------------------------------------

    def _apply(self, variables, objs, triples, obj_mask, triple_mask,
               noise, calibrate=False):
        """``calibrate``: run with the 'quant' collection mutable — the
        int8 tier's activation scales are recorded (running max over
        calibration batches) and the collection is returned alongside the
        outputs.  The generated images are valid turbo outputs (the
        calibration pass quantizes with the fresh batch scales)."""
        if calibrate:
            out, muts = self.model.apply(
                variables, objs, triples, obj_mask, triple_mask,
                train=False, layout_noise=noise, mutable=["quant"],
            )
        else:
            out = self.model.apply(
                variables, objs, triples, obj_mask, triple_mask,
                train=False, layout_noise=noise,
            )
        if self.deprocess_on_device:
            from sg2im_tpu.data.transforms import (
                imagenet_deprocess_batch_jnp)

            out = out + (imagenet_deprocess_batch_jnp(out[0]),)
        # (muts may lack 'quant' when no stage clears quant_min_res)
        return (out, muts.get("quant", {})) if calibrate else out

    @functools.cached_property
    def _fwd(self):
        """One jitted forward; jax.jit caches compilations per input shape."""
        return jax.jit(self._apply)

    @functools.cached_property
    def _fwd_cal(self):
        """Explicit-noise forward that also records the int8 scales."""
        return jax.jit(functools.partial(self._apply, calibrate=True))

    @functools.cached_property
    def _fwd_seeded_cal(self):
        """Seeded forward that also records the int8 scales."""
        return self._make_seeded(calibrate=True)

    @functools.cached_property
    def _fwd_seeded(self):
        return self._make_seeded()

    def _make_seeded(self, calibrate=False):
        """Forward with the layout noise drawn INSIDE the program.

        Same threefry bits as the eager ``jax.random.normal(PRNGKey(seed),
        ...)`` the explicit-noise path would pass in (tracing does not
        change PRNG output; pinned by
        test_engine_seeded_noise_matches_explicit), with one device
        program instead of two per request.  Measured at vg128/b128 on
        v5e: throughput-neutral vs a device-resident eager draw (32.1 vs
        32.1 ms — the separate dispatch overlaps; scripts/
        profile_seeded_noise.py), but structurally immune to the
        explicit-array path's host round-trip hazard and the natural
        single-call serving API.  Used when :meth:`generate_batch` gets
        ``noise=None`` — the serving default for 'random' noise."""
        noise_dim = self.model_kwargs.get("layout_noise_dim", 0) or 0
        H, W = self.model_kwargs.get("image_size", (64, 64))

        def fwd(variables, objs, triples, obj_mask, triple_mask, seed):
            # Key derivation INSIDE the program: PRNGKey is pure jnp ops,
            # so a traced int32 seed yields byte-identical key material to
            # the eager PRNGKey(seed) this path used to upload — at one
            # device dispatch per request instead of two (the eager key
            # build was its own ~2 ms tunnel round trip, the bulk of the
            # serve-vs-raw-forward gap attributed in SERVING.md).
            if self.noise_impl == "rbg":
                # Hardware RngBitGenerator (turbo tier): 2.1x the threefry
                # draw rate, deterministic per (seed, padded shape) only —
                # see the constructor docstring for the weakened contract.
                key = jax.random.key(seed, impl="rbg")
            else:
                key = jax.random.PRNGKey(seed)
            f = self.noise_downsample
            noise = jax.random.normal(
                key, (objs.shape[0], H // f, W // f, noise_dim),
                dtype=self.noise_dtype or jnp.float32)
            if f > 1:
                # Nearest-upsample on-chip (turbo tier): 1/f^2 the random
                # bits; the noise channel becomes block-constant over fxf
                # tiles — see the constructor docstring.
                noise = jnp.repeat(jnp.repeat(noise, f, axis=1), f, axis=2)
            return self._apply(variables, objs, triples, obj_mask,
                               triple_mask, noise, calibrate=calibrate)

        return jax.jit(fwd)

    @property
    def calibrated(self) -> bool:
        """int8 tier only: have the activation scales been recorded?"""
        return "quant" in self.variables

    def _drop_calibration(self):
        self.variables = {k: v for k, v in self.variables.items()
                          if k != "quant"}

    @staticmethod
    def _warn_zero_scales(quant):
        """Exactly-zero calibrated scales mean the calibration data never
        activated that tensor (e.g. a trivial/empty scene graph): real
        traffic through it would quantize to ±127 against the 1e-30
        floor and dequantize to ~0 — output collapse, not the graceful
        saturation the tier promises for merely out-of-range values.
        Warn loudly; zero scales CAN be legitimate (a tensor that is
        identically zero on every input this model can produce, e.g. the
        degenerate-box layouts of untrained test checkpoints)."""
        import warnings

        flat = jax.tree_util.tree_flatten_with_path(
            jax.device_get(quant))[0]
        zeros = [jax.tree_util.keystr(p) for p, v in flat
                 if float(np.asarray(v)) == 0.0]
        if zeros:
            warnings.warn(
                "int8 calibration recorded ZERO activation scale(s) at "
                f"{zeros} — the calibration batch never activated those "
                "tensors (unrepresentative data, e.g. trivial/empty "
                "scene graphs); real traffic through them will collapse "
                "to ~0 after dequantization.  Re-run calibrate() on "
                "representative scene graphs.", stacklevel=3)

    def calibrate(self, scene_graphs, noise=None, seed: int = 0):
        """Record (or extend, if already calibrated — running max) the
        int8 tier's activation scales on REPRESENTATIVE scene graphs.

        The turbo tier's quantization scales are static inputs to the
        compiled serving program; they are measured on data, not derived
        from weights.  An uncalibrated engine calibrates automatically on
        its first generated batch (valid turbo output — the calibration
        program quantizes with the fresh batch scales), which is the
        right default for a server whose first requests are real traffic.
        Call this explicitly for reproducible deployments or when the
        first batch may be unrepresentative.  Out-of-range activations on
        later batches clip at +-127 (graceful saturation)."""
        if self.model_kwargs.get("crn_quant") is None:
            raise ValueError("calibrate() requires quantize='int8'")
        self.generate(scene_graphs, noise=noise, seed=seed,
                      deprocess=False, _calibrate=True)

    # -- calibration files (scale provenance) -------------------------------
    #
    # The int8 tier's activation scales are measured on data, so they are
    # deployment state: a server restarted from the same checkpoint would
    # otherwise re-derive them from whatever its first traffic happens to
    # be.  save/load make them an explicit, reviewable artifact — the
    # serving counterpart of a checkpoint (serve --calibrate_graphs /
    # --save_calibration / --calibration_file wire these up).

    CALIBRATION_FORMAT = "sg2im_tpu.int8_calibration.v1"
    _QUANT_KNOBS = ("head", "min_res", "max_res")

    def _quant_band(self):
        """The engine's selective-quantization band (None = model default
        for that knob) — saved alongside scales so a file can't silently
        apply to a different band."""
        return {k: self.model_kwargs.get(f"crn_quant_{k}")
                for k in self._QUANT_KNOBS}

    def _expected_quant_tree(self):
        """Abstract 'quant' collection for THIS engine's model + band via
        ``jax.eval_shape`` (traces the calibration apply — no compile, no
        execution, batch-size independent: the scales are per-tensor
        scalars)."""
        noise_dim = self.model_kwargs.get("layout_noise_dim", 0) or 0
        H, W = self.model_kwargs.get("image_size", (64, 64))
        params = {k: v for k, v in self.variables.items() if k != "quant"}
        noise = (jax.ShapeDtypeStruct((1, H, W, noise_dim), jnp.float32)
                 if noise_dim else None)
        _, quant = jax.eval_shape(
            functools.partial(self._apply, calibrate=True), params,
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
            jax.ShapeDtypeStruct((1, 1, 3), jnp.int32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            noise)
        return quant

    def save_calibration(self, path):
        """Write the calibrated activation scales to ``path`` (JSON).

        The file carries the quantization band for validation on load and
        one float per scale tag.  Scales are f32 scalars; JSON's
        shortest-round-trip float repr is exact for the f64 that holds an
        f32 value, so a save/load cycle is bit-exact
        (test_calibration_save_load_roundtrip)."""
        import json

        from flax import core as flax_core
        from flax import traverse_util

        if self.model_kwargs.get("crn_quant") is None:
            raise ValueError("save_calibration() requires quantize='int8'")
        if not self.calibrated:
            raise ValueError(
                "engine is not calibrated — call calibrate() on "
                "representative scene graphs (or serve a batch) first")
        flat = traverse_util.flatten_dict(
            flax_core.unfreeze(jax.device_get(self.variables["quant"])),
            sep="/")
        payload = {
            "format": self.CALIBRATION_FORMAT,
            "quant_band": self._quant_band(),
            "scales": {k: float(np.float32(v)) for k, v in flat.items()},
        }
        with open(path, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)

    def load_calibration(self, path):
        """Load activation scales saved by :meth:`save_calibration`.

        Validates the file's quantization band and its scale-tag set
        against THIS engine's model + band (via an eval_shape trace of the
        calibration program) before replacing any state, so a file from a
        different band, model config, or tier version fails loudly instead
        of quantizing with wrong scales.  Zero scales warn exactly as a
        live calibration pass would."""
        import json

        from flax import traverse_util

        if self.model_kwargs.get("crn_quant") is None:
            raise ValueError("load_calibration() requires quantize='int8'")
        with open(path) as f:
            payload = json.load(f)
        fmt = payload.get("format")
        if fmt != self.CALIBRATION_FORMAT:
            raise ValueError(
                f"{path}: not an int8 calibration file (format={fmt!r}, "
                f"expected {self.CALIBRATION_FORMAT!r})")
        band = payload.get("quant_band", {})
        mine = self._quant_band()
        if {k: band.get(k) for k in self._QUANT_KNOBS} != mine:
            raise ValueError(
                f"{path}: calibration band {band} does not match this "
                f"engine's {mine} — scales are band-specific; re-calibrate "
                "or construct the engine with matching quant_opts")
        from flax import core as flax_core

        expected = traverse_util.flatten_dict(
            flax_core.unfreeze(self._expected_quant_tree()), sep="/")
        got = payload.get("scales", {})
        missing = sorted(set(expected) - set(got))
        extra = sorted(set(got) - set(expected))
        if missing or extra:
            raise ValueError(
                f"{path}: scale tags do not match this model/band "
                f"(missing {missing}, unexpected {extra})")
        quant = traverse_util.unflatten_dict(
            {k: jnp.float32(v) for k, v in got.items()}, sep="/")
        if self.device is not None:
            quant = jax.device_put(quant, self.device)
        self.variables = {**self.variables, "quant": quant}
        self._warn_zero_scales(quant)

    def generate_batch(self, batch: GraphBatch, noise=None, seed: int = 0,
                       _calibrate: bool = False):
        """Run the generator on an encoded GraphBatch.

        Args:
          noise: None -> sample from jax PRNG(seed) if the model uses layout
            noise; 'zeros' -> zero noise; or an (N, H, W, D) array for
            bit-reproducible comparisons.

        Returns:
          dict with imgs (N, H, W, 3) float (preprocessed space), boxes
          (N, O, 4), masks (N, O, M, M) | None, rel_scores.
        """
        N, O = batch.objs.shape
        T = batch.triples.shape[1]
        noise_dim = self.model_kwargs.get("layout_noise_dim", 0) or 0
        H, W = self.model_kwargs.get("image_size", (64, 64))
        if self.device is not None:
            # Per-chip replica: stage UNCOMMITTED creations (jnp.zeros /
            # jnp.asarray of host data below) directly on this engine's
            # device — otherwise they materialize on device 0 first and
            # pay a cross-device copy (plus device-0 HBM pressure) per
            # request.  Pre-committed jax.Array noise from another device
            # is still moved by the explicit device_put further down.
            with jax.default_device(self.device):
                return self._generate_batch_impl(batch, noise, seed, N,
                                                 noise_dim, H, W,
                                                 _calibrate)
        return self._generate_batch_impl(batch, noise, seed, N,
                                         noise_dim, H, W, _calibrate)

    def _generate_batch_impl(self, batch, noise, seed, N, noise_dim, H, W,
                             force_calibrate: bool = False):
        noise_arr = None
        seeded = False
        if noise_dim > 0:
            if noise is None:
                # Draw in-program (see _fwd_seeded): bit-identical to an
                # eager normal(PRNGKey(seed), ...), one dispatch cheaper.
                seeded = True
            elif isinstance(noise, str) and noise == "zeros":
                noise_arr = jnp.zeros((N, H, W, noise_dim), jnp.float32)
            elif isinstance(noise, jax.Array):
                # Device-resident: keep it on device.  (np.asarray here
                # would force a full D2H+H2D round trip of the widest
                # activation-sized tensor — 22 s at vg128/b128 through
                # this container's tunnel.)  A bucket-padded caller may
                # hand fewer rows than the padded batch: pad on-device.
                if noise.shape[0] > N:
                    raise ValueError(
                        f"noise batch {noise.shape[0]} exceeds the padded "
                        f"graph batch {N}")
                noise_arr = noise.astype(jnp.float32)
                if noise.shape[0] < N:
                    noise_arr = jnp.concatenate(
                        [noise_arr,
                         jnp.zeros((N - noise.shape[0],)
                                   + noise_arr.shape[1:], jnp.float32)],
                        axis=0)
            else:
                noise_np = np.asarray(noise, np.float32)
                if noise_np.shape[0] > N:
                    raise ValueError(
                        f"noise batch {noise_np.shape[0]} exceeds the "
                        f"padded graph batch {N}")
                if noise_np.shape[0] < N:  # batch was bucket-padded
                    noise_np = _pad_rows(noise_np, N)
                noise_arr = jnp.asarray(noise_np)

        arrays = (jnp.asarray(batch.objs), jnp.asarray(batch.triples),
                  jnp.asarray(batch.obj_mask), jnp.asarray(batch.triple_mask))
        if self.mesh is not None:
            from sg2im_tpu.parallel.mesh import batch_sharding

            sh = batch_sharding(self.mesh)
            arrays = tuple(jax.device_put(a, sh) for a in arrays)
            if noise_arr is not None:
                noise_arr = jax.device_put(noise_arr, sh)
        elif self.device is not None:
            # Per-chip replica: commit every input to this engine's
            # device so the jitted program executes there (replicas on
            # other chips run concurrently, no shared default device).
            arrays = tuple(jax.device_put(a, self.device) for a in arrays)
            if noise_arr is not None:
                noise_arr = jax.device_put(noise_arr, self.device)
        # int8 tier: an uncalibrated engine routes its first batch (or an
        # explicit calibrate() call) through the scale-recording program;
        # its outputs are valid turbo outputs, and the recorded scales
        # become static inputs of the serving program from then on.
        calibrating = (self.model_kwargs.get("crn_quant") is not None
                       and (force_calibrate or not self.calibrated))
        if seeded:
            # Partitionable threefry (the JAX default) makes the drawn
            # values independent of how GSPMD shards the generation, so
            # the mesh path agrees with single-device bit-for-bit (the
            # opt-in 'rbg' impl weakens this — see the constructor).  The
            # seed travels as an int32 ARRAY (a Python int would retrace
            # per value) and the PRNGKey derivation runs in-program —
            # byte-identical bits, one dispatch (see _fwd_seeded).
            if not (-(1 << 31) <= int(seed) < (1 << 31)):
                raise ValueError(f"seed must fit int32, got {seed}")
            fn = self._fwd_seeded_cal if calibrating else self._fwd_seeded
            out = fn(self.variables, *arrays, np.int32(seed))
        else:
            fn = self._fwd_cal if calibrating else self._fwd
            out = fn(self.variables, *arrays, noise_arr)
        if calibrating:
            out, quant = out
            self.variables = {**self.variables, "quant": quant}
            self._warn_zero_scales(quant)
        imgs, boxes, masks, rel_scores = out[:4]
        result = {"imgs": imgs, "boxes": boxes, "masks": masks,
                  "rel_scores": rel_scores}
        if self.deprocess_on_device:
            result["imgs_u8"] = out[4]
        return result

    def warmup(self, batch_sizes=(1,), scene_graph=None, seed: int = 0):
        """Precompile the serving program for the given graph-count
        buckets so the first real request never pays the (multi-minute on
        TPU) compile.

        Runs a trivial scene graph (or a caller-supplied representative
        one — it determines the object/triple pad bucket, default
        ``pad_align``) through :meth:`generate` at each batch size.
        Production servers call this once at startup; later requests
        whose padded shapes land in a warmed bucket dispatch straight to
        the cached executable.

        Returns the list of padded (N, O, T) bucket shapes compiled.
        """
        sg = scene_graph or {"objects": [], "relationships": []}
        noise_dim = self.model_kwargs.get("layout_noise_dim", 0) or 0
        # int8 tier: warm the CALIBRATION program flavors too (scale
        # VALUES are runtime inputs, so the static program compiled here
        # is reused whatever the real scales turn out to be), then
        # restore the calibration state — warmup graphs are not
        # representative data, so scales recorded here are discarded
        # unless the engine was already calibrated.
        quantized = self.model_kwargs.get("crn_quant") is not None
        pre = self.variables.get("quant") if quantized else None
        shapes = []
        for n in batch_sizes:
            batch = encode_scene_graphs([sg] * n, self.vocab,
                                        align=self.pad_align)
            if quantized and pre is None:
                self._drop_calibration()
                self.generate([sg] * n, noise="zeros", seed=seed,
                              deprocess=False)  # calibration flavor
            self.generate([sg] * n, noise="zeros", seed=seed,
                          deprocess=False)
            if noise_dim > 0:
                # Also warm the seeded (in-program noise) variant — the
                # runtime path for 'random' requests.
                self.generate([sg] * n, noise=None, seed=seed,
                              deprocess=False)
                if quantized and pre is None:
                    self._drop_calibration()
                    self.generate([sg] * n, noise=None, seed=seed,
                                  deprocess=False)  # calibration flavor
            n_pad = max(1, 1 << (n - 1).bit_length())
            if self.mesh is not None:
                d = self.mesh.shape["data"]
                n_pad = max(n_pad, ((n_pad + d - 1) // d) * d)
            shapes.append((n_pad,) + (batch.objs.shape[1],
                                      batch.triples.shape[1]))
        if quantized:
            if pre is None:
                self._drop_calibration()  # first real batch calibrates
            else:
                self.variables = {**self.variables, "quant": pre}
        return shapes

    def generate(self, scene_graphs, noise=None, seed: int = 0,
                 deprocess: bool = True, _calibrate: bool = False):
        """JSON scene graph(s) -> images (uint8 NHWC if deprocess).

        Mirrors reference ``forward_json`` + ``imagenet_deprocess_batch``
        (``scripts/run_model.py:67-69``).  The batch dimension is padded to
        power-of-two buckets (serving-friendly: any graph count from 1 to
        the bucket ceiling reuses one compiled program); padded rows are
        dropped from the returned arrays.
        """
        if isinstance(scene_graphs, dict):
            scene_graphs = [scene_graphs]
        n_real = len(scene_graphs)
        batch = encode_scene_graphs(scene_graphs, self.vocab,
                                    align=self.pad_align)
        n_pad = max(1, 1 << (n_real - 1).bit_length()) if n_real else 1
        if self.mesh is not None:
            d = self.mesh.shape["data"]
            n_pad = max(n_pad, ((n_pad + d - 1) // d) * d)
        if n_pad > n_real:
            batch = batch.replace(
                objs=_pad_rows(batch.objs, n_pad),
                triples=_pad_rows(batch.triples, n_pad),
                obj_mask=_pad_rows(batch.obj_mask, n_pad),
                triple_mask=_pad_rows(batch.triple_mask, n_pad),
            )
        out = self.generate_batch(batch, noise=noise, seed=seed,
                                  _calibrate=_calibrate)
        out = {k: (None if v is None else v[:n_real]) for k, v in out.items()}
        if deprocess and "imgs_u8" in out:
            # on-device deprocess: fetch the uint8 result, not the f32 one
            imgs = np.asarray(out["imgs_u8"])
        else:
            imgs = np.asarray(out["imgs"])
            if deprocess:
                imgs = imagenet_deprocess_batch(imgs)
        return imgs, out
