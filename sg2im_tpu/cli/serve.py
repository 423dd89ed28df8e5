"""Serving CLI: HTTP scene-graph -> image endpoint around InferenceEngine.

The reference has no server — its inference surface is the one-shot
``scripts/run_model.py`` (JSON file -> PNGs on disk).  This CLI is the
production-serving counterpart for the TPU rebuild: load a checkpoint
once, precompile the padded serving buckets (``InferenceEngine.warmup``),
then serve requests from the cached executables.

Endpoints (stdlib ``http.server``; no extra dependencies):

  GET  /healthz    -> {"status": "ok", model/vocab/bucket info}
  GET  /metrics    -> Prometheus text exposition (request/image/error
                   counters + request-latency histogram); append
                   ``?format=json`` for a JSON view with computed
                   p50/p90/p99 quantiles
  POST /generate   body {"scene_graphs": [...same JSON schema as
                   scene_graphs/*.json...], "noise": "random"|"zeros",
                   "seed": int, "return": "png"|"npy"}
                   -> {"images": [base64 PNG or npy per graph],
                       "boxes": per graph, one [x0,y0,x1,y1] per named
                       object (pads and the implicit __image__ node are
                       trimmed), "seed": int, "latency_ms": float}

Device access is serialized with a lock (one TPU program at a time);
batching happens naturally by sending several scene graphs per request
(padded to power-of-two buckets, so 1..N graphs reuse one executable).
``--batch_window_ms W`` additionally coalesces CONCURRENT requests:
the first waiting request leads, collects followers for W ms (up to
--max_graphs total), and runs ONE padded program for all of them.
Per-request noise is derived exactly as it would be unbatched (each
request's seed keyed over its own rows), so pinned seeds stay
reproducible; rows are independent through the generator (eval-mode
norms), so batchmates don't change each other's images.

Example:
  python -m sg2im_tpu.cli.serve --checkpoint vg128.pt --port 8041 \
      --bf16 1 --warmup 1,4 &
  curl -s localhost:8041/generate -d '{"scene_graphs": [
      {"objects": ["sheep", "grass"],
       "relationships": [[0, "by", 1]]}]}' | python -m json.tool
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from sg2im_tpu.utils.flags import bool_flag, int_tuple


def build_parser():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoint", required=True,
                   help=".pt (reference schema) or converted checkpoint")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", default=8041, type=int)
    p.add_argument("--warmup", default="1", type=int_tuple,
                   help="comma list of batch-size buckets to precompile "
                        "at startup (e.g. 1,4,16)")
    p.add_argument("--bf16", default=False, type=bool_flag,
                   help="bf16 CRN serving mode (+4%% e2e, 64 dB PSNR)")
    p.add_argument("--dense_precision", default=None,
                   choices=[None, "high", "highest"],
                   help="'high' = 3-pass bf16 Dense serving grade")
    p.add_argument("--crn_mode", default=None,
                   choices=[None, "legacy", "split"],
                   help="'split' skips the CRN concat materialization")
    p.add_argument("--quantize", default=None,
                   choices=[None, "int8"],
                   help="TURBO tier: int8 MXU path for the high-res CRN "
                        "stage convs (measured accuracy trade — see "
                        "SERVING.md; checkpoints unaffected)")
    p.add_argument("--quantize_head", default=None, type=bool_flag,
                   help="int8 tier: quantize the CRN output head's 3x3 "
                        "(False = standard exempt-the-last-layer "
                        "practice; frontier in SERVING.md).  Default: "
                        "follows the engine's adopted tier (the head is "
                        "exempt whenever its input stage is)")
    p.add_argument("--quantize_max_res", default=None, type=int,
                   help="int8 tier: only quantize CRN stages whose "
                        "layout resolution is <= this.  Default 64 (the "
                        "adopted round-5 tier: 44.4 dB u8 gate at +13% "
                        "— frontier in SERVING.md); 0 or negative = "
                        "unbounded (the round-4 full band)")
    p.add_argument("--calibration_file", default=None,
                   help="int8 tier: load activation scales saved by "
                        "--save_calibration (InferenceEngine."
                        "load_calibration) at startup — reproducible "
                        "deployments: no first-traffic auto-calibration, "
                        "restarts serve identical bytes")
    p.add_argument("--calibrate_graphs", default=None,
                   help="int8 tier: path to a scene-graphs JSON (same "
                        "schema as /generate) to calibrate on at startup "
                        "— representative data instead of whatever the "
                        "first request happens to be")
    p.add_argument("--save_calibration", default=None,
                   help="int8 tier: write the activation scales to this "
                        "path once calibrated (at startup with "
                        "--calibrate_graphs, else after the first-traffic "
                        "auto-calibration) for --calibration_file reuse")
    p.add_argument("--noise_impl", default=None,
                   choices=[None, "threefry", "rbg"],
                   help="'rbg' = hardware PRNG for the per-request noise "
                        "draw (2.1x draw rate; deterministic per "
                        "seed+batch shape only — coalescing/bucketing "
                        "changes a request's noise)")
    p.add_argument("--noise_downsample", default=1, type=int,
                   choices=[1, 2, 4],
                   help="draw per-request layout noise at (H/f, W/f) and "
                        "nearest-upsample on-chip: 1/f^2 the random bits "
                        "(turbo tier — the noise channel becomes "
                        "block-constant over fxf tiles)")
    p.add_argument("--deprocess_on_device", default=True, type=bool_flag,
                   help="fold deprocess into the TPU program (uint8 out, "
                        "4x less device->host traffic)")
    p.add_argument("--max_graphs", default=64, type=int,
                   help="reject requests with more scene graphs (one "
                        "compiled bucket bounds device memory)")
    p.add_argument("--batch_window_ms", default=0.0, type=float,
                   help="coalesce concurrent requests into one device "
                        "program: the leading request waits this long "
                        "for followers (0 = serve each request "
                        "individually)")
    p.add_argument("--data_parallel", default=0, type=int,
                   help="shard generation batches over N devices of a "
                        "('data','model') mesh (params replicated; "
                        "0 = single device).  Pairs well with "
                        "--batch_window_ms: coalesced batches spread "
                        "across chips")
    p.add_argument("--replicas", default=1, type=int,
                   help="run N independent per-chip engine replicas and "
                        "dispatch whole requests round-robin (params "
                        "copied to each chip).  Better per-request "
                        "latency than --data_parallel for small "
                        "requests — no cross-chip collectives; each "
                        "replica coalesces its own queue under "
                        "--batch_window_ms.  Mutually exclusive with "
                        "--data_parallel")
    return p


def build_engines(args):
    """Engine(s) for the flag set: one mesh-sharded/single-device engine,
    or N per-chip replicas (``--replicas``)."""
    from sg2im_tpu.inference import InferenceEngine

    kw = {}
    if args.bf16:
        import jax.numpy as jnp

        kw["compute_dtype"] = jnp.bfloat16
    if args.dense_precision:
        kw["dense_precision"] = args.dense_precision
    if args.crn_mode and args.crn_mode != "legacy":
        kw["crn_mode"] = args.crn_mode
    if getattr(args, "quantize", None):
        kw["quantize"] = args.quantize
        qo = {}
        if getattr(args, "quantize_head", None) is not None:
            qo["head"] = args.quantize_head
        if getattr(args, "quantize_max_res", None) is not None:
            # 0 / negative = unbounded (engine None = the model default),
            # the round-4 full band.
            qo["max_res"] = (args.quantize_max_res
                             if args.quantize_max_res > 0 else None)
        if qo:
            kw["quant_opts"] = qo
    elif (getattr(args, "quantize_head", None) is not None
          or getattr(args, "quantize_max_res", None) is not None):
        raise SystemExit(
            "--quantize_head/--quantize_max_res require --quantize int8")
    ni = getattr(args, "noise_impl", None)
    if ni and ni != "threefry":
        kw["noise_impl"] = ni
    nd = getattr(args, "noise_downsample", 1) or 1
    if nd != 1:
        kw["noise_downsample"] = nd
    kw["deprocess_on_device"] = args.deprocess_on_device
    n_rep = getattr(args, "replicas", 1) or 1
    if n_rep < 1:
        raise SystemExit(f"--replicas must be >= 1, got {n_rep}")
    if getattr(args, "data_parallel", 0) and args.data_parallel > 1:
        import jax

        from sg2im_tpu.parallel.mesh import make_mesh

        if n_rep > 1:
            raise SystemExit(
                "--replicas and --data_parallel are mutually exclusive "
                "(per-chip replicas vs one mesh-sharded engine)")
        n_dev = len(jax.devices())
        if args.data_parallel > n_dev:
            raise SystemExit(
                f"--data_parallel {args.data_parallel} exceeds the "
                f"{n_dev} available device(s)")
        kw["mesh"] = make_mesh(n_data=args.data_parallel)
    if n_rep > 1:
        import jax

        from sg2im_tpu.ckpt.torch_convert import convert_checkpoint

        devs = jax.devices()
        if n_rep > len(devs):
            raise SystemExit(f"--replicas {n_rep} exceeds the "
                             f"{len(devs)} available device(s)")
        bundle = convert_checkpoint(args.checkpoint)  # convert ONCE
        return [InferenceEngine.from_bundle(bundle, device=devs[i], **kw)
                for i in range(n_rep)]
    return [InferenceEngine.from_torch_checkpoint(args.checkpoint, **kw)]


def build_engine(args):
    """Single-engine construction (kept for callers/tests that predate
    ``--replicas``; equals ``build_engines(args)[0]``)."""
    return build_engines(args)[0]


def startup_calibration(args, engines):
    """Apply the int8 calibration-file flags before warmup.

    --calibration_file loads saved scales into every engine;
    --calibrate_graphs calibrates engine 0 on a scene-graphs JSON and
    copies the scales to the other replicas (the same sharing rule the
    dispatcher uses for first-traffic calibration, so all replicas run
    the identical static program); --save_calibration writes the scales
    now if either produced them (otherwise the first-traffic hook in
    _State writes them later).  Returns True if a save happened."""
    cf = getattr(args, "calibration_file", None)
    cg = getattr(args, "calibrate_graphs", None)
    sv = getattr(args, "save_calibration", None)
    if not (cf or cg or sv):
        return False
    if getattr(args, "quantize", None) != "int8":
        raise SystemExit(
            "--calibration_file/--calibrate_graphs/--save_calibration "
            "require --quantize int8")
    if cf and cg:
        raise SystemExit(
            "--calibration_file and --calibrate_graphs are mutually "
            "exclusive (load saved scales OR measure fresh ones)")
    if cf:
        for e in engines:
            e.load_calibration(cf)
        print(f"loaded int8 calibration from {cf}", flush=True)
    elif cg:
        with open(cg) as f:
            sgs = json.load(f)
        if isinstance(sgs, dict):
            sgs = [sgs]
        engines[0].calibrate(sgs)
        if len(engines) > 1:
            import jax

            quant = engines[0].variables["quant"]
            for e in engines[1:]:
                e.variables = {**e.variables,
                               "quant": jax.device_put(quant, e.device)}
        print(f"calibrated int8 scales on {len(sgs)} scene graph(s) "
              f"from {cg}", flush=True)
    if sv and engines[0].calibrated:
        engines[0].save_calibration(sv)
        print(f"saved int8 calibration to {sv}", flush=True)
        return True
    return False


def _png_bytes(img_u8: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img_u8).save(buf, format="PNG")
    return buf.getvalue()


class _LatencyHistogram:
    """Thread-safe fixed-bucket latency histogram (milliseconds).

    Log2-spaced upper bounds from 1 ms to ~131 s cover everything from a
    warm cached-executable hit to a cold first-bucket compile.  Quantiles
    are estimated by linear interpolation inside the winning bucket
    (exact min/max are tracked separately), which is the standard
    Prometheus ``histogram_quantile`` estimator — good to within one
    bucket's width, with no per-request allocation or unbounded memory.
    """

    BOUNDS = tuple(float(2 ** i) for i in range(18))  # 1ms .. 131072ms

    def __init__(self):
        self._lock = threading.Lock()
        self._counts = [0] * (len(self.BOUNDS) + 1)  # +overflow
        self.count = 0
        self.sum_ms = 0.0
        self.min_ms = float("inf")
        self.max_ms = 0.0

    def observe(self, ms: float):
        i = 0
        while i < len(self.BOUNDS) and ms > self.BOUNDS[i]:
            i += 1
        with self._lock:
            self._counts[i] += 1
            self.count += 1
            self.sum_ms += ms
            self.min_ms = min(self.min_ms, ms)
            self.max_ms = max(self.max_ms, ms)

    def snapshot(self):
        with self._lock:
            return (list(self._counts), self.count, self.sum_ms,
                    self.min_ms, self.max_ms)

    def quantile(self, q: float, counts=None, total=None,
                 max_ms=None) -> float:
        """Interpolated q-quantile in ms (0 when empty).  When given
        snapshot counts, ``max_ms`` must be the same snapshot's max so the
        result stays internally consistent (never above the snapshot max
        even if another thread observes a larger latency mid-call)."""
        if counts is None:
            counts, total, _, _, max_ms = self.snapshot()
        if max_ms is None:
            max_ms = self.max_ms
        if not total:
            return 0.0
        rank = q * total
        seen = 0.0
        for i, c in enumerate(counts):
            if seen + c >= rank and c > 0:
                lo = self.BOUNDS[i - 1] if i > 0 else 0.0
                hi = (self.BOUNDS[i] if i < len(self.BOUNDS)
                      else max_ms)
                frac = (rank - seen) / c
                return min(lo + frac * (hi - lo), max_ms)
            seen += c
        return max_ms

    def to_json(self):
        counts, total, sum_ms, mn, mx = self.snapshot()
        return {
            "count": total,
            "mean_ms": round(sum_ms / total, 3) if total else 0.0,
            "min_ms": round(mn, 3) if total else 0.0,
            "max_ms": round(mx, 3),
            "p50_ms": round(self.quantile(0.5, counts, total, mx), 3),
            "p90_ms": round(self.quantile(0.9, counts, total, mx), 3),
            "p99_ms": round(self.quantile(0.99, counts, total, mx), 3),
        }


class _Request:
    """One in-flight /generate request inside the batcher."""

    __slots__ = ("sgs", "noise_mode", "seed", "done", "result", "error")

    def __init__(self, sgs, noise_mode, seed):
        self.sgs = sgs
        self.noise_mode = noise_mode
        self.seed = seed
        self.done = threading.Event()
        self.result = None  # (imgs ndarray, boxes ndarray)
        self.error = None


class _Batcher:
    """Coalesces concurrent requests into one padded device program.

    Leader election by device lock: the thread that wins the lock sleeps
    ``window_ms`` to collect followers, drains the queue (respecting the
    ``max_graphs`` bucket bound), runs ONE ``engine.generate`` over the
    concatenated scene graphs, and distributes slices.  Each request's
    noise is derived from its OWN seed over its OWN rows — exactly what
    an unbatched call would have produced — so pinned seeds reproduce
    and batchmates never change each other's outputs (rows are
    independent through the eval-mode generator).
    """

    def __init__(self, engine, max_graphs: int, window_ms: float):
        self.engine = engine
        self.max_graphs = max_graphs
        self.window_s = max(0.0, window_ms) / 1e3
        self.device_lock = threading.Lock()
        self.queue_lock = threading.Lock()
        self.pending: list[_Request] = []
        self.engine_calls = 0
        self.batched_requests = 0

    # -- public -------------------------------------------------------------

    def submit(self, sgs, noise_mode: str, seed: int):
        """Blocks until served.  Returns (imgs, boxes); raises the
        request's own error (batchmates are unaffected)."""
        req = _Request(sgs, noise_mode, seed)
        if self.window_s <= 0:
            with self.device_lock:
                self._run([req])
        else:
            with self.queue_lock:
                self.pending.append(req)
            with self.device_lock:
                if not req.done.is_set():  # we lead
                    time.sleep(self.window_s)
                    self._run(self._drain(must_include=req))
        if req.error is not None:
            raise req.error
        return req.result

    # -- internals ----------------------------------------------------------

    def _drain(self, must_include: _Request) -> list[_Request]:
        """Pop queued requests up to the max_graphs bucket bound.  The
        leader goes first (it must be served by its own drain); then
        FIFO-fill — row order within the device batch doesn't matter,
        every request is sliced back out by its own offsets."""
        with self.queue_lock:
            self.pending.remove(must_include)
            take, total = [must_include], len(must_include.sgs)
            rest = []
            for r in self.pending:
                if total + len(r.sgs) <= self.max_graphs:
                    take.append(r)
                    total += len(r.sgs)
                else:
                    rest.append(r)
            self.pending = rest
            return take

    def _merged_noise(self, reqs):
        """Explicit noise rows per request: for 'random', the same
        ``normal(PRNGKey(seed), (n_req, H, W, D))`` an unbatched call
        would draw; zeros for 'zeros'.  None when the model is
        noiseless.

        Drawn on the CPU backend: threefry bits are backend-independent
        (same values the engine would draw on the device), and the host
        draw avoids per-request device dispatches + downloads inside the
        serialized device section.  Row-stability of a seed's draw across
        batch compositions relies on ``jax_threefry_partitionable``
        (pinned at server start in serve_forever)."""
        nd = self.engine.model_kwargs.get("layout_noise_dim", 0) or 0
        if nd == 0:
            return None
        import jax
        import jax.numpy as jnp

        H, W = self.engine.model_kwargs.get("image_size", (64, 64))
        rows = []
        with jax.default_device(jax.devices("cpu")[0]):
            for r in reqs:
                n = len(r.sgs)
                if r.noise_mode == "zeros":
                    rows.append(np.zeros((n, H, W, nd), np.float32))
                else:
                    rows.append(np.asarray(jax.random.normal(
                        jax.random.PRNGKey(r.seed), (n, H, W, nd),
                        dtype=jnp.float32)))
        return np.concatenate(rows, axis=0)

    def _validate(self, reqs):
        """Host-side pre-validation: encode each request's graphs alone so
        a client error (unknown object/predicate name, bad relationship
        endpoint) 400s that request WITHOUT poisoning the merged device
        call of its batchmates.  Returns the valid subset."""
        from sg2im_tpu.data.scene_graphs import encode_scene_graphs

        good = []
        for r in reqs:
            try:
                encode_scene_graphs(r.sgs, self.engine.vocab)
                good.append(r)
            except Exception as e:  # noqa: BLE001 — belongs to this req
                r.error = e
                r.done.set()
        return good

    def _run(self, reqs):
        if not reqs:
            return
        if len(reqs) == 1:
            r = reqs[0]
            try:
                imgs, out = self.engine.generate(
                    r.sgs, noise=None if r.noise_mode == "random"
                    else "zeros", seed=r.seed)
                r.result = (imgs, np.asarray(out["boxes"], np.float32))
            except Exception as e:  # noqa: BLE001 — belongs to this req
                r.error = e
            self.engine_calls += 1
            r.done.set()
            return
        reqs = self._validate(reqs)
        if len(reqs) <= 1:
            return self._run(reqs)
        try:
            all_sgs = [g for r in reqs for g in r.sgs]
            imgs, out = self.engine.generate(
                all_sgs, noise=self._merged_noise(reqs))
            boxes = np.asarray(out["boxes"], np.float32)
            self.engine_calls += 1
            self.batched_requests += len(reqs)
            ofs = 0
            for r in reqs:
                n = len(r.sgs)
                r.result = (imgs[ofs:ofs + n], boxes[ofs:ofs + n])
                ofs += n
                r.done.set()
        except Exception:
            # Unexpected merged failure (validation already filtered
            # client errors): isolate by serving each individually.
            for r in reqs:
                self._run([r])


class _Dispatcher:
    """Round-robin front for per-chip engine replicas: each replica gets
    its own :class:`_Batcher` (independent device lock + coalescing
    queue), and whole requests rotate across them — replicas execute
    concurrently on their own chips with no cross-chip collectives.
    Same-seed reproducibility holds across replicas: every replica runs
    the identical program on identical params.

    int8 tier (``--quantize int8``): the activation-scale calibration is
    shared, not per-replica.  The FIRST request is routed to replica 0
    (serializing any concurrent arrivals behind it), whose engine
    auto-calibrates on that batch; the recorded 'quant' scales are then
    copied to every replica before normal dispatch resumes — so all
    replicas run the identical static program and the reproducibility
    contract above holds for quantized serving too (per-replica
    auto-calibration would give each chip different scales and make a
    request's bytes depend on routing)."""

    def __init__(self, engines, max_graphs: int, window_ms: float):
        self.batchers = [_Batcher(e, max_graphs, window_ms)
                         for e in engines]
        self.window_ms = window_ms
        self._next = 0
        self._lock = threading.Lock()
        self._cal_lock = threading.Lock()
        self._needs_cal = any(
            e.model_kwargs.get("crn_quant") is not None and not e.calibrated
            for e in engines)

    def _share_calibration(self):
        """Copy replica 0's calibrated 'quant' scales to every replica
        (scales are a handful of scalars — the device_put is free)."""
        import jax

        src = self.batchers[0].engine
        q = src.variables.get("quant")
        if q is None:
            return
        for b in self.batchers[1:]:
            e = b.engine
            e.variables = {
                **e.variables,
                "quant": (jax.device_put(q, e.device)
                          if e.device is not None else q),
            }

    def submit(self, sgs, noise_mode: str, seed: int):
        if self._needs_cal:
            with self._cal_lock:
                if self._needs_cal:
                    # Calibration request: replica 0 records the scales
                    # on this batch (its output is a valid turbo
                    # response), then every replica gets a copy.
                    result = self.batchers[0].submit(sgs, noise_mode, seed)
                    if self.batchers[0].engine.calibrated:
                        self._share_calibration()
                        self._needs_cal = False
                    return result
        with self._lock:
            n = len(self.batchers)
            start = self._next
            self._next = (self._next + 1) % n
            b = self.batchers[start]
            if self.window_ms <= 0:
                # No coalescing: committing to a busy replica would
                # head-of-line block behind its in-flight program while
                # another chip idles — prefer the first idle one
                # (locked() is a heuristic read; worst case we fall back
                # to plain round-robin).  With a coalescing window,
                # round-robin stands: joining a busy replica's queue is
                # how requests coalesce.
                for k in range(n):
                    cand = self.batchers[(start + k) % n]
                    if not cand.device_lock.locked():
                        b = cand
                        break
        return b.submit(sgs, noise_mode, seed)

    @property
    def engine_calls(self):
        return sum(b.engine_calls for b in self.batchers)

    @property
    def batched_requests(self):
        return sum(b.batched_requests for b in self.batchers)


class _State:
    """Engine(s) + batcher/dispatcher + counters shared across handler
    threads."""

    def __init__(self, engine, max_graphs: int, window_ms: float = 0.0,
                 save_calibration: str | None = None):
        engines = engine if isinstance(engine, (list, tuple)) else [engine]
        self.engines = list(engines)
        self.engine = self.engines[0]
        self.max_graphs = max_graphs
        # --save_calibration without startup calibration: write the
        # scales once the first-traffic auto-calibration records them.
        self.save_calibration_path = save_calibration
        self._calibration_saved = False
        if len(self.engines) > 1:
            self.batcher = _Dispatcher(self.engines, max_graphs, window_ms)
        else:
            self.batcher = _Batcher(self.engine, max_graphs, window_ms)
        self._stats_lock = threading.Lock()
        self.requests = 0
        self.images = 0
        self.latency = _LatencyHistogram()
        self.errors = {"400": 0, "404": 0, "500": 0}
        # Per-request seed stream for unpinned 'random' noise; starts at
        # a process-random offset so restarts don't replay the stream.
        import random

        self._seed_iter = random.SystemRandom().randrange(1 << 31)

    def next_seed(self) -> int:
        with self._stats_lock:
            self._seed_iter = (self._seed_iter + 1) % (1 << 31)
            return self._seed_iter

    def count(self, n_images: int):
        with self._stats_lock:
            self.requests += 1
            self.images += n_images

    def count_error(self, code: int):
        with self._stats_lock:
            key = str(code)
            self.errors[key] = self.errors.get(key, 0) + 1

    def maybe_save_calibration(self):
        """First-traffic hook for --save_calibration: once the int8 tier
        has calibrated (the dispatcher/batcher handled the scale sharing),
        write the scales exactly once."""
        if not self.save_calibration_path or self._calibration_saved:
            return
        e = self.engine
        if e.model_kwargs.get("crn_quant") is None or not e.calibrated:
            return
        with self._stats_lock:
            if self._calibration_saved:
                return
            self._calibration_saved = True
        e.save_calibration(self.save_calibration_path)
        print(f"saved int8 calibration to {self.save_calibration_path}",
              flush=True)

    def stats_snapshot(self):
        """(requests, images, errors) read consistently under the same
        lock count()/count_error() write under."""
        with self._stats_lock:
            return self.requests, self.images, dict(self.errors)

    def prometheus_text(self) -> str:
        """Prometheus 0.0.4 text exposition of the serving counters."""
        counts, total, sum_ms, _, _ = self.latency.snapshot()
        lines = [
            "# HELP sg2im_requests_total Served /generate requests.",
            "# TYPE sg2im_requests_total counter",
            f"sg2im_requests_total {self.requests}",
            "# HELP sg2im_images_total Images generated.",
            "# TYPE sg2im_images_total counter",
            f"sg2im_images_total {self.images}",
            "# HELP sg2im_engine_calls_total Device program launches.",
            "# TYPE sg2im_engine_calls_total counter",
            f"sg2im_engine_calls_total {self.batcher.engine_calls}",
            "# HELP sg2im_batched_requests_total Requests served by a "
            "coalesced device call.",
            "# TYPE sg2im_batched_requests_total counter",
            f"sg2im_batched_requests_total "
            f"{self.batcher.batched_requests}",
            "# HELP sg2im_errors_total Error responses by HTTP code.",
            "# TYPE sg2im_errors_total counter",
        ]
        for code in sorted(self.errors):
            lines.append(
                f'sg2im_errors_total{{code="{code}"}} '
                f"{self.errors[code]}")
        lines += [
            "# HELP sg2im_request_latency_ms End-to-end /generate "
            "latency (request receipt to response build).",
            "# TYPE sg2im_request_latency_ms histogram",
        ]
        cum = 0
        for bound, c in zip(self.latency.BOUNDS, counts):
            cum += c
            lines.append(
                f'sg2im_request_latency_ms_bucket{{le="{bound:g}"}} '
                f"{cum}")
        lines.append(
            f'sg2im_request_latency_ms_bucket{{le="+Inf"}} {total}')
        lines.append(f"sg2im_request_latency_ms_sum {sum_ms:.3f}")
        lines.append(f"sg2im_request_latency_ms_count {total}")
        return "\n".join(lines) + "\n"


def make_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        # quieter than the default (one line per request to stderr)
        def log_message(self, fmt, *a):  # pragma: no cover
            pass

        def _reply(self, code: int, payload: dict):
            if code >= 400:
                state.count_error(code)
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_text(self, code: int, text: str):
            body = text.encode()
            self.send_response(code)
            self.send_header("Content-Type",
                             "text/plain; version=0.0.4; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path, _, query = self.path.partition("?")
            path = path.rstrip("/")
            if path == "/metrics":
                from urllib.parse import parse_qs

                fmt = parse_qs(query).get("format", [""])[0]
                if fmt == "json":
                    requests, images, errors = state.stats_snapshot()
                    return self._reply(200, {
                        "requests": requests,
                        "images": images,
                        "engine_calls": state.batcher.engine_calls,
                        "batched_requests":
                            state.batcher.batched_requests,
                        "errors": errors,
                        "request_latency_ms": state.latency.to_json(),
                    })
                return self._reply_text(200, state.prometheus_text())
            if path not in ("/healthz", ""):
                return self._reply(404, {"error": "unknown path"})
            e = state.engine
            payload = {
                "status": "ok",
                "image_size": list(e.model_kwargs.get("image_size",
                                                      (64, 64))),
                "num_objects": len(e.vocab["object_idx_to_name"]),
                "num_predicates": len(e.vocab["pred_idx_to_name"]),
                "requests": state.requests,
                "images": state.images,
                "engine_calls": state.batcher.engine_calls,
                "batched_requests": state.batcher.batched_requests,
            }
            if e.model_kwargs.get("crn_quant") is not None:
                payload["int8_calibrated"] = all(
                    x.calibrated for x in state.engines)
            return self._reply(200, payload)

        def do_POST(self):
            if self.path.split("?")[0].rstrip("/") != "/generate":
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if not isinstance(req, dict):
                    raise ValueError("request body must be a JSON object")
                sgs = req.get("scene_graphs")
                if not isinstance(sgs, list) or not sgs:
                    raise ValueError("'scene_graphs' must be a non-empty "
                                     "list of scene-graph dicts")
                if len(sgs) > state.max_graphs:
                    raise ValueError(
                        f"{len(sgs)} graphs > --max_graphs "
                        f"{state.max_graphs}")
                noise = req.get("noise", "random")
                if noise not in ("random", "zeros"):
                    raise ValueError("'noise' must be 'random' or 'zeros'")
                # Unpinned 'random' draws a fresh seed per request —
                # clients asking for variation get variation; pinning
                # 'seed' makes the response reproducible.
                seed = req.get("seed")
                seed = state.next_seed() if seed is None else int(seed)
                fmt = req.get("return", "png")
                if fmt not in ("png", "npy"):
                    raise ValueError("'return' must be 'png' or 'npy'")
            except (ValueError, KeyError, TypeError, AttributeError,
                    json.JSONDecodeError) as err:
                return self._reply(400, {"error": str(err)})

            t0 = time.perf_counter()
            try:
                imgs, boxes = state.batcher.submit(sgs, noise, seed)
            except ValueError as err:
                # scene-graph encoding errors (unknown object/predicate
                # name, bad relationship endpoint) are client errors
                return self._reply(400, {"error": str(err)})
            except Exception as err:  # noqa: BLE001 -- surface to client
                return self._reply(500, {"error": repr(err)})
            latency_ms = (time.perf_counter() - t0) * 1000.0
            state.latency.observe(latency_ms)

            if fmt == "png":
                payload_imgs = [
                    base64.b64encode(_png_bytes(img)).decode("ascii")
                    for img in imgs]
            else:
                payload_imgs = [
                    base64.b64encode(np.ascontiguousarray(img).tobytes())
                    .decode("ascii") for img in imgs]
            state.count(len(sgs))
            state.maybe_save_calibration()
            # boxes: per graph, one [x0,y0,x1,y1] per NAMED object (the
            # encoder appends the __image__ node and pads the object dim
            # to a bucket — both trimmed here so the response shape
            # depends only on the client's own graphs, not on pad
            # buckets or coalesced batchmates).
            boxes_out = [boxes[j][:len(sg.get("objects", []))].tolist()
                         for j, sg in enumerate(sgs)]
            return self._reply(200, {
                "images": payload_imgs,
                "format": fmt,
                "seed": seed,
                "shape": list(imgs.shape[1:]),
                "boxes": boxes_out,
                "latency_ms": round(latency_ms, 2),
            })

    return Handler


def serve_forever(args, ready_event=None):
    """Build engine(s), warm buckets, serve.  ``ready_event`` (tests) is
    set once the socket is listening and warmup finished."""
    # The seed reproducibility contract (a pinned seed's noise rows are
    # independent of pad bucket and batch composition — load-bearing for
    # the coalescer, and advertised for plain requests too) requires the
    # partitionable threefry layout: normal(key, (n,...)) ==
    # normal(key, (m,...))[:n] for n <= m.  It is the JAX default, but
    # the CLI owns its process, so pin it explicitly before any program
    # compiles (the InferenceEngine library constructor only warns).
    import jax

    from sg2im_tpu.utils.compile_cache import enable_compile_cache

    jax.config.update("jax_threefry_partitionable", True)
    # Persistent XLA compile cache: restarts (and replica 2..N's warmup
    # of the identical program) hit the cache instead of paying the
    # multi-minute TPU compile again.
    enable_compile_cache()
    engines = build_engines(args)
    saved = startup_calibration(args, engines)
    if args.warmup:
        print(f"warming buckets {list(args.warmup)} ...", flush=True)
        for i, e in enumerate(engines):
            shapes = e.warmup(batch_sizes=tuple(args.warmup))
            tag = f" replica {i} ({e.device})" if len(engines) > 1 else ""
            print(f"warmed padded shapes{tag}: {shapes}", flush=True)
    state = _State(engines, args.max_graphs,
                   window_ms=args.batch_window_ms,
                   save_calibration=(None if saved
                                     else getattr(args, "save_calibration",
                                                  None)))
    httpd = ThreadingHTTPServer((args.host, args.port),
                                make_handler(state))
    if ready_event is not None:
        ready_event.httpd = httpd  # tests stop it via .shutdown()
        ready_event.state = state  # tests inspect batcher/replica counters
        ready_event.set()
    print(f"serving on http://{args.host}:{httpd.server_address[1]}",
          flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:  # pragma: no cover
        pass
    finally:
        httpd.server_close()
    return 0


def main(argv=None):
    return serve_forever(build_parser().parse_args(argv))


if __name__ == "__main__":
    raise SystemExit(main())
