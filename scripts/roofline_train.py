"""Per-section roofline of the jitted GAN TRAIN step (VERDICT r3 #5).

Sections of the production train step (flagship COCO-64 config, the same
construction as bench.py::train_step_setup so the numbers align with the
driver-captured ``train_step_ms_b32``):

  g_forward          generator forward (train mode, BN stats mutated)
  g_forward_backward generator forward + all 7 losses (incl. the D
                     scoring passes inside the G loss) + backward
  d_obj_step         D_obj fake+real forward + backward (crop included)
  d_img_step         D_img fake+real forward + backward
  crop_kernel        the bbox batch-crop alone (separable matmul form)
  adam_updates       all three SkippableAdam update+apply passes
  full_step          the whole fused program (G fwd+bwd+update, both D
                     steps, NaN guard)

Each row: wall ms (tunnel-sync fenced, dispatch floor subtracted), XLA
post-fusion cost-model FLOPs, and PHYSICAL HBM bytes (VERDICT r4 #4):
the cost model's "bytes accessed" counts logical post-fusion accesses
and exceeds physical peak 2x on fused sections, so the certification
bytes here are the compiled program's post-DCE argument+output buffer
sizes (``compiled.memory_analysis()``) — a hard LOWER bound on HBM
traffic (every argument byte is read and every output byte written at
least once; intermediates/spills only add).  From flops and min-bytes
we derive each section's speed-of-light time ``sol_ms = max(flops /
mxu_peak, min_bytes / hbm_peak)`` and report ``pct_sol`` (<= 100 by
construction) and ``headroom_x = ms / sol_ms`` — the factor the section
could at BEST improve if it hit both measured peaks.  The cost-model
bytes stay as ``mbytes_costmodel`` context.  Appends
``train_step_sections`` (+ the train peaks) into PERF.json.

Usage: python -u scripts/roofline_train.py [batch] [config]
       config: 'baseline' (f32 legacy, default) | 'fast'
       (--bf16_compute --crn_mode split)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sg2im_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import scripts.roofline as R  # measurement machinery (AOT compile + fence)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure_jit(name, fn, args, iters=20):
    """(ms, flops, bytes) like scripts.roofline.measure, but timed through
    the regular jit dispatch (C++ fast path).  The AOT ``compiled(*args)``
    call that roofline.measure uses goes through a per-leaf Python arg
    path that costs ~2 ms/leaf through the tunnel — harmless for the
    forward roofline's handful of arrays, catastrophic for a TrainState
    with ~1000 leaves (measured: seconds/call of pure host overhead).
    The AOT object is still built once for XLA's post-fusion cost model."""
    import time

    import jax
    import jax.numpy as jnp

    def fence(out):
        # One XLA program per call: fetching ANY output blocks until the
        # whole program retires (outputs are live, nothing is dead-coded).
        # Fence on the first scalar-cheap leaf; tunnel-safe host read.
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.asarray(leaf).astype(jnp.float32).sum())

    jfn = jax.jit(fn)
    flops = bytes_ = io_min = None
    try:
        compiled = jfn.lower(*args).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = ca.get("flops")
        bytes_ = ca.get("bytes accessed")
        # Physical lower bound on HBM traffic: post-DCE argument+output
        # buffers (aliased/donated pairs counted once).  See module doc.
        ma = compiled.memory_analysis()
        io_min = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                  - ma.alias_size_in_bytes)
    except Exception as e:  # pragma: no cover
        print(f"  ({name}: cost/memory analysis unavailable: {e!r})",
              file=sys.stderr)
    out = jfn(*args)
    fence(out)
    out = jfn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    fence(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    ms = max(ms - R._DISPATCH_FLOOR_MS, 0.05)
    return ms, flops, bytes_, io_min


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bench import train_step_setup

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = sys.argv[2] if len(sys.argv) > 2 else "baseline"
    extra = ({"bf16_compute": True, "crn_mode": "split"}
             if cfg == "fast" else {})

    R._DISPATCH_FLOOR_MS = R.measure_dispatch_floor()
    print(f"per-dispatch host floor: {R._DISPATCH_FLOOR_MS:.2f} ms")

    rng = np.random.RandomState(0)
    K = 8192
    a = jnp.asarray(rng.randn(K, K), jnp.bfloat16)
    b = jnp.asarray(rng.randn(K, K), jnp.bfloat16)
    ms, _, _ = R.measure("mm_peak", lambda x, y: x @ y, (a, b), iters=10)
    mm_peak = 2 * K**3 / (ms / 1e3) / 1e12
    big = jnp.asarray(rng.randn(256, 1024, 1024), jnp.float32)
    ms2, _, _ = R.measure("copy_peak", lambda x: x * 1.0000001 + 1e-7,
                          (big,), iters=10)
    hbm_peak = 2 * big.nbytes / (ms2 / 1e3) / 1e9
    del a, b, big
    print(f"peaks: bf16 matmul {mm_peak:.1f} TF/s, HBM {hbm_peak:.0f} GB/s")

    trainer, state, batch_d = train_step_setup(batch, **extra)
    batch_d = {k: jax.device_put(v) for k, v in batch_d.items()}
    # init_state leaves include host numpy arrays (optimizer zeros); the
    # production loop uploads them once (step 1 returns device state and
    # rebinds), but a measurement loop re-feeding the SAME state would
    # re-upload ~45 MB through the tunnel EVERY call (measured: 2 s/call
    # of pure transfer).  Pin everything on device up front.
    state = jax.device_put(state)
    H, W = trainer.config.image_size
    noise = jax.random.normal(
        jax.random.PRNGKey(0),
        (batch, H, W, trainer.config.layout_noise_dim), jnp.float32)

    rows = []

    def add(name, ms, flops, bytes_cost, io_min):
        tfs = (flops / (ms / 1e3) / 1e12) if flops else None
        gbs_min = (io_min / (ms / 1e3) / 1e9) if io_min else None
        pm = tfs / mm_peak if tfs else None
        ph = gbs_min / hbm_peak if gbs_min else None
        # Speed-of-light: the section cannot run faster than its FLOPs at
        # MXU peak nor than its physical-minimum bytes at HBM peak.
        sol_ms = None
        if flops is not None and io_min is not None:
            sol_ms = max(flops / 1e12 / mm_peak, io_min / 1e9 / hbm_peak) \
                * 1e3
        rows.append({
            "section": name, "ms": round(ms, 3),
            "gflops": round(flops / 1e9, 2) if flops else None,
            "mbytes_io_min": round(io_min / 1e6, 1) if io_min else None,
            "mbytes_costmodel": (round(bytes_cost / 1e6, 1)
                                 if bytes_cost else None),
            "tflops_s": round(tfs, 1) if tfs else None,
            "gb_s_min": round(gbs_min, 1) if gbs_min else None,
            "pct_mxu_peak": round(100 * pm, 1) if pm else None,
            "pct_hbm_peak": round(100 * ph, 1) if ph else None,
            "sol_ms": round(sol_ms, 3) if sol_ms else None,
            "pct_sol": (round(100 * sol_ms / ms, 1) if sol_ms else None),
            "headroom_x": (round(ms / sol_ms, 2) if sol_ms else None),
            "bound": (None if pm is None or ph is None
                      else ("mxu" if pm >= ph else "hbm")),
        })
        print(f"{name:20s} {ms:8.3f} ms  {(flops or 0) / 1e9:8.1f} GF  "
              f"{(io_min or 0) / 1e6:7.0f} MBmin  "
              f"mxu {rows[-1]['pct_mxu_peak'] or 0:5.1f}%  "
              f"hbm {rows[-1]['pct_hbm_peak'] or 0:5.1f}%  "
              f"sol {rows[-1]['pct_sol'] or 0:5.1f}%  "
              f"headroom {rows[-1]['headroom_x'] or 0:4.2f}x  "
              f"{rows[-1]['bound']}")

    fns = trainer.train_step.phase_fns
    # imgs_fake for the D phases (one warm call of the forward phase).
    imgs_fake, _ = fns["g_forward"](state, batch_d, noise)
    imgs_fake = jax.lax.stop_gradient(imgs_fake)
    R.sync(imgs_fake)

    add("g_forward", *measure_jit(
        "g_fwd", lambda s, b, n: fns["g_forward"](s, b, n)[1],
        (state, batch_d, noise)))
    add("g_forward_backward", *measure_jit(
        "g_bwd", fns["g_forward_backward"], (state, batch_d, noise)))
    if "d_obj_step" in fns:
        add("d_obj_step", *measure_jit(
            "d_obj", fns["d_obj_step"], (state, batch_d, imgs_fake)))
    if "d_img_step" in fns:
        add("d_img_step", *measure_jit(
            "d_img", fns["d_img_step"], (state, batch_d, imgs_fake)))

    # crop kernel alone (the D_obj input prep; both fwd passes pay it).
    from sg2im_tpu.ops.crop import crop_bbox_padded

    cs = trainer.config.crop_size
    add("crop_kernel", *measure_jit(
        "crop", lambda im, bx: crop_bbox_padded(im, bx, cs),
        (batch_d["imgs"], batch_d["boxes"])))

    # Adam updates: all three optimizers' update+apply on real grad trees
    # (grads = params-shaped; use the params themselves as stand-in
    # cotangents — byte/flop identical).
    opts = trainer.optimizers

    def adam_fn(state):
        out = []
        for name, opt_state, vars_ in (
                ("g", state.g_opt, state.g_vars),
                ("d_obj", state.d_obj_opt, state.d_obj_vars),
                ("d_img", state.d_img_opt, state.d_img_vars)):
            params = vars_["params"]
            upd, _ = opts[name].update(params, opt_state, params,
                                       good=jnp.asarray(True))
            out.append(optax.global_norm(optax.apply_updates(params, upd)))
        return sum(out)

    add("adam_updates_x3", *measure_jit("adam", adam_fn, (state,)))

    # Full fused step (non-donating wrapper: the measurement loop re-feeds
    # the same state, which the production donate_argnums would free).
    add("full_step", *measure_jit(
        "full", lambda s, b: trainer.train_step(s, b, eval_mode=False),
        (state, batch_d), iters=10))

    perf_path = os.path.join(REPO, "PERF.json")
    perf = {}
    if os.path.exists(perf_path):
        with open(perf_path) as f:
            perf = json.load(f)
    key = ("train_step_sections" if cfg == "baseline"
           else f"train_step_sections_{cfg}")
    perf[key] = {
        "batch": batch, "config": cfg,
        "peaks": {"bf16_matmul_tflops_s": round(mm_peak, 1),
                  "hbm_copy_gb_s": round(hbm_peak, 1)},
        "note": "mbytes_io_min = post-DCE argument+output buffers "
                "(compiled.memory_analysis()) — a hard lower bound on "
                "physical HBM traffic; pct_sol = speed-of-light "
                "max(flops@mxu_peak, io_min@hbm_peak) over measured ms; "
                "headroom_x = the at-best improvement factor.  "
                "mbytes_costmodel (XLA logical bytes) kept for context "
                "only — it exceeds physical peak on fused sections.",
        "sections": rows,
    }
    with open(perf_path, "w") as f:
        json.dump(perf, f, indent=1)
    print(f"\nwrote PERF.json {key} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
