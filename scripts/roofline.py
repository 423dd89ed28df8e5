"""Per-section roofline of the flagship vg128 forward (b128, bf16 mode).

For every section of the generator (GCN, box/rel heads, mask head, layout
compose, noise concat, each CRN stage conv, the whole CRN, and the e2e
forward) this measures on the real TPU:

  - wall ms/iteration (tunnel-sync fenced),
  - FLOPs and HBM bytes from XLA's own post-fusion cost model
    (``compiled.cost_analysis()`` — no hand-derived counts to get wrong),
  - achieved TF/s and GB/s, as a fraction of the SAME-RUN measured chip
    peaks (large bf16 matmul; large f32 copy),
  - which bound (MXU vs HBM) the section sits closer to.

Writes ``PERF.json`` to the repo root (machine-readable roofline table)
and prints the markdown table for ARCHITECTURE.md §7.

Usage:  python scripts/roofline.py [batch] [sections]
        sections: comma-set of peaks,gcn,heads,mask,layout,noise,crn,
        stages,stages_prod,e2e (default all).  Run sections in
        few-at-a-time batches if the tunnel compile budget is tight.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sync(x):
    # Reduce ON DEVICE, then pull one scalar — a plain device_get would
    # drag the whole array through the ~23 MB/s tunnel and dominate every
    # measurement (block_until_ready doesn't sync through the tunnel).
    import jax.numpy as jnp

    leaves = [x] if not isinstance(x, (tuple, list)) else list(x)
    for leaf in leaves:
        if leaf is not None:
            return float(jnp.asarray(leaf).astype(jnp.float32).sum())
    return 0.0


_DISPATCH_FLOOR_MS = 0.0  # measured per-call host dispatch cost (tunnel)


def measure(name, fn, args, iters=20, correct=True):
    """(ms, flops, bytes) for one jitted callable.  ``ms`` has the
    measured per-dispatch host floor subtracted (the axon tunnel costs
    ~2 ms per async dispatch, which would swamp sub-5 ms sections)."""
    import jax

    # One AOT compile per section: execute the compiled executable
    # directly rather than calling jax.jit(fn)(*args), which would pay a
    # SECOND trace+compile through the tunnel (the AOT result does not
    # seed the jit dispatch cache).
    compiled = jax.jit(fn).lower(*args).compile()
    flops = bytes_ = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = ca.get("flops")
        bytes_ = ca.get("bytes accessed")
    except Exception as e:  # pragma: no cover
        print(f"  ({name}: cost_analysis unavailable: {e!r})",
              file=sys.stderr)
    out = compiled(*args)
    sync(out)
    out = compiled(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    sync(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    if correct:
        ms = max(ms - _DISPATCH_FLOOR_MS, 0.05)
    return ms, flops, bytes_


def measure_dispatch_floor():
    """Per-call host-side dispatch cost: a trivial jitted op timed with
    the same loop.  Everything the device does is ~us; the remainder is
    the (tunnel) dispatch path all section timings also pay per call."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 128), jnp.float32)
    ms, _, _ = measure("floor", lambda v: v + 1.0, (x,), iters=50,
                       correct=False)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from sg2im_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    pick = set((sys.argv[2] if len(sys.argv) > 2 else
                "peaks,gcn,heads,mask,layout,noise,crn,stages,"
                "stages_prod,e2e").split(","))

    N, O, T = batch, 16, 32
    D = 128          # embedding/gconv dim
    HID = 512        # gconv hidden
    HW = 128         # image size
    M = 16           # mask size
    ND = 32          # layout noise dim
    bf16 = jnp.bfloat16
    rng = np.random.RandomState(0)
    rows = []

    # -- dispatch floor + chip peaks (measured in this run) -------------
    global _DISPATCH_FLOOR_MS
    _DISPATCH_FLOOR_MS = measure_dispatch_floor()
    print(f"per-dispatch host floor: {_DISPATCH_FLOOR_MS:.2f} ms "
          f"(subtracted from every section below)")

    mm_peak_tfs, hbm_peak_gbs = 166.0, 800.0  # fallbacks
    try:  # a subset run reuses the last measured peaks as denominators
        with open(os.path.join(REPO, "PERF.json")) as f:
            pk = json.load(f).get("peaks", {})
        mm_peak_tfs = pk.get("bf16_matmul_tflops_s", mm_peak_tfs)
        hbm_peak_gbs = pk.get("hbm_copy_gb_s", hbm_peak_gbs)
    except Exception:
        pass
    if "peaks" in pick:
        K = 8192
        a = jnp.asarray(rng.randn(K, K), bf16)
        b = jnp.asarray(rng.randn(K, K), bf16)
        ms, _, _ = measure("mm_peak", lambda x, y: x @ y, (a, b), iters=10)
        mm_peak_tfs = 2 * K**3 / (ms / 1e3) / 1e12
        big = jnp.asarray(rng.randn(256, 1024, 1024), jnp.float32)  # 1.07 GB
        ms2, _, _ = measure("copy_peak", lambda x: x * 1.0000001 + 1e-7,
                            (big,), iters=10)
        hbm_peak_gbs = 2 * big.nbytes / (ms2 / 1e3) / 1e9
        print(f"peaks: bf16 matmul {mm_peak_tfs:.1f} TF/s, "
              f"HBM copy {hbm_peak_gbs:.0f} GB/s")

    def add(name, ms, flops, bytes_):
        tfs = (flops / (ms / 1e3) / 1e12) if flops else None
        gbs = (bytes_ / (ms / 1e3) / 1e9) if bytes_ else None
        pm = tfs / mm_peak_tfs if tfs else None
        ph = gbs / hbm_peak_gbs if gbs else None
        bound = None
        if pm is not None and ph is not None:
            bound = "mxu" if pm >= ph else "hbm"
        rows.append({
            "section": name, "ms": round(ms, 3),
            "gflops": round(flops / 1e9, 2) if flops else None,
            "mbytes": round(bytes_ / 1e6, 1) if bytes_ else None,
            "tflops_s": round(tfs, 1) if tfs else None,
            "gb_s": round(gbs, 1) if gbs else None,
            "pct_mxu_peak": round(100 * pm, 1) if pm else None,
            "pct_hbm_peak": round(100 * ph, 1) if ph else None,
            "bound": bound,
        })
        print(f"{name:18s} {ms:8.3f} ms  "
              f"{(flops or 0) / 1e9:8.1f} GF  {(bytes_ or 0) / 1e6:8.0f} MB"
              f"  {rows[-1]['tflops_s'] or 0:7.1f} TF/s"
              f"  {rows[-1]['gb_s'] or 0:7.1f} GB/s"
              f"  mxu {rows[-1]['pct_mxu_peak'] or 0:5.1f}%"
              f"  hbm {rows[-1]['pct_hbm_peak'] or 0:5.1f}%")

    # -- shared inputs --------------------------------------------------
    obj_vecs = jnp.asarray(rng.randn(N, O, D), jnp.float32)
    pred_vecs = jnp.asarray(rng.randn(N, T, D), jnp.float32)
    edges = jnp.asarray(
        np.stack([rng.randint(0, 11, (N, T)), rng.randint(0, 11, (N, T))],
                 -1).astype(np.int32))
    triple_mask = jnp.ones((N, T), jnp.float32)
    obj_mask = jnp.asarray(
        np.concatenate([np.ones((N, 11)), np.zeros((N, O - 11))],
                       1).astype(np.float32))
    lo = rng.uniform(0, 0.5, (N, O, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([lo, lo + 0.4], -1))
    masks16 = jnp.asarray((rng.rand(N, O, M, M) > 0.4).astype(np.float32))

    # -- GCN (5 layers, real modules + real-shaped params) --------------
    if "gcn" in pick:
        from sg2im_tpu.nn.graph import GraphTripleConv, GraphTripleConvNet

        g1 = GraphTripleConv(input_dim=D, output_dim=D, hidden_dim=HID)
        gn = GraphTripleConvNet(input_dim=D, hidden_dim=HID, num_layers=4)
        v1 = g1.init(jax.random.PRNGKey(0), obj_vecs, pred_vecs, edges,
                     triple_mask, obj_mask=obj_mask)
        vn = gn.init(jax.random.PRNGKey(1), obj_vecs, pred_vecs, edges,
                     triple_mask, obj_mask=obj_mask)

        def gcn_fn(v1, vn, ov, pv):
            ov, pv = g1.apply(v1, ov, pv, edges, triple_mask,
                              obj_mask=obj_mask)
            return gn.apply(vn, ov, pv, edges, triple_mask,
                            obj_mask=obj_mask)

        add("gcn_x5", *measure("gcn", gcn_fn,
                               (v1, vn, obj_vecs, pred_vecs)))

    # -- box + rel heads ------------------------------------------------
    if "heads" in pick:
        from sg2im_tpu.nn.layers import MLP

        box_net = MLP((D, HID, 4))
        rel_net = MLP((2 * D + 8, HID, 46))
        rel_in = jnp.asarray(rng.randn(N, T, 2 * D + 8), jnp.float32)
        vb = box_net.init(jax.random.PRNGKey(0), obj_vecs)
        vr = rel_net.init(jax.random.PRNGKey(1), rel_in)

        def heads_fn(vb, vr, ov, ri):
            return (box_net.apply(vb, ov, mask=obj_mask),
                    rel_net.apply(vr, ri, mask=triple_mask))

        add("box+rel_heads", *measure("heads", heads_fn,
                                      (vb, vr, obj_vecs, rel_in)))

    # -- mask head ------------------------------------------------------
    if "mask" in pick:
        from sg2im_tpu.models.sg2im import MaskNet

        mn = MaskNet(D, M)
        mask_in = obj_vecs.reshape(N * O, 1, 1, D)
        flat_mask = obj_mask.reshape(N * O)
        # init on one sample: params are batch-independent, compile is not
        vm = mn.init(jax.random.PRNGKey(0), mask_in[:1], train=False,
                     sample_mask=flat_mask[:1])

        def mask_fn(vm, x):
            s = mn.apply(vm, x, train=False, sample_mask=flat_mask)
            return jax.nn.sigmoid(s.reshape(N, O, M, M))

        add("mask_head", *measure("mask", mask_fn, (vm, mask_in)))

    # -- layout compose -------------------------------------------------
    if "layout" in pick:
        from sg2im_tpu.ops.layout import masks_to_layout

        def layout_fn(v, b, m):
            return masks_to_layout(v, b, m, obj_mask, HW, HW)

        add("layout_compose", *measure("layout", layout_fn,
                                       (obj_vecs, boxes, masks16)))

        def layout_fn_serving(v, b, m):
            # serving mode: (N,O,H,W) warp intermediate stored bf16
            # (tent weights f32, f32 accumulation — ops/layout.py)
            return masks_to_layout(v, b, m, obj_mask, HW, HW,
                                   compute_dtype=bf16)

        add("layout_compose_bf16", *measure("layout_bf16",
                                            layout_fn_serving,
                                            (obj_vecs, boxes, masks16)))

    # -- noise gen + concat --------------------------------------------
    if "noise" in pick:
        layout = jnp.asarray(rng.randn(N, HW, HW, D), jnp.float32)

        def noise_fn(key, lay):
            nz = jax.random.normal(key, (N, HW, HW, ND), jnp.float32)
            return jnp.concatenate([lay, nz], -1)

        add("noise+concat", *measure("noise", noise_fn,
                                     (jax.random.PRNGKey(0), layout)))

        def noise_fn_serving(key, lay):
            # serving mode: the layout arrives already bf16 (cast fused
            # into the compose epilogue, models/sg2im.py) and the concat
            # writes/reads the widest pre-CRN tensor half-width.
            nz = jax.random.normal(key, (N, HW, HW, ND), jnp.float32)
            return jnp.concatenate([lay, nz.astype(lay.dtype)], -1)

        add("noise+concat_bf16", *measure(
            "noise_bf16", noise_fn_serving,
            (jax.random.PRNGKey(0), layout.astype(bf16))))

    # -- whole CRN (real module, bf16 chain, eval mode) -----------------
    if "crn" in pick:
        from sg2im_tpu.nn.crn import RefinementNetwork

        crn = RefinementNetwork(dims=(D + ND, 1024, 512, 256, 128, 64),
                                normalization="batch",
                                activation="leakyrelu-0.2",
                                compute_dtype=bf16)
        lay_in = jnp.asarray(rng.randn(N, HW, HW, D + ND), jnp.float32)
        vc = crn.init(jax.random.PRNGKey(0), lay_in[:1], train=False)
        add("crn_total", *measure(
            "crn", lambda v, x: crn.apply(v, x, train=False), (vc, lay_in),
            iters=10))

    # -- per-stage CRN convs (bf16, fused bias+affine+leaky epilogue) ---
    if "stages" in pick:
        L = D + ND
        stages = [(1, 8, L, 1, 1024), (2, 16, L, 1024, 512),
                  (3, 32, L, 512, 256), (4, 64, L, 256, 128),
                  (5, 128, L, 128, 64)]
        for (s, res, Ld, C, CO) in stages:
            cin0 = Ld + C
            x0 = jnp.asarray(rng.randn(N, res, res, cin0), bf16)
            k0 = jnp.asarray(rng.randn(3, 3, cin0, CO) * 0.05, bf16)
            x1 = jnp.asarray(rng.randn(N, res, res, CO), bf16)
            k1 = jnp.asarray(rng.randn(3, 3, CO, CO) * 0.05, bf16)
            scale = jnp.asarray(rng.rand(CO), jnp.float32)
            shift = jnp.asarray(rng.rand(CO), jnp.float32)

            def stage_conv(x, k, scale=scale, shift=shift):
                y = jax.lax.conv_general_dilated(
                    x, k, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = y.astype(jnp.float32) * scale + shift
                return jnp.where(y > 0, y, 0.2 * y).astype(bf16)

            add(f"crn_s{s}_conv0", *measure(f"s{s}c0", stage_conv,
                                            (x0, k0), iters=10))
            add(f"crn_s{s}_conv1", *measure(f"s{s}c1", stage_conv,
                                            (x1, k1), iters=10))

    # -- per-stage PRODUCTION modules (split mode + bf16, eval BN) ------
    # The 'stages' section above measures the LEGACY-shaped single conv
    # over the channel concat; the production serving path (bench default:
    # crn_mode='split', compute_dtype=bf16) never runs that shape — each
    # stage does one conv per input block (layout-width + feats-width).
    # Measured v5e/b128 (scripts/profile_small_conv.py): the difference is
    # decisive at stage 1, where the 161-channel concat conv costs 3.6x
    # the split composition (unaligned channel count, not FLOPs or bytes).
    # This section measures the REAL RefinementModule per stage so
    # PERF.json reflects what the e2e forward actually pays.
    if "stages_prod" in pick:
        from sg2im_tpu.nn.crn import RefinementModule

        L = D + ND
        # (stage, layout_res, input_dim, output_dim)
        prod_stages = [(1, 8, 1, 1024), (2, 16, 1024, 512),
                       (3, 32, 512, 256), (4, 64, 256, 128),
                       (5, 128, 128, 64)]
        for (s, res, cin, co) in prod_stages:
            mod = RefinementModule(L, cin, co, normalization="batch",
                                   activation="leakyrelu-0.2",
                                   compute_dtype=bf16, conv0_mode="split")
            level = jnp.asarray(rng.randn(N, res, res, L), bf16)
            feats = jnp.asarray(rng.randn(N, res // 2, res // 2, cin), bf16)
            vm = mod.init(jax.random.PRNGKey(s), level[:1], feats[:1],
                          train=False)

            def stage_fn(v, lv, ft, mod=mod):
                return mod.apply(v, lv, ft, train=False)

            add(f"crn_stage{s}_prod", *measure(f"s{s}prod", stage_fn,
                                               (vm, level, feats),
                                               iters=10))

    # -- end-to-end forward (bench configuration) -----------------------
    if "e2e" in pick:
        from bench import flagship_setup

        fwd, args = flagship_setup(batch)
        add("e2e_forward", *measure("e2e", fwd, args, iters=10))

    out = {"batch": N, "sections": rows}
    if "peaks" in pick:  # don't clobber measured peaks with fallbacks
        out["peaks"] = {"bf16_matmul_tflops_s": round(mm_peak_tfs, 1),
                        "hbm_copy_gb_s": round(hbm_peak_gbs, 1)}
    # Merge into the existing PERF.json: a subset run refreshes only its
    # own sections (by name) and leaves everything else (other sections,
    # the train_step keys from roofline_train.py) intact.
    path = os.path.join(REPO, "PERF.json")
    prev = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
    merged = list(prev.get("sections", []))
    by_name = {r["section"]: i for i, r in enumerate(merged)}
    for r in rows:
        if r["section"] in by_name:
            merged[by_name[r["section"]]] = r
        else:
            merged.append(r)
    prev.update(out)
    prev["sections"] = merged
    with open(path, "w") as f:
        json.dump(prev, f, indent=1)
    print(f"\nwrote PERF.json ({len(rows)} refreshed, "
          f"{len(merged)} total sections)")

    # markdown for ARCHITECTURE §7
    print("\n| section | ms | GFLOP | MB | TF/s | GB/s | %MXU | %HBM | "
          "bound |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['section']} | {r['ms']} | {r['gflops']} | "
              f"{r['mbytes']} | {r['tflops_s']} | {r['gb_s']} | "
              f"{r['pct_mxu_peak']} | {r['pct_hbm_peak']} | {r['bound']} |")


if __name__ == "__main__":
    main()
