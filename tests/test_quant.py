"""int8 turbo serving tier: checkpoint compatibility, accuracy bounds,
and the rbg noise option (nn/crn.py _conv_int8, inference.py).

The tier is opt-in and carries NO bit-parity contract with the reference
— these tests pin (a) the param tree is byte-compatible with the
unquantized model (weights quantize in-program, checkpoints untouched),
(b) the quantization error is bounded and the path is actually taken,
(c) the weakened-but-real determinism contracts of the rbg noise impl.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sg2im_tpu.inference import InferenceEngine
from sg2im_tpu.models import Sg2ImGenerator

VOCAB = {
    "object_idx_to_name": ["__image__", "a", "b", "c"],
    "object_name_to_idx": {"__image__": 0, "a": 1, "b": 2, "c": 3},
    "pred_idx_to_name": ["__in_image__", "by", "above"],
    "pred_name_to_idx": {"__in_image__": 0, "by": 1, "above": 2},
}

MODEL_KWARGS = dict(
    image_size=(64, 64),
    embedding_dim=16,
    gconv_dim=24,
    gconv_hidden_dim=32,
    gconv_num_layers=2,
    refinement_dims=(32, 16, 8),  # stages at 16/32/64 px: two >= the
    normalization="batch",        # quant_min_res=32 threshold
    activation="leakyrelu-0.2",
    mask_size=4,
    layout_noise_dim=6,
)

SG = [{"objects": ["a", "b"], "relationships": [[0, "by", 1]]},
      {"objects": ["c"], "relationships": []}]


def _init_variables(**extra):
    gen = Sg2ImGenerator(vocab=VOCAB, **dict(MODEL_KWARGS, **extra))
    objs = jnp.zeros((1, 4), jnp.int32)
    triples = jnp.zeros((1, 3, 3), jnp.int32)
    masks = jnp.ones((1, 4), jnp.float32), jnp.ones((1, 3), jnp.float32)
    noise = jnp.zeros((1, 64, 64, 6), jnp.float32)
    return gen.init({"params": jax.random.PRNGKey(0)}, objs, triples,
                    *masks, train=False, layout_noise=noise)


def test_quant_param_tree_matches_unquantized():
    """crn_quant='int8' must not change the checkpoint collections
    (params/batch_stats): weights quantize in-program, so any existing
    checkpoint loads unchanged.  The tier's only state addition is the
    'quant' scale collection, which is calibrated, never stored in
    checkpoints."""
    base = _init_variables()
    quant = _init_variables(crn_quant="int8", crn_mode="split",
                            compute_dtype=jnp.bfloat16)
    assert set(quant.keys()) - set(base.keys()) == {"quant"}
    for coll in base:
        flat_b = jax.tree_util.tree_flatten_with_path(base[coll])[0]
        flat_q = jax.tree_util.tree_flatten_with_path(quant[coll])[0]
        paths_b = [(jax.tree_util.keystr(p), v.shape, v.dtype)
                   for p, v in flat_b]
        paths_q = [(jax.tree_util.keystr(p), v.shape, v.dtype)
                   for p, v in flat_q]
        assert paths_b == paths_q, coll


def test_quant_conv_int8_error_bound():
    """Single quantized conv vs f32: relative error within the symmetric
    per-channel int8 budget (~1/127 signal-relative)."""
    from sg2im_tpu.nn.crn import _conv, _conv_int8, _quant_act

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 12), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 12, 8) * 0.1, jnp.float32)
    ref = _conv(x, k, [(1, 1), (1, 1)])
    s = jnp.max(jnp.abs(x)) / 127.0
    got = _conv_int8(_quant_act(x, s), k, s)
    denom = float(jnp.max(jnp.abs(ref)))
    rel = float(jnp.max(jnp.abs(got - ref))) / denom
    assert rel < 0.025, rel
    assert rel > 0  # the int8 path actually ran


def test_quant_engine_output_bounded_vs_bf16():
    variables = _init_variables()
    kw = dict(compute_dtype=jnp.bfloat16, crn_mode="split")
    eng_f = InferenceEngine(VOCAB, MODEL_KWARGS, variables, **kw)
    eng_q = InferenceEngine(VOCAB, MODEL_KWARGS, variables, **kw,
                            quantize="int8")
    _, out_f = eng_f.generate(SG, noise="zeros")
    _, out_q = eng_q.generate(SG, noise="zeros")
    a = np.asarray(out_f["imgs"], np.float32)
    b = np.asarray(out_q["imgs"], np.float32)
    scale = np.abs(a).max()
    rel = np.abs(a - b).max() / (scale + 1e-12)
    assert 0 < rel < 0.35, rel
    # Geometry heads are untouched by the CRN tier: boxes bit-identical.
    np.testing.assert_array_equal(np.asarray(out_f["boxes"]),
                                  np.asarray(out_q["boxes"]))


def test_quant_low_res_stages_unquantized():
    """quant_min_res: a model whose stages all sit below the threshold
    must produce BIT-IDENTICAL output with and without the tier."""
    kw = dict(MODEL_KWARGS, image_size=(16, 16), refinement_dims=(16, 8),
              layout_noise_dim=0, mask_size=4)
    variables_kw = dict(kw)
    gen = Sg2ImGenerator(vocab=VOCAB, **variables_kw)
    objs = jnp.zeros((1, 4), jnp.int32)
    triples = jnp.zeros((1, 3, 3), jnp.int32)
    om, tm = jnp.ones((1, 4), jnp.float32), jnp.ones((1, 3), jnp.float32)
    variables = gen.init({"params": jax.random.PRNGKey(0)}, objs, triples,
                         om, tm, train=False)
    ekw = dict(compute_dtype=jnp.bfloat16, crn_mode="split")
    eng_f = InferenceEngine(VOCAB, kw, variables, **ekw)
    eng_q = InferenceEngine(VOCAB, kw, variables, **ekw, quantize="int8")
    _, out_f = eng_f.generate(SG, noise=None, seed=1)
    _, out_q = eng_q.generate(SG, noise=None, seed=1)
    np.testing.assert_array_equal(np.asarray(out_f["imgs"]),
                                  np.asarray(out_q["imgs"]))


def test_quant_calibration_lifecycle():
    variables = _init_variables()
    kw = dict(compute_dtype=jnp.bfloat16, crn_mode="split",
              quantize="int8")
    eng = InferenceEngine(VOCAB, MODEL_KWARGS, variables, **kw)
    assert not eng.calibrated
    # Warmup compiles both program flavors but DISCARDS the trivial
    # graphs' scales.
    eng.warmup(batch_sizes=(1,))
    assert not eng.calibrated
    eng.calibrate(SG, noise="zeros")
    assert eng.calibrated
    scales = jax.tree.map(float, jax.device_get(eng.variables["quant"]))
    flat = jax.tree_util.tree_leaves(scales)
    # Some scales (the 'act_up' feats-handoff ones) can legitimately be
    # 0.0 here: the untrained final-ReLU box head emits degenerate
    # boxes, so parts of the feats chain are identically zero on this
    # model (zero tensor -> zero scale, floored at 1e-30 when used —
    # and warned about, see test_quant_zero_scale_warning).  At least
    # one real scale must be recorded.
    assert flat and all(s >= 0 for s in flat) and any(s > 0 for s in flat)
    # The static program is deterministic.
    _, o1 = eng.generate(SG, noise="zeros")
    _, o2 = eng.generate(SG, noise="zeros")
    np.testing.assert_array_equal(np.asarray(o1["imgs"]),
                                  np.asarray(o2["imgs"]))
    # Re-calibration is a running max: same data -> unchanged scales.
    eng.calibrate(SG, noise="zeros")
    scales2 = jax.tree.map(float, jax.device_get(eng.variables["quant"]))
    assert scales == scales2

    # Auto-calibration: a fresh engine calibrates on its first batch and
    # serves statically from the second on.
    eng2 = InferenceEngine(VOCAB, MODEL_KWARGS, variables, **kw)
    _, a1 = eng2.generate(SG, noise="zeros")
    assert eng2.calibrated
    _, a2 = eng2.generate(SG, noise="zeros")
    np.testing.assert_array_equal(np.asarray(a2["imgs"]),
                                  np.asarray(o1["imgs"]))

    # calibrate() on a non-quantized engine is an error.
    eng_f = InferenceEngine(VOCAB, MODEL_KWARGS, variables,
                            compute_dtype=jnp.bfloat16, crn_mode="split")
    with pytest.raises(ValueError, match="quantize"):
        eng_f.calibrate(SG)


def test_quant_zero_scale_warning():
    """A calibration pass that records an exactly-zero activation scale
    (unrepresentative data) must warn — later traffic through that
    tensor collapses to ~0 after dequantization, which is output
    collapse, not graceful saturation."""
    import warnings

    quant = {"mod": {"act_up": jnp.float32(0.0),
                     "act_mid": jnp.float32(0.5)}}
    with pytest.warns(UserWarning, match="ZERO activation scale"):
        InferenceEngine._warn_zero_scales(quant)
    with warnings.catch_warnings():  # all-nonzero scales: no warning
        warnings.simplefilter("error")
        InferenceEngine._warn_zero_scales(
            {"mod": {"act_up": jnp.float32(0.1)}})


def test_quant_replica_calibration_shared():
    """--replicas + --quantize int8: the _Dispatcher routes the FIRST
    request to replica 0, whose auto-calibration scales are then copied
    to every replica — all replicas serve the identical static program,
    so a request's bytes cannot depend on round-robin routing."""
    from sg2im_tpu.cli.serve import _Dispatcher

    variables = _init_variables()
    kw = dict(compute_dtype=jnp.bfloat16, crn_mode="split",
              quantize="int8")
    devs = jax.devices()
    engines = [InferenceEngine(VOCAB, MODEL_KWARGS, variables,
                               device=devs[i], **kw) for i in range(2)]
    disp = _Dispatcher(engines, max_graphs=8, window_ms=0.0)
    assert disp._needs_cal
    disp.submit(SG, "zeros", 0)
    assert not disp._needs_cal
    assert all(e.calibrated for e in engines)
    s0 = jax.tree.map(float, jax.device_get(engines[0].variables["quant"]))
    s1 = jax.tree.map(float, jax.device_get(engines[1].variables["quant"]))
    assert s0 == s1
    # Round-robin now alternates replicas: the same request + seed must
    # be byte-identical whichever replica serves it.
    a, _ = disp.submit(SG, "zeros", 3)
    b, _ = disp.submit(SG, "zeros", 3)
    np.testing.assert_array_equal(a, b)
    per_replica = [bt.engine_calls for bt in disp.batchers]
    assert sorted(per_replica) == [1, 2], per_replica


def test_engine_noise_impl_rbg():
    variables = _init_variables()
    eng_t = InferenceEngine(VOCAB, MODEL_KWARGS, variables)
    eng_r = InferenceEngine(VOCAB, MODEL_KWARGS, variables,
                            noise_impl="rbg", noise_dtype=jnp.bfloat16)
    imgs1, _ = eng_r.generate(SG, noise=None, seed=7)
    imgs2, _ = eng_r.generate(SG, noise=None, seed=7)
    # Deterministic per (seed, shape): same request -> same bytes.
    np.testing.assert_array_equal(imgs1, imgs2)
    imgs3, _ = eng_r.generate(SG, noise=None, seed=8)
    assert not np.array_equal(imgs1, imgs3)  # the seed is honored
    imgs_t, _ = eng_t.generate(SG, noise=None, seed=7)
    assert not np.array_equal(imgs1, imgs_t)  # a different stream

def test_engine_rejects_unknown_tier_options():
    variables = _init_variables()
    with pytest.raises(ValueError, match="quantize"):
        InferenceEngine(VOCAB, MODEL_KWARGS, variables, quantize="int4")
    with pytest.raises(ValueError, match="noise_impl"):
        InferenceEngine(VOCAB, MODEL_KWARGS, variables, noise_impl="xor")

def test_quant_selective_knobs():
    """quant_opts (the turbo frontier knobs): exempting the head / the
    high-res stages must (a) change the output vs the full tier (the
    exemption is real), (b) move it TOWARD the unquantized engine, and
    (c) degrade to bit-identical-with-unquantized when every stage is
    exempted."""
    variables = _init_variables()
    kw = dict(compute_dtype=jnp.bfloat16, crn_mode="split")
    eng_f = InferenceEngine(VOCAB, MODEL_KWARGS, variables, **kw)
    eng_q = InferenceEngine(VOCAB, MODEL_KWARGS, variables, **kw,
                            quantize="int8")
    eng_h = InferenceEngine(VOCAB, MODEL_KWARGS, variables, **kw,
                            quantize="int8", quant_opts={"head": False})
    eng_none = InferenceEngine(VOCAB, MODEL_KWARGS, variables, **kw,
                               quantize="int8", quant_opts={"max_res": 8})
    ref = np.asarray(eng_f.generate(SG, noise="zeros")[1]["imgs"],
                     np.float32)
    full = np.asarray(eng_q.generate(SG, noise="zeros")[1]["imgs"],
                      np.float32)
    head = np.asarray(eng_h.generate(SG, noise="zeros")[1]["imgs"],
                      np.float32)
    none = np.asarray(eng_none.generate(SG, noise="zeros")[1]["imgs"],
                      np.float32)
    assert not np.array_equal(full, head)  # the head exemption is real
    # exempting the head moves the output toward the unquantized engine
    assert np.abs(head - ref).mean() < np.abs(full - ref).mean()
    # all-exempt == the unquantized program, bit for bit
    np.testing.assert_array_equal(none, np.asarray(
        eng_f.generate(SG, noise="zeros")[1]["imgs"], np.float32))


def test_quant_default_tier_is_adopted_band():
    """The engine's DEFAULT int8 tier is the round-5 adopted frontier
    point {'max_res': 64} (stages above 64 px layout resolution — and
    therefore the head — exempt: 44.4 dB u8 gate at +13% measured on
    v5e, SERVING.md).  Pins: (a) the default merges to max_res=64,
    (b) per-key overrides EXTEND the default rather than replace it,
    (c) an explicit None value restores the unbounded round-4 band,
    (d) for a 128 px model the default tier == an explicit
    {'max_res': 64} bitwise and differs from the unbounded band."""
    variables = _init_variables()
    eng_d = InferenceEngine(VOCAB, MODEL_KWARGS, variables, quantize="int8")
    assert eng_d.model_kwargs["crn_quant_max_res"] == 64
    eng_h = InferenceEngine(VOCAB, MODEL_KWARGS, variables, quantize="int8",
                            quant_opts={"head": False})
    assert eng_h.model_kwargs["crn_quant_max_res"] == 64  # merged, kept
    assert eng_h.model_kwargs["crn_quant_head"] is False
    eng_r4 = InferenceEngine(VOCAB, MODEL_KWARGS, variables,
                             quantize="int8", quant_opts={"max_res": None})
    assert "crn_quant_max_res" not in eng_r4.model_kwargs  # unbounded

    # Functional check on a model that HAS a stage above 64 px: the
    # default band must equal the explicit 64-cap bitwise and differ
    # from the unbounded round-4 band (the s5 exemption is real).
    kw128 = dict(MODEL_KWARGS, image_size=(128, 128),
                 refinement_dims=(16, 12, 8, 6), layout_noise_dim=0)
    gen = Sg2ImGenerator(vocab=VOCAB, **kw128)
    objs = jnp.zeros((1, 4), jnp.int32)
    triples = jnp.zeros((1, 3, 3), jnp.int32)
    om, tm = jnp.ones((1, 4), jnp.float32), jnp.ones((1, 3), jnp.float32)
    v128 = gen.init({"params": jax.random.PRNGKey(0)}, objs, triples,
                    om, tm, train=False)
    ekw = dict(compute_dtype=jnp.bfloat16, crn_mode="split")
    outs = {}
    for name, qo in (("default", None), ("cap64", {"max_res": 64}),
                     ("r4", {"max_res": None})):
        e = InferenceEngine(VOCAB, kw128, v128, **ekw, quantize="int8",
                            quant_opts=qo)
        outs[name] = np.asarray(e.generate(SG, noise="zeros")[1]["imgs"],
                                np.float32)
    np.testing.assert_array_equal(outs["default"], outs["cap64"])
    assert not np.array_equal(outs["default"], outs["r4"])


def test_calibration_save_load_roundtrip(tmp_path):
    """Scale provenance (serve --save_calibration / --calibration_file):
    a calibrated engine's scales save to JSON and load into a FRESH
    engine bit-exactly — same output bytes, no auto-calibration on the
    loaded engine's first batch.  JSON floats are exact for f32 values
    (shortest round-trip repr), so the cycle is bitwise."""
    variables = _init_variables()
    kw = dict(compute_dtype=jnp.bfloat16, crn_mode="split",
              quantize="int8")
    eng_a = InferenceEngine(VOCAB, MODEL_KWARGS, variables, **kw)
    eng_a.calibrate(SG)
    out_a = np.asarray(eng_a.generate(SG, noise="zeros")[1]["imgs"],
                       np.float32)
    path = str(tmp_path / "cal.json")
    eng_a.save_calibration(path)

    eng_b = InferenceEngine(VOCAB, MODEL_KWARGS, variables, **kw)
    assert not eng_b.calibrated
    eng_b.load_calibration(path)
    assert eng_b.calibrated
    # loaded scales == saved scales bitwise
    flat_a = jax.tree_util.tree_leaves(
        jax.device_get(eng_a.variables["quant"]))
    flat_b = jax.tree_util.tree_leaves(
        jax.device_get(eng_b.variables["quant"]))
    np.testing.assert_array_equal(np.float32(flat_a), np.float32(flat_b))
    out_b = np.asarray(eng_b.generate(SG, noise="zeros")[1]["imgs"],
                       np.float32)
    np.testing.assert_array_equal(out_a, out_b)


def test_calibration_file_validation(tmp_path):
    """Loading rejects: wrong format, a different quantization band, and
    a tag set that doesn't match this model/band — each BEFORE touching
    engine state.  Zero scales warn exactly as live calibration would."""
    import json

    variables = _init_variables()
    kw = dict(compute_dtype=jnp.bfloat16, crn_mode="split",
              quantize="int8")
    eng = InferenceEngine(VOCAB, MODEL_KWARGS, variables, **kw)
    path = str(tmp_path / "cal.json")
    # save requires calibration; both require the int8 tier
    with pytest.raises(ValueError, match="not calibrated"):
        eng.save_calibration(path)
    eng_f = InferenceEngine(VOCAB, MODEL_KWARGS, variables)
    with pytest.raises(ValueError, match="quantize='int8'"):
        eng_f.save_calibration(path)
    with pytest.raises(ValueError, match="quantize='int8'"):
        eng_f.load_calibration(path)

    eng.calibrate(SG)
    eng.save_calibration(path)
    # band mismatch: same scales, different selective-quant band
    eng_band = InferenceEngine(VOCAB, MODEL_KWARGS, variables, **kw,
                               quant_opts={"max_res": None})
    with pytest.raises(ValueError, match="band"):
        eng_band.load_calibration(path)
    assert not eng_band.calibrated  # state untouched by the failed load
    # tag mismatch: drop one scale
    payload = json.loads(open(path).read())
    dropped = sorted(payload["scales"])[0]
    del payload["scales"][dropped]
    bad = str(tmp_path / "cal_bad.json")
    json.dump(payload, open(bad, "w"))
    eng_c = InferenceEngine(VOCAB, MODEL_KWARGS, variables, **kw)
    with pytest.raises(ValueError, match="missing"):
        eng_c.load_calibration(bad)
    # wrong format field
    payload = json.loads(open(path).read())
    payload["format"] = "something_else"
    json.dump(payload, open(bad, "w"))
    with pytest.raises(ValueError, match="format"):
        eng_c.load_calibration(bad)
    # zero scales warn on load (output-collapse tripwire, same as live)
    payload = json.loads(open(path).read())
    k0 = sorted(payload["scales"])[0]
    payload["scales"][k0] = 0.0
    zero = str(tmp_path / "cal_zero.json")
    json.dump(payload, open(zero, "w"))
    with pytest.warns(UserWarning, match="ZERO activation scale"):
        eng_c.load_calibration(zero)


def test_quant_opts_requires_tier():
    variables = _init_variables()
    with pytest.raises(ValueError, match="quant_opts"):
        InferenceEngine(VOCAB, MODEL_KWARGS, variables,
                        quant_opts={"head": False})
    with pytest.raises(ValueError, match="unknown quant_opts"):
        InferenceEngine(VOCAB, MODEL_KWARGS, variables, quantize="int8",
                        quant_opts={"stage": 3})


def test_noise_downsample_turbo_knob():
    """noise_downsample (turbo element-reduction lever): f=2 draws the
    seeded layout noise at (H/2, W/2) and nearest-upsamples on-chip.
    Pins: (a) only the SEEDED path changes (zeros-noise outputs bit-equal
    to f=1), (b) the seeded output actually changes, (c) it stays
    deterministic per seed, and (d) invalid factors are rejected."""
    variables = _init_variables()
    eng1 = InferenceEngine(VOCAB, MODEL_KWARGS, variables)
    eng2 = InferenceEngine(VOCAB, MODEL_KWARGS, variables,
                           noise_downsample=2)
    z1 = np.asarray(eng1.generate(SG, noise="zeros")[1]["imgs"])
    z2 = np.asarray(eng2.generate(SG, noise="zeros")[1]["imgs"])
    np.testing.assert_array_equal(z1, z2)  # zeros path untouched
    s1 = np.asarray(eng1.generate(SG, noise=None, seed=3)[1]["imgs"])
    s2 = np.asarray(eng2.generate(SG, noise=None, seed=3)[1]["imgs"])
    assert not np.array_equal(s1, s2)  # the half-res draw is real
    s2b = np.asarray(eng2.generate(SG, noise=None, seed=3)[1]["imgs"])
    np.testing.assert_array_equal(s2, s2b)  # deterministic per seed
    assert np.isfinite(s2).all()
    with pytest.raises(ValueError, match="noise_downsample"):
        InferenceEngine(VOCAB, MODEL_KWARGS, variables, noise_downsample=3)
    with pytest.raises(ValueError, match="does not divide"):
        InferenceEngine(VOCAB, dict(MODEL_KWARGS, image_size=(66, 66)),
                        variables, noise_downsample=4)
