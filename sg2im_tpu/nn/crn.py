"""Cascaded Refinement Network (Chen & Koltun, ICCV 2017).

Reference: ``sg2im/crn.py``.  Flax/NHWC redesign: each module nearest-2×
upsamples its features, average-pools the layout down to match
(``crn.py:54-62``), concatenates, and applies two conv-norm-act blocks;
features start as zeros at H/2^k (``crn.py:105``).  Convs use kaiming-normal
init (``crn.py:49-51,84-85``).  Layer names follow the torch Sequential
indices inside each module's ``net`` for checkpoint conversion (conv at 0/3
with norms present, see ``crn.py:40-52``).
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sg2im_tpu.nn.layers import (
    BatchNorm,
    apply_activation,
    avg_pool_2d,
    instance_norm_2d,
    kaiming_normal_init,
    parse_activation,
    torch_linear_bias_init,
    upsample_nearest,
)


def _conv(x, kernel, padding):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---------------------------------------------------------------------------
# int8 quantized convs — the opt-in 'turbo' serving tier.  Symmetric
# quantization: per-output-channel weight scales (derived from the f32
# params in-program, negligible cost), per-tensor CALIBRATED activation
# scales (flax 'quant' collection: a calibration pass records max-abs on a
# representative batch, then the scales are static inputs to the compiled
# serving program — no per-batch reduction passes), int32 MXU
# accumulation, f32 dequant fused into the norm/act epilogues.
#
# The design is int8-RESIDENT: each quantized stage's epilogue emits int8
# directly (the write is the pass the epilogue already does — half the
# bytes of bf16), the nearest-2x upsample between stages is pure int8
# indexing, and the next conv consumes int8 without any materialized
# re-quantization.  Measured on v5e (scripts/profile_{int8_rng,
# quant_stage}.py): the int8 systolic path runs 1.6x bf16 and a per-conv
# DYNAMIC re-quantization pass costs more than the conv win on the
# HBM-bound stage-5 shape — which is exactly why the scales must be
# calibrated, not recomputed.  The deliberate accuracy trade is measured
# and documented in SERVING.md (this tier has no bit-parity contract).
# ---------------------------------------------------------------------------

def _quant_weight_int8(kernel):
    """f32 (kh,kw,cin,co) -> (int8 kernel, f32 per-channel scale (co,))."""
    kf = kernel.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-30) / 127.0
    kq = jnp.clip(jnp.round(kf / sw), -127, 127).astype(jnp.int8)
    return kq, sw


def _act_scale(mdl, name, x):
    """Calibrated per-tensor activation scale (collection 'quant').

    During calibration (the 'quant' collection mutable — see
    InferenceEngine.calibrate) the stored scale accumulates a running max
    over calibration batches and quantization uses the fresh batch value;
    during serving the stored scale is a static program input.  Values
    beyond the calibrated range clip at +-127 (graceful saturation)."""
    v = mdl.variable("quant", name, lambda: jnp.float32(0.0))
    if mdl.is_mutable_collection("quant"):
        cur = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
        v.value = jnp.maximum(v.value, cur)
        return jnp.maximum(cur, 1e-30)
    return jnp.maximum(v.value, 1e-30)


def _quant_act(x, s):
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127,
                    127).astype(jnp.int8)


def _conv_int8(xq, kernel, s_x, padding=((1, 1), (1, 1))):
    """int8 conv of a pre-quantized input; returns dequantized f32 (no
    bias) — the caller's norm/act epilogue fuses the dequant multiply."""
    kq, sw = _quant_weight_int8(kernel)
    y = jax.lax.conv_general_dilated(
        xq, kq, (1, 1), list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (s_x * sw)


class QuantConv3x3(nn.Module):
    """int8-path replacement for the stage's second ``nn.Conv``.  Param
    tree IDENTICAL to the ``nn.Conv`` it replaces ('kernel' (3,3,cin,co) +
    'bias'), so checkpoints and the converter are unaffected.

    ``__call__(x, s_in)``: ``x`` is already int8 at per-tensor scale
    ``s_in`` (the producer's epilogue emitted it — the int8-resident
    path; every call site hands the scale over, there is no
    self-quantizing variant)."""

    input_dim: int
    output_dim: int
    compute_dtype: object = None

    @nn.compact
    def __call__(self, x, s_in):
        kernel = self.param("kernel", kaiming_normal_init(),
                            (3, 3, self.input_dim, self.output_dim))
        bias = self.param("bias", torch_linear_bias_init(self.input_dim * 9),
                          (self.output_dim,))
        return _conv_int8(x, kernel, s_in) + bias


# ---------------------------------------------------------------------------
# Packed (space-to-depth) domain: run a stage's convs at half resolution
# with 4x channels.  A 3x3 'same' conv on the fine grid becomes a 2x2
# VALID conv on the packed grid with phase-structured kernels — the MXU
# sees K,N four times larger (measured v5e, stage-5 conv0 b128: 7.30 ms
# packed vs 10.78 ms stock = 1.48x despite 1.19x the FLOPs).  All
# reformulations below are exact (additions reassociate only).
# ---------------------------------------------------------------------------

def space_to_depth(x):
    """(N, 2R, 2Rw, C) -> (N, R, Rw, 4C), phase-major channel order
    ((a*2+b)*C + c for fine position (2i+a, 2j+b))."""
    N, H, W, C = x.shape
    return x.reshape(N, H // 2, 2, W // 2, 2, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(N, H // 2, W // 2, 4 * C)


def depth_to_space(x):
    """Inverse of :func:`space_to_depth`."""
    N, R, Rw, C4 = x.shape
    c = C4 // 4
    return x.reshape(N, R, Rw, 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(N, 2 * R, 2 * Rw, c)


@functools.cache
def _phase_select():
    """S[a, u, p, d]: output fine-phase ``a``, packed-window row ``u``,
    source phase ``p`` receives stock-kernel tap ``d`` (= di+1).  Derived
    from source fine row 2i+a+di = 2(i+a-1+u)+p  =>  di = a + 2u + p - 2."""
    S = np.zeros((2, 2, 2, 3), np.float32)
    for a in range(2):
        for u in range(2):
            for p in range(2):
                di = a + 2 * u + p - 2
                if -1 <= di <= 1:
                    S[a, u, p, di + 1] = 1.0
    return S


def _packed_kernel_distinct(w):
    """Stock (3,3,CIN,CO) -> packed (2,2,4*CIN,4*CO) for an input whose
    four phases hold distinct fine-grid values."""
    S = jnp.asarray(_phase_select(), w.dtype)
    k = jnp.einsum("aupd,bvqe,delc->uvpqlabc", S, S, w,
                   precision="highest")
    return k.reshape(2, 2, 4 * w.shape[2], 4 * w.shape[3])


def _packed_kernel_aliased(w):
    """Stock (3,3,CIN,CO) -> packed (2,2,CIN,4*CO) for an input whose four
    phases alias one value (a nearest-2x-upsampled map): taps landing on
    the same source pixel merge, giving the 2.25x FLOP cut of the phase
    factoring (see FusedUpsampleConv)."""
    S2 = jnp.asarray(_phase_select().sum(axis=2), w.dtype)  # (a, u, d)
    k = jnp.einsum("aud,bve,delc->uvlabc", S2, S2, w,
                   precision="highest")
    return k.reshape(2, 2, w.shape[2], 4 * w.shape[3])


def _packed_conv_apply(x, k_packed, co):
    """Pad-1 + 2x2 VALID conv + per-phase shifted gather.

    ``x``: (N, R, Rw, Cin) packed input; ``k_packed``: (2,2,Cin,4*co).
    Output phase (a,b) at packed position (i,j) reads conv output (i+a,
    j+b) — contiguous slices, no strided interleave."""
    N, R, Rw, _ = x.shape
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = _conv(xpad, k_packed, "VALID")  # (N, R+1, Rw+1, 4co)
    parts = [y[:, a:a + R, b:b + Rw, (2 * a + b) * co:(2 * a + b + 1) * co]
             for a in (0, 1) for b in (0, 1)]
    return jnp.concatenate(parts, axis=-1)


class PackedConv3x3(nn.Module):
    """A stock-parameter 3x3 'same' conv applied in the packed domain.
    Param tree is IDENTICAL to the ``nn.Conv`` it replaces ('kernel'
    (3,3,cin,co) + 'bias'), so checkpoints are unaffected."""

    input_dim: int
    output_dim: int
    compute_dtype: object = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", kaiming_normal_init(),
                            (3, 3, self.input_dim, self.output_dim))
        bias = self.param("bias", torch_linear_bias_init(self.input_dim * 9),
                          (self.output_dim,))
        dt = self.compute_dtype or x.dtype
        x = x.astype(dt)
        # Derive in the param dtype (f32, exact sums), cast once after.
        kp = _packed_kernel_distinct(kernel).astype(dt)
        out = _packed_conv_apply(x, kp, self.output_dim)
        return out + jnp.tile(bias.astype(dt), 4)


class FusedUpsampleConv(nn.Module):
    """``conv3x3(concat(layout, nearest_up2(feats)))`` without materializing
    the upsampled feats.

    Each output pixel of a 3x3 'same' conv over a nearest-2x-upsampled map
    sees only a 2x2 window of *distinct* source pixels (taps alias), so the
    feats branch factors into four phase-specific 2x2 kernels applied at low
    resolution + a depth-to-space interleave: 16 instead of 36 MACs per 2x2
    output block (2.25x fewer FLOPs), and the (2R)^2-size upsampled feats
    tensor never exists in HBM.  The layout branch stays a plain 3x3 conv.
    Exact same math as the reference composition (additions reassociate;
    ~1e-6 relative difference) — reference ``sg2im/crn.py:54-63``.

    Parameters are IDENTICAL to the unfused ``nn.Conv`` ('kernel' of shape
    (3, 3, layout_dim + feats_dim, output_dim) + 'bias'), so checkpoint
    conversion and the param tree are unchanged; the phase kernels are
    derived on the fly (negligible: 16*Cin*Cout FLOPs).

    ``mode``:
      'legacy' (default) — materialize the upsample and run one 3x3 conv.
        Measured FASTER under plain XLA on v5e (the phase path's
        depth-to-space interleave lowers to expensive strided copies:
        2600 vs 3100 img/s end-to-end at vg128/b128).
      'phase' — the factored math above.  Numerically ~1e-6-identical to
        legacy (tests pin this); it is the formulation the Pallas CRN
        stage kernel implements, where the interleave is free in-VMEM
        indexing.
      'split' — conv(layout, Wl) + conv(up, Wf): the channel contraction
        distributes over the input-channel concat, so the
        (layout_dim+feats_dim)-channel concat tensor (the stage's widest
        HBM tensor, e.g. 288 ch at 128x128 for vg128 s5) is never
        materialized.  Exact up to sum reassociation (~1e-6 relative;
        tests pin vs legacy).  Equal-resolution stages (no upsample)
        keep the plain concat+conv — their concat is tiny.

    ``noise_dim`` > 0 (split mode only): the trailing ``noise_dim``
    channels of the layout block arrive as a SEPARATE ``noise`` tensor
    and get their own kernel slice — the full-res
    ``concat(layout, noise)`` (the generator's biggest tensor, e.g.
    128x128x160 per image for vg128) then never exists at ANY pyramid
    resolution (see RefinementNetwork).  Same parameters, same exactness
    class (sum reassociation only).
    """

    layout_dim: int
    feats_dim: int
    output_dim: int
    compute_dtype: object = None
    mode: str = "legacy"
    noise_dim: int = 0  # trailing layout channels supplied separately
    quant: bool = False  # int8 MXU path (turbo tier; see _conv_int8)

    @nn.compact
    def __call__(self, layout, feats, noise=None, feats_scale=None):
        """``feats_scale``: when given, ``feats`` is ALREADY int8 at that
        per-tensor scale (the previous quantized stage's epilogue emitted
        it — the int8-resident handoff); requires ``quant``."""
        cin = self.layout_dim + self.feats_dim
        co = self.output_dim
        kernel = self.param("kernel", kaiming_normal_init(),
                            (3, 3, cin, co))
        bias = self.param("bias", torch_linear_bias_init(cin * 9), (co,))
        dt = self.compute_dtype or layout.dtype
        k = kernel.astype(dt)
        layout = layout.astype(dt)
        Dl = self.layout_dim
        assert feats_scale is None or self.quant, (
            "int8 feats handoff requires the quantized stage")
        if not self.quant:
            feats = feats.astype(dt)
        if noise is not None:
            assert self.noise_dim and self.mode == "split", (
                "separate noise is a split-mode option")
            assert noise.shape[-1] == self.noise_dim
            assert layout.shape[-1] == Dl - self.noise_dim
            noise = noise.astype(dt)

        if self.quant:
            assert self.mode in ("legacy", "split"), (
                "int8 quant supports the legacy/split formulations")
            # Quantize feats at the COARSE resolution (4x fewer elements
            # than post-upsample) unless the producer already emitted
            # int8; the nearest-2x upsample is pure indexing, so it
            # commutes with quantization exactly.  (Equal-resolution
            # stages run unquantized — see below — so don't quantize
            # their input here.)
            if feats_scale is None and feats.shape[1] != layout.shape[1]:
                feats_scale = _act_scale(self, "act_up", feats)
                feats = _quant_act(feats, feats_scale)

        if feats.shape[1] == layout.shape[1]:
            # Feats already at layout resolution: plain concat+conv
            # (first stage, e.g. 4x4 for vg128 — the concat is tiny, and
            # so is any int8 win, so even a quantized stage runs this
            # conv in compute_dtype: dequantize handed-off feats).
            if self.quant:
                feats = (feats.astype(jnp.float32) * feats_scale
                         if feats_scale is not None else feats).astype(dt)
            parts = [layout] + ([noise] if noise is not None else [])
            x = jnp.concatenate(parts + [feats], axis=-1)
            return _conv(x, k, [(1, 1), (1, 1)]) + bias.astype(dt)

        assert 2 * feats.shape[1] == layout.shape[1], (feats.shape,
                                                       layout.shape)
        if self.mode == "legacy":
            if self.quant:
                # Branch-split is exact up to sum reassociation and lets
                # the feats ride the int8 upsample.  The LAYOUT branch
                # stays in compute_dtype: quantizing it would need a
                # materialized int8 copy of the level (the conv cannot
                # fuse the round/clip producer), and the shoot-out
                # (scripts/profile_quant_stage.py 'resident_ql' + the
                # quantize-pass bytes) shows that loses at every stage
                # except s3 — not worth a per-stage special case.
                up = upsample_nearest(feats, 2)
                out = _conv_int8(up, kernel[:, :, Dl:], feats_scale)
                out += _conv(layout, k[:, :, :Dl], [(1, 1), (1, 1)])
                return out + bias
            up = upsample_nearest(feats, 2)
            x = jnp.concatenate([layout, up], axis=-1)
            return _conv(x, k, [(1, 1), (1, 1)]) + bias.astype(dt)

        if self.mode == "split":
            up = upsample_nearest(feats, 2)
            if self.quant:
                # int8 up-feats branch + compute_dtype layout/noise
                # branches (see the legacy-mode comment), f32 accumulate.
                out = _conv_int8(up, kernel[:, :, Dl:], feats_scale)
                if noise is None:
                    out += _conv(layout, k[:, :, :Dl], [(1, 1), (1, 1)])
                else:
                    out += _conv(layout, k[:, :, :Dl - self.noise_dim],
                                 [(1, 1), (1, 1)])
                    out += _conv(noise, k[:, :, Dl - self.noise_dim:Dl],
                                 [(1, 1), (1, 1)])
                return out + bias
            if noise is None:
                out = _conv(layout, k[:, :, :Dl], [(1, 1), (1, 1)])
            else:
                out = _conv(layout, k[:, :, :Dl - self.noise_dim],
                            [(1, 1), (1, 1)])
                out += _conv(noise, k[:, :, Dl - self.noise_dim:Dl],
                             [(1, 1), (1, 1)])
            out += _conv(up, k[:, :, Dl:], [(1, 1), (1, 1)])
            return out + bias.astype(dt)

        wl = k[:, :, :self.layout_dim]
        out = _conv(layout, wl, [(1, 1), (1, 1)])

        # Per-axis tap aliasing for out[2i+a]: phase a=0 reads sources
        # (i-1, i) with weights (W[0], W[1]+W[2]); a=1 reads (i, i+1) with
        # (W[0]+W[1], W[2]).  Derive from the f32 param (exact tap sums),
        # cast once after — as in the packed modules.
        wf = kernel[:, :, self.layout_dim:]
        T = jnp.asarray([[[1, 0, 0], [0, 1, 1]],
                         [[1, 1, 0], [0, 0, 1]]], kernel.dtype)
        K = jnp.einsum("auk,bvl,klio->uviabo", T, T, wf,
                       precision="highest")
        Kb = K.reshape(2, 2, self.feats_dim, 4 * co).astype(dt)
        N, R, Rw, _ = feats.shape
        fpad = jnp.pad(feats, ((0, 0), (1, 1), (1, 1), (0, 0)))
        big = _conv(fpad, Kb, "VALID").reshape(N, R + 1, Rw + 1, 2, 2, co)
        rows = [
            jnp.stack([big[:, a:a + R, b:b + Rw, a, b] for b in (0, 1)],
                      axis=3)
            for a in (0, 1)
        ]
        up = jnp.stack(rows, axis=2).reshape(N, 2 * R, 2 * Rw, co)
        return out + up + bias.astype(dt)


class PackedUpsampleConv(nn.Module):
    """Packed-domain equivalent of :class:`FusedUpsampleConv`: the layout
    branch enters packed (4*layout_dim channels, distinct phases) and the
    feats branch enters as the coarse fine-grid map (feats_dim channels,
    phases aliased by the nearest-2x upsample).  Params identical to the
    unfused conv ('kernel' (3,3,layout_dim+feats_dim,output_dim) +
    'bias')."""

    layout_dim: int
    feats_dim: int
    output_dim: int
    compute_dtype: object = None

    @nn.compact
    def __call__(self, layout_packed, feats):
        cin = self.layout_dim + self.feats_dim
        co = self.output_dim
        kernel = self.param("kernel", kaiming_normal_init(),
                            (3, 3, cin, co))
        bias = self.param("bias", torch_linear_bias_init(cin * 9), (co,))
        dt = self.compute_dtype or layout_packed.dtype
        # Derive in the param dtype (f32, exact sums), cast once after.
        kl = _packed_kernel_distinct(kernel[:, :, :self.layout_dim])
        kf = _packed_kernel_aliased(kernel[:, :, self.layout_dim:])
        x = jnp.concatenate(
            [layout_packed.astype(dt), feats.astype(dt)], axis=-1)
        kp = jnp.concatenate([kl, kf], axis=2).astype(dt)
        out = _packed_conv_apply(x, kp, co)
        return out + jnp.tile(bias.astype(dt), 4)


def packed_instance_norm(x, co, eps: float = 1e-5):
    """Instance norm on a packed (N,R,Rw,4*co) tensor: statistics reduce
    over fine-grid spatial = packed spatial x phases, exactly matching
    :func:`instance_norm_2d` on the interleaved tensor."""
    N, R, Rw, _ = x.shape
    xs = x.reshape(N, R, Rw, 4, co)
    mean = xs.mean(axis=(1, 2, 3), keepdims=True)
    var = ((xs - mean) ** 2).mean(axis=(1, 2, 3), keepdims=True)
    xs = (xs - mean) * jax.lax.rsqrt(var + eps)
    return xs.reshape(N, R, Rw, 4 * co)


def _crn_indices(normalization: str):
    """Torch Sequential indices of the two convs (+norms) inside a
    RefinementModule's net, replicating the None-filtering at
    ``sg2im/crn.py:40-48``."""
    if normalization == "none":
        return {"conv0": 0, "conv1": 2, "norm0": None, "norm1": None}
    return {"conv0": 0, "norm0": 1, "conv1": 3, "norm1": 4}


class RefinementModule(nn.Module):
    """One CRN stage (reference ``sg2im/crn.py:35-65``)."""

    layout_dim: int
    input_dim: int
    output_dim: int
    normalization: str = "instance"
    activation: str = "leakyrelu"
    compute_dtype: object = None  # e.g. jnp.bfloat16 for MXU-speed convs
    conv0_mode: str = "legacy"    # see FusedUpsampleConv.mode
    noise_dim: int = 0            # see FusedUpsampleConv.noise_dim
    quant: bool = False           # int8 turbo tier (see _conv_int8)
    emit_q: bool = False          # emit (int8, scale) for a quantized
    #                               consumer (the resident handoff)

    @nn.compact
    def __call__(self, layout, feats, train: bool = False, noise=None,
                 feats_scale=None):
        """``feats`` arrives at HALF the layout resolution; the nearest-2x
        upsample of the reference (``crn.py:54-58``) is fused into the first
        conv (FusedUpsampleConv).  If ``feats`` already matches the layout
        resolution the module degrades to the plain concat+conv.

        int8 turbo plumbing: ``feats_scale`` marks ``feats`` as int8 from
        the previous quantized stage; with ``emit_q`` the return value is
        ``(int8 feats, scale)`` for the next one."""
        act = parse_activation(self.activation)
        idx = _crn_indices(self.normalization)

        HH = layout.shape[1]
        H = feats.shape[1]
        target = 2 * H if 2 * H <= HH else H
        if HH > target:
            layout = avg_pool_2d(layout, HH // target)
            if noise is not None:
                noise = avg_pool_2d(noise, HH // target)

        x = FusedUpsampleConv(
            self.layout_dim, self.input_dim, self.output_dim,
            compute_dtype=self.compute_dtype, mode=self.conv0_mode,
            noise_dim=self.noise_dim if noise is not None else 0,
            quant=self.quant,
            name=f"layer{idx['conv0']}",
        )(layout, feats, noise=noise, feats_scale=feats_scale)
        for conv_key, norm_key in (("conv0", "norm0"), ("conv1", "norm1")):
            if conv_key != "conv0":
                if self.quant:
                    # x is int8 at s_mid (emitted by the epilogue below).
                    x = QuantConv3x3(
                        self.output_dim, self.output_dim,
                        name=f"layer{idx[conv_key]}",
                    )(x, s_in=s_mid)
                else:
                    x = nn.Conv(
                        self.output_dim,
                        (3, 3),
                        padding=[(1, 1), (1, 1)],
                        kernel_init=kaiming_normal_init(),
                        bias_init=torch_linear_bias_init(
                            self.output_dim * 9),
                        dtype=self.compute_dtype,
                        name=f"layer{idx[conv_key]}",
                    )(x)
            if self.compute_dtype is not None and (
                    train or self.normalization == "instance"):
                # Train-mode BN reduces over the batch: keep stats math in
                # f32 (bf16 accumulation would corrupt running stats).
                # Instance norm is parameterless and computes mean/var
                # per-call even at eval, so it needs the f32 cast in eval
                # mode too (BN at eval upcasts via its f32 running
                # stats/affine params, no explicit cast needed).
                x = x.astype(jnp.float32)
            if self.normalization == "batch":
                x = BatchNorm(self.output_dim, name=f"layer{idx[norm_key]}")(
                    x, train=train
                )
            elif self.normalization == "instance":
                x = instance_norm_2d(x)
            x = apply_activation(act, x)
            if self.quant:
                # int8-RESIDENT epilogues: the norm/act output is written
                # int8 (half the bytes of the bf16 chain) and the next
                # conv consumes it directly — no re-quantization pass
                # anywhere (a per-conv dynamic pass measured as a net
                # LOSS on the HBM-bound stage-5 shape; PERF notes).
                if conv_key == "conv0":
                    s_mid = _act_scale(self, "act_mid", x)
                    x = _quant_act(x, s_mid)
                elif self.emit_q:
                    s_out = _act_scale(self, "act_out", x)
                    return _quant_act(x, s_out), s_out
                elif self.compute_dtype is not None:
                    x = x.astype(self.compute_dtype)
            elif self.compute_dtype is not None:
                # Keep the inter-conv activation chain in compute_dtype —
                # the cast fuses into the norm/act epilogue so every HBM
                # tensor between convs is bf16 (halved traffic).  Measured
                # v5e vg128/b128: 3214 vs 3083 img/s e2e (+4.3%, 64 dB PSNR
                # vs f32); the earlier per-conv f32<->bf16 boundary variant
                # was *slower* than pure f32.  For BN, f32 params upcast
                # the eval norm arithmetic elementwise (matches a pre-cast
                # to f32 bit-for-bit); instance norm gets an explicit f32
                # pre-cast above since it has no params to trigger one.
                x = x.astype(self.compute_dtype)
        return x


class PackedRefinementModule(nn.Module):
    """One CRN stage computed entirely in the packed domain.  Takes the
    stage's layout pre-packed ((N,R,Rw,4*layout_dim)) and the incoming
    feats on the fine grid at the packed resolution ((N,R,Rw,input_dim) —
    i.e. at HALF the stage's output resolution, as in
    :class:`RefinementModule`), and returns the stage output packed
    ((N,R,Rw,4*output_dim)).  Param tree identical to
    :class:`RefinementModule`."""

    layout_dim: int
    input_dim: int
    output_dim: int
    normalization: str = "instance"
    activation: str = "leakyrelu"
    compute_dtype: object = None

    @nn.compact
    def __call__(self, layout_packed, feats, train: bool = False):
        act = parse_activation(self.activation)
        idx = _crn_indices(self.normalization)
        co = self.output_dim
        x = PackedUpsampleConv(
            self.layout_dim, self.input_dim, co,
            compute_dtype=self.compute_dtype,
            name=f"layer{idx['conv0']}",
        )(layout_packed, feats)
        N, R, Rw, _ = x.shape
        for conv_key, norm_key in (("conv0", "norm0"), ("conv1", "norm1")):
            if conv_key != "conv0":
                x = PackedConv3x3(
                    co, co, compute_dtype=self.compute_dtype,
                    name=f"layer{idx[conv_key]}",
                )(x)
            if self.compute_dtype is not None and (
                    train or self.normalization == "instance"):
                # f32 batch stats (and eval-mode parameterless instance
                # stats), as in RefinementModule.
                x = x.astype(jnp.float32)
            if self.normalization == "batch":
                # Phases are fine-grid spatial positions: fold them into
                # a reduction axis so stats match the interleaved tensor.
                xs = x.reshape(N, R, Rw, 4, co)
                xs = BatchNorm(co, name=f"layer{idx[norm_key]}")(
                    xs, train=train)
                x = xs.reshape(N, R, Rw, 4 * co)
            elif self.normalization == "instance":
                x = packed_instance_norm(x, co)
            x = apply_activation(act, x)
            if self.compute_dtype is not None:
                x = x.astype(self.compute_dtype)
        return x


class PackedConv1x1(nn.Module):
    """Packed-domain 1x1 conv (the CRN output head's RGB projection) that
    also performs the final depth-to-space back to the fine grid.  Params
    identical to the ``nn.Conv`` it replaces."""

    input_dim: int
    output_dim: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", kaiming_normal_init(),
                            (1, 1, self.input_dim, self.output_dim))
        bias = self.param("bias", torch_linear_bias_init(self.input_dim),
                          (self.output_dim,))
        N, R, Rw, _ = x.shape
        xs = x.reshape(N, R, Rw, 4, self.input_dim)
        y = jnp.einsum("nrwpc,cd->nrwpd", xs,
                       kernel[0, 0].astype(x.dtype)) + bias.astype(x.dtype)
        return depth_to_space(y.reshape(N, R, Rw, 4 * self.output_dim))


class RefinementNetwork(nn.Module):
    """Full CRN (reference ``sg2im/crn.py:68-111``).

    ``dims[0]`` is the layout channel count; ``dims[1:]`` the per-stage
    output channels.  Output head: conv3x3 + act + conv1x1 -> 3 channels
    (``crn.py:79-86``).
    """

    dims: tuple[int, ...]
    normalization: str = "instance"
    activation: str = "leakyrelu"
    compute_dtype: object = None
    conv0_mode: str = "legacy"  # 'legacy' | 'phase' | 'split' (see
    #                             FusedUpsampleConv)
    #                             | 'packed' (space-to-depth stages)
    packed_min_res: int = 32    # 'packed' applies to stages with output
    #                             resolution >= this (low-res stages have
    #                             high channel counts where the derived
    #                             packed kernels would dominate traffic)
    quant: str | None = None    # 'int8': run the high-res stages' convs on
    #                             the int8 MXU path (turbo serving tier —
    #                             measured accuracy trade, no bit-parity
    #                             contract; see _conv_int8)
    quant_min_res: int = 32     # quantize stages with layout resolution >=
    #                             this; the low-res stages are cheap and
    #                             feed everything downstream, so keeping
    #                             them in compute_dtype buys fidelity for
    #                             ~no throughput
    quant_max_res: int = 1 << 30  # ... and <= this: exempting the LAST
    #                             (highest-res) stage trades its int8 win
    #                             for fidelity (frontier sweep:
    #                             scripts/profile_turbo_frontier.py)
    quant_head: bool = True     # quantize the output head's 3x3 conv when
    #                             the last stage is quantized.  False =
    #                             standard int8 practice (exempt the last
    #                             layer): the head conv feeds the RGB
    #                             projection directly, so its quant noise
    #                             is unsmoothed by any downstream conv

    @nn.compact
    def __call__(self, layout, train: bool = False, noise=None):
        """``noise``: optional separate tensor holding the TRAILING
        ``noise.shape[-1]`` channels of the ``dims[0]``-wide layout block
        (split mode only).  It rides its own pyramid and its own conv0
        kernel slice, so ``concat(layout, noise)`` is never materialized
        at any resolution — exact up to sum reassociation (the split
        mode's existing exactness class).  Parameters are unchanged."""
        act = parse_activation(self.activation)
        layout_dim = self.dims[0]
        if self.quant is not None:
            assert self.quant == "int8", self.quant
            assert self.conv0_mode != "packed", (
                "int8 quant and the packed domain are mutually exclusive")
        noise_dim = 0
        if noise is not None:
            assert self.conv0_mode == "split", (
                "separate noise requires crn 'split' mode")
            noise_dim = noise.shape[-1]
            assert layout.shape[-1] + noise_dim == layout_dim
        N, H, W, _ = layout.shape
        n_mods = len(self.dims) - 1
        h0, w0 = H >> n_mods, W >> n_mods
        assert h0 > 0 and w0 > 0, "Too many refinement modules for image size"

        # Layout pyramid: the reference avg-pools the full-res layout down
        # to each stage's resolution independently (``crn.py:59-62``).
        # Successive factor-2 pooling is mathematically identical (averages
        # of equal-size blocks compose exactly) and reads each level once
        # instead of re-reading the full-res layout per stage — ~4x less
        # HBM traffic for the pooling chain.
        def build_pyramid(t):
            p = [t]
            for _ in range(n_mods - 1):
                p.append(avg_pool_2d(p[-1], 2))
            p = p[::-1]  # lowest resolution first
            if self.compute_dtype is not None:
                # Store each level in compute_dtype: per-stage layout
                # reads are half-width in HBM.  The generator already
                # feeds the layout in compute_dtype (cast pre-concat,
                # models/sg2im.py), making these casts no-ops and the
                # pooling chain itself half-width; an f32 caller still
                # gets levels narrowed here.
                p = [x.astype(self.compute_dtype) for x in p]
            return p

        pyramid = build_pyramid(layout)
        noise_pyramid = (build_pyramid(noise) if noise is not None
                         else [None] * n_mods)

        # The nearest-2x upsample between stages is fused into each module's
        # first conv (FusedUpsampleConv / PackedUpsampleConv) — feats are
        # passed at half the stage's output resolution.  In 'packed' mode
        # the high-res stages run in the space-to-depth domain and feats
        # stay packed between consecutive packed stages' boundaries (one
        # depth-to-space per boundary re-expands them for the aliased
        # upsample branch of the next stage).
        feats = jnp.zeros((N, h0, w0, 1), dtype=layout.dtype)
        packed = False  # does `feats` currently hold a packed tensor?
        # Per-stage int8 flags, computed up front so each stage knows
        # whether its CONSUMER is quantized (emit_q drives the resident
        # int8 handoff — the producing epilogue writes int8 and the next
        # stage's upsample+conv consume it without a requantization pass).
        q_flags = [self.quant == "int8"
                   and self.quant_min_res <= pyramid[i - 1].shape[1]
                   <= self.quant_max_res
                   for i in range(1, len(self.dims))]
        feats_scale = None
        for i in range(1, len(self.dims)):
            input_dim = 1 if i == 1 else self.dims[i - 1]
            level = pyramid[i - 1]
            stage_packed = (self.conv0_mode == "packed"
                            and level.shape[1] >= self.packed_min_res
                            and level.shape[1] % 2 == 0
                            and level.shape[2] % 2 == 0)
            if packed:
                feats = depth_to_space(feats)
                packed = False
            if stage_packed:
                feats = PackedRefinementModule(
                    layout_dim,
                    input_dim,
                    self.dims[i],
                    normalization=self.normalization,
                    activation=self.activation,
                    compute_dtype=self.compute_dtype,
                    name=f"refinement_modules_{i - 1}",
                )(space_to_depth(level), feats, train=train)
                packed = True
            else:
                out = RefinementModule(
                    layout_dim,
                    input_dim,
                    self.dims[i],
                    normalization=self.normalization,
                    activation=self.activation,
                    compute_dtype=self.compute_dtype,
                    conv0_mode=(self.conv0_mode if self.conv0_mode
                                in ("legacy", "phase", "split")
                                else "legacy"),
                    noise_dim=noise_dim,
                    quant=q_flags[i - 1],
                    # Emit int8 when the consumer is quantized: the next
                    # stage, or (for the last stage, iff quant_head) the
                    # output head's 3x3 conv — measured +0.7 ms at b128
                    # (head_resident, scripts/profile_quant_stage.py).
                    emit_q=(q_flags[i - 1]
                            and (q_flags[i] if i < len(q_flags)
                                 else self.quant_head)),
                    name=f"refinement_modules_{i - 1}",
                )(level, feats, train=train, noise=noise_pyramid[i - 1],
                  feats_scale=feats_scale)
                feats, feats_scale = (out if isinstance(out, tuple)
                                      else (out, None))

        if packed:
            x = PackedConv3x3(
                self.dims[-1], self.dims[-1],
                compute_dtype=self.compute_dtype,
                name="output_conv_0",
            )(feats)
            if self.compute_dtype is not None:
                x = x.astype(jnp.float32)
            x = apply_activation(act, x)
            return PackedConv1x1(self.dims[-1], 3, name="output_conv_2")(x)

        if feats_scale is not None:
            # Last stage emitted int8: the head's 3x3 conv rides the
            # resident path too (the final 1x1 RGB projection stays
            # unquantized).
            x = QuantConv3x3(
                self.dims[-1], self.dims[-1], name="output_conv_0",
            )(feats, s_in=feats_scale)
        else:
            x = nn.Conv(
                self.dims[-1], (3, 3), padding=[(1, 1), (1, 1)],
                kernel_init=kaiming_normal_init(),
                bias_init=torch_linear_bias_init(self.dims[-1] * 9),
                dtype=self.compute_dtype,
                name="output_conv_0",
            )(feats)
        if self.compute_dtype is not None:
            x = x.astype(jnp.float32)
        x = apply_activation(act, x)
        x = nn.Conv(
            3, (1, 1), padding="VALID",
            kernel_init=kaiming_normal_init(),
            bias_init=torch_linear_bias_init(self.dims[-1]),
            name="output_conv_2",
        )(x)
        return x
