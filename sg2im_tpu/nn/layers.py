"""Layer factories: MLP / arch-string CNN / norm+activation registry.

Flax-linen re-design of reference ``sg2im/layers.py``.  Two contracts shape
this module:

1. **Checkpoint-convertibility.** The reference builds ``nn.Sequential``
   stacks whose parameter names are integer indices that shift depending on
   which norm layers exist (``layers.py:210``).  Here every parameterized
   layer is named ``layer{i}`` with *the same index the torch Sequential
   would assign* — the converter (``sg2im_tpu.ckpt.torch_convert``) then maps
   ``net.{i}.weight`` → ``net/layer{i}/kernel`` mechanically.  The index
   bookkeeping is centralized in ``parse_mlp``/``parse_arch``.

2. **TPU idiom.** NHWC layouts, explicit symmetric padding matching torch
   ``Conv2d(padding=P)``, weight layouts HWIO (converter transposes OIHW).

Quirk policy (SURVEY.md §7): the reference ``ResidualBlock`` has an inverted
shortcut-crop condition and computes its body twice (``layers.py:114-117``);
default archs never instantiate it, so we implement the *intended* semantics
(crop when padding=='valid', single body evaluation) and document the
deviation here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Initializers matching torch defaults (for training-from-scratch dynamics).
# ---------------------------------------------------------------------------

def torch_linear_kernel_init():
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_init():
    """torch nn.init.kaiming_normal_: N(0, sqrt(2/fan_in)) — used by the
    reference for GCN linears (``sg2im/graph.py:26-29``) and CRN convs
    (``sg2im/crn.py:49-51,84-85``)."""
    return nn.initializers.variance_scaling(2.0, "fan_in", "normal")


# ---------------------------------------------------------------------------
# Activations / norms.
# ---------------------------------------------------------------------------

def parse_activation(name: str) -> tuple[str, float]:
    """Parse activation strings the way reference ``get_activation`` does
    (``sg2im/layers.py:33-46``) — including its quirk: the function
    unconditionally rewrites every name to 'leakyrelu' (``layers.py:39``),
    so even 'relu' yields LeakyReLU(0.01) in all CNN/CRN paths.  This
    affects pretrained-checkpoint numerics (e.g. the object discriminator's
    nominal 'relu') and is reproduced faithfully.  ``build_mlp`` does its
    own string checks and is NOT affected (see ``MLP.__call__``).
    """
    slope = 0.01
    if name.lower().startswith("leakyrelu") and "-" in name:
        slope = float(name.split("-")[1])
    return ("leakyrelu", slope)


def apply_activation(spec: tuple[str, float], x):
    kind, slope = spec
    if kind is None:
        return x
    if kind == "relu":
        return jax.nn.relu(x)
    return jax.nn.leaky_relu(x, negative_slope=slope)


def instance_norm_2d(x, eps: float = 1e-5):
    """torch-0.4 InstanceNorm2d defaults: affine=False, no running stats
    (reference ``sg2im/layers.py:23-24``).  x: (N, H, W, C)."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = ((x - mean) ** 2).mean(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class _BNCore(nn.Module):
    """Custom BatchNorm matching torch BatchNorm1d/2d semantics exactly:
    eps 1e-5, momentum 0.1 (``running = 0.9*running + 0.1*batch``), biased
    variance for normalization, *unbiased* variance for the running update,
    affine params, running stats in the ``batch_stats`` collection.

    ``mask`` (optional, shape = leading batch axis) weights per-sample
    contributions to the batch statistics.  This is how padded graph batches
    reproduce the reference's ragged-batch statistics: padded mask-net /
    object-crop rows carry weight 0 and never pollute the stats.
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))

        if train:
            axes = tuple(range(x.ndim - 1))
            if mask is None:
                mean = x.mean(axis=axes)
                var = ((x - mean) ** 2).mean(axis=axes)
                n = 1
                for a in axes:
                    n *= x.shape[a]
                n = jnp.asarray(float(n), x.dtype)
            else:
                w = mask.astype(x.dtype).reshape(
                    mask.shape + (1,) * (x.ndim - mask.ndim))
                spatial = 1
                for a in range(mask.ndim, x.ndim - 1):
                    spatial *= x.shape[a]
                n = jnp.maximum(mask.astype(x.dtype).sum() * spatial, 1.0)
                mean = (x * w).sum(axis=axes) / n
                var = (((x - mean) ** 2) * w).sum(axis=axes) / n
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias


class BatchNorm(nn.Module):
    """Wrapper keeping the converter-visible tree path ``<name>/bn/...``."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        return _BNCore(self.features, name="bn")(x, train=train, mask=mask)


def global_avg_pool(x):
    """(N, ..., C) -> (N, C): mean over all non-batch, non-channel axes
    (reference ``sg2im/layers.py:83-86``)."""
    axes = tuple(range(1, x.ndim - 1))
    return x.mean(axis=axes)


# ---------------------------------------------------------------------------
# MLP (reference build_mlp, sg2im/layers.py:216-232).
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MLPSpec:
    kind: str       # 'linear' | 'bn' | 'act' | 'dropout'
    torch_idx: int  # index in the torch nn.Sequential
    din: int = 0
    dout: int = 0


def parse_mlp(dim_list: Sequence[int], activation: str = "relu",
              batch_norm: str = "none", dropout: float = 0.0,
              final_nonlinearity: bool = True) -> list[MLPSpec]:
    """Replicates the layer/index assignment of reference ``build_mlp``."""
    specs: list[MLPSpec] = []
    idx = 0
    for i in range(len(dim_list) - 1):
        din, dout = dim_list[i], dim_list[i + 1]
        specs.append(MLPSpec("linear", idx, din, dout))
        idx += 1
        final_layer = i == len(dim_list) - 2
        if not final_layer or final_nonlinearity:
            if batch_norm == "batch":
                specs.append(MLPSpec("bn", idx, dout, dout))
                idx += 1
            if activation in ("relu", "leakyrelu"):
                specs.append(MLPSpec("act", idx))
                idx += 1
        if dropout > 0:
            specs.append(MLPSpec("dropout", idx))
            idx += 1
    return specs


class MLP(nn.Module):
    """Stack of Dense(+BN, activation, dropout) matching ``build_mlp``.

    Parameters are named ``layer{torch_idx}`` for converter mapping.
    """

    dim_list: tuple[int, ...]
    activation: str = "relu"
    batch_norm: str = "none"
    dropout: float = 0.0
    final_nonlinearity: bool = True
    kernel_init_name: str = "torch_linear"  # or 'kaiming_normal'
    precision: object = None  # None -> HIGHEST (the parity default); a
    #   serving deployment may pass 'high' (3-pass bf16, ~f32-accurate)
    #   to halve Dense time — measured fidelity-safe (see bench.py PSNR
    #   fields / ARCHITECTURE §7) but never the default.

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        # ``mask`` (leading-axes validity) keeps padded graph rows out of
        # train-mode BatchNorm statistics (mlp_normalization='batch').
        # build_mlp checks the activation string directly
        # (``sg2im/layers.py:226-229``): 'relu' is a true ReLU here, unlike
        # the CNN/CRN paths (see parse_activation quirk note).
        if self.activation == "relu":
            act = ("relu", 0.0)
        elif self.activation == "leakyrelu":
            act = ("leakyrelu", 0.01)
        else:
            act = (None, 0.0)  # build_mlp silently skips unknown names
        specs = parse_mlp(self.dim_list, self.activation, self.batch_norm,
                          self.dropout, self.final_nonlinearity)
        for spec in specs:
            if spec.kind == "linear":
                if self.kernel_init_name == "kaiming_normal":
                    kinit = kaiming_normal_init()
                else:
                    kinit = torch_linear_kernel_init()
                # CLAUDE.md hard rule: parity-critical matmuls run at
                # HIGHEST precision (TPU f32 dots multiply in bf16 by
                # default). These MLPs (GCN nets, box/rel heads) are tiny
                # relative to the CRN convs, so this is ~free.
                x = nn.Dense(
                    spec.dout,
                    kernel_init=kinit,
                    bias_init=torch_linear_bias_init(spec.din),
                    precision=self.precision or jax.lax.Precision.HIGHEST,
                    name=f"layer{spec.torch_idx}",
                )(x)
            elif spec.kind == "bn":
                x = BatchNorm(spec.dout, name=f"layer{spec.torch_idx}")(
                    x, train=train, mask=mask
                )
            elif spec.kind == "act":
                x = apply_activation(act, x)
            elif spec.kind == "dropout":
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


# ---------------------------------------------------------------------------
# Arch-string CNN (reference build_cnn, sg2im/layers.py:129-213).
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ArchSpec:
    kind: str        # 'conv'|'norm'|'act'|'pool'|'upsample'|'flatten'|'fc'|'res'
    torch_idx: int
    in_ch: int = 0
    out_ch: int = 0
    kernel: int = 0
    stride: int = 1
    pad: int = 0
    factor: int = 0
    norm_kind: str = "none"   # for 'norm' and 'res'


def _get_padding(K: int, mode: str) -> int:
    if mode == "valid":
        return 0
    assert K % 2 == 1 or mode != "same", f"bad kernel {K} for same padding"
    return (K - 1) // 2


def parse_arch(arch, normalization: str = "batch", activation: str = "relu",
               padding: str = "same", pooling: str = "max"):
    """Parse the reference's CNN arch DSL with identical index assignment.

    DSL (reference ``sg2im/layers.py:129-213``): ``IX`` input channels,
    ``CK-X[-S]`` conv, ``R`` residual, ``UX`` upsample, ``PX`` pool,
    ``FC-X-Y`` flatten+linear.  Norm+activation precede every conv except
    the first; 'none' norms are dropped (shifting torch indices), instance
    norms occupy an index but hold no parameters.

    Returns:
      (specs, out_channels).
    """
    if isinstance(arch, str):
        arch = arch.split(",")
    arch = list(arch)
    cur_c = 3
    if arch and arch[0][0] == "I":
        cur_c = int(arch[0][1:])
        arch = arch[1:]

    specs: list[ArchSpec] = []
    idx = 0
    first_conv = True
    flat = False
    for i, s in enumerate(arch):
        if s[0] == "C":
            if not first_conv:
                if normalization != "none":
                    specs.append(ArchSpec("norm", idx, in_ch=cur_c,
                                          out_ch=cur_c, norm_kind=normalization))
                    idx += 1
                specs.append(ArchSpec("act", idx))
                idx += 1
            first_conv = False
            vals = [int(v) for v in s[1:].split("-")]
            K, next_c = vals[0], vals[1]
            stride = vals[2] if len(vals) == 3 else 1
            P = _get_padding(K, padding)
            specs.append(ArchSpec("conv", idx, in_ch=cur_c, out_ch=next_c,
                                  kernel=K, stride=stride, pad=P))
            idx += 1
            cur_c = next_c
        elif s[0] == "R":
            norm = "none" if first_conv else normalization
            specs.append(ArchSpec("res", idx, in_ch=cur_c, out_ch=cur_c,
                                  kernel=3, pad=_get_padding(3, padding),
                                  norm_kind=norm))
            idx += 1
            first_conv = False
        elif s[0] == "U":
            specs.append(ArchSpec("upsample", idx, factor=int(s[1:])))
            idx += 1
        elif s[0] == "P":
            specs.append(ArchSpec("pool", idx, factor=int(s[1:]),
                                  norm_kind=pooling))
            idx += 1
        elif s[:2] == "FC":
            _, din, dout = s.split("-")
            if not flat:
                specs.append(ArchSpec("flatten", idx))
                idx += 1
            flat = True
            specs.append(ArchSpec("fc", idx, in_ch=int(din), out_ch=int(dout)))
            idx += 1
            if i + 1 < len(arch):
                specs.append(ArchSpec("act", idx))
                idx += 1
            cur_c = int(dout)
        else:
            raise ValueError(f'Invalid layer "{s}"')
    return specs, cur_c


class ResidualBlockBody(nn.Module):
    """[norm-act-conv] x2 with additive shortcut.

    Intended semantics of reference ``ResidualBlock``
    (``sg2im/layers.py:89-117``) with its two bugs fixed: the shortcut crop
    fires when padding *is* 'valid' (P>0 crop of the identity), and the body
    runs once.  Unused by default arch strings.
    """

    channels: int
    normalization: str = "batch"
    activation: str = "relu"
    pad: int = 1
    init: str = "default"

    @nn.compact
    def __call__(self, x, train: bool = False, sample_mask=None):
        act = parse_activation(self.activation)
        kinit = (kaiming_normal_init() if self.init == "kaiming-normal"
                 else torch_linear_kernel_init())
        h = x
        inner_idx = 0
        for _ in range(2):
            if self.normalization == "batch":
                h = BatchNorm(self.channels, name=f"layer{inner_idx}")(
                    h, train=train, mask=sample_mask
                )
                inner_idx += 1
            elif self.normalization == "instance":
                h = instance_norm_2d(h)
                inner_idx += 1
            h = apply_activation(act, h)
            inner_idx += 1
            h = nn.Conv(
                self.channels,
                (3, 3),
                padding=[(self.pad, self.pad)] * 2,
                kernel_init=kinit,
                bias_init=torch_linear_bias_init(self.channels * 9),
                name=f"layer{inner_idx}",
            )(h)
            inner_idx += 1
        shortcut = x
        if self.pad == 0:
            shortcut = x[:, 1:-1, 1:-1, :]
            shortcut = shortcut[:, 1:-1, 1:-1, :]
        return shortcut + h


class ArchCNN(nn.Module):
    """CNN built from the reference arch DSL; layers named ``layer{i}`` by
    torch Sequential index for checkpoint conversion."""

    arch: Any
    normalization: str = "batch"
    activation: str = "relu"
    padding: str = "same"
    pooling: str = "max"
    init: str = "default"

    @nn.compact
    def __call__(self, x, train: bool = False, sample_mask=None):
        act = parse_activation(self.activation)
        specs, _ = parse_arch(self.arch, self.normalization, self.activation,
                              self.padding, self.pooling)
        for spec in specs:
            name = f"layer{spec.torch_idx}"
            if spec.kind == "conv":
                kinit = (kaiming_normal_init() if self.init == "kaiming-normal"
                         else torch_linear_kernel_init())
                fan_in = spec.in_ch * spec.kernel * spec.kernel
                x = nn.Conv(
                    spec.out_ch,
                    (spec.kernel, spec.kernel),
                    strides=(spec.stride, spec.stride),
                    padding=[(spec.pad, spec.pad)] * 2,
                    kernel_init=kinit,
                    bias_init=torch_linear_bias_init(fan_in),
                    name=name,
                )(x)
            elif spec.kind == "norm":
                if spec.norm_kind == "batch":
                    x = BatchNorm(spec.out_ch, name=name)(
                        x, train=train, mask=sample_mask)
                elif spec.norm_kind == "instance":
                    x = instance_norm_2d(x)
                else:
                    raise ValueError(spec.norm_kind)
            elif spec.kind == "act":
                x = apply_activation(act, x)
            elif spec.kind == "pool":
                win = (spec.factor, spec.factor)
                if spec.norm_kind == "max":
                    x = nn.max_pool(x, win, strides=win)
                else:
                    x = nn.avg_pool(x, win, strides=win)
            elif spec.kind == "upsample":
                x = upsample_nearest(x, spec.factor)
            elif spec.kind == "flatten":
                x = x.reshape(x.shape[0], -1)
            elif spec.kind == "fc":
                x = nn.Dense(
                    spec.out_ch,
                    kernel_init=torch_linear_kernel_init(),
                    bias_init=torch_linear_bias_init(spec.in_ch),
                    precision=jax.lax.Precision.HIGHEST,
                    name=name,
                )(x)
            elif spec.kind == "res":
                x = ResidualBlockBody(
                    spec.in_ch, spec.norm_kind, self.activation,
                    pad=spec.pad, init=self.init, name=name,
                )(x, train=train, sample_mask=sample_mask)
        return x

    def out_channels(self) -> int:
        _, c = parse_arch(self.arch, self.normalization, self.activation,
                          self.padding, self.pooling)
        return c


def upsample_nearest(x, factor: int):
    """Nearest-neighbor upsample, NHWC: (N, H, W, C) -> (N, fH, fW, C).

    Broadcast+reshape formulation — bit-identical to ``jnp.repeat`` but
    ~2.5x faster on TPU at the CRN's hot large-spatial/small-channel shapes
    (measured on v5e; repeat lowers to a gather-ish copy, broadcast to a
    pure layout change)."""
    N, H, W, C = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (N, H, factor, W, factor, C))
    return y.reshape(N, H * factor, W * factor, C)


def avg_pool_2d(x, factor: int):
    """Average pool with kernel=stride=factor, NHWC."""
    return nn.avg_pool(x, (factor, factor), strides=(factor, factor))
