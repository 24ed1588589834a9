"""ResNet backbone with frozen batch norm (Flax, NHWC).

TPU-native equivalent of the reference's torchvision ResNet-50 +
FrozenBatchNorm2d feature extractor (backbone.py:21-94): NHWC layout for TPU
conv tiling, frozen BN kept as four buffers so torchvision weights port 1:1
(porting transposes OIHW -> HWIO; see odam_tpu/models/porting.py), stride-32
layer4 features returned for DETR plus optional intermediate layers.

Compute dtype is configurable (bfloat16 on TPU); parameters stay float32.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import jax

Array = jax.Array

RESNET50_STAGES = (3, 4, 6, 3)


class _StemKernel(nn.Module):
    """Owns the stem conv weight at the standard ``conv1/kernel`` tree path
    so both stem execution strategies share one ported checkpoint layout."""

    in_ch: int = 3
    features: int = 64

    @nn.compact
    def __call__(self) -> Array:
        # lecun_normal = nn.Conv's default, so checkpoints and seeded inits
        # are identical to the previous nn.Conv(name="conv1") formulation
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, self.in_ch, self.features))


def _stem_conv(x: Array, kernel: Array, dtype: Any) -> Array:
    """The literal 7x7 stride-2 pad-3 stem conv (torchvision semantics)."""
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _stem_conv_im2col(x: Array, kernel: Array, dtype: Any) -> Array:
    """Stem conv as explicit patch-extraction + one big matmul.

    The literal 7x7/s2 conv over 3 channels measured 4.1% MFU at B=32
    (profile_batched_detector --per_stage): XLA's conv path cannot tile a
    3-deep contraction onto the 128x128 MXU.  Materializing the 7*7*3 = 147
    taps as a [B*OH*OW, 147] matrix turns the stem into a single
    [M, 147] @ [147, 64] matmul — K padded 147->256 lanes, N 64 half-filled,
    but M is huge (B*400*536) so the MXU streams at high duty.  The patch
    tensor is ~2 GB bf16 at B=32 (HBM round-trip ~5 ms at v5e bandwidth) —
    worth it against the 16 ms conv-path stem if XLA doesn't fuse better.
    Same params, same math, same ported checkpoints.
    """
    patches = jax.lax.conv_general_dilated_patches(
        x.astype(dtype), (7, 7), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # conv_general_dilated_patches returns features ordered [C, KH, KW]
    k = kernel.astype(dtype).transpose(2, 0, 1, 3).reshape(-1, kernel.shape[3])
    return patches @ k


def _stem_conv_s2d(x: Array, kernel: Array, dtype: Any) -> Array:
    """Space-to-depth rewrite of the stem conv — mathematically identical.

    A 7x7 stride-2 conv over 3 channels leaves the MXU's 128-lane
    contraction nearly empty (7*7*3 taps spread over a huge spatial grid).
    Folding a 2x2 space-to-depth into the input ([H, W, 3] ->
    [H/2, W/2, 12]) turns it into a 4x4 STRIDE-1 conv over 12 channels on a
    4x smaller grid — the standard TPU stem optimization (MLPerf ResNet
    lineage).  The weight rearrangement below is exact: output pixel p reads
    input rows 2p-3..2p+3; writing u = 2m + r (r in {0,1}) maps tap u to
    s2d-pixel offset m in {-2..1} and phase r, i.e. a 4-tap kernel with
    (left, right) padding (2, 1).  Tap (m, r) = (-2, 0) (u = -4) never
    occurs and stays zero.

    Odd H/W are zero-padded to even before the reshape; those zeros coincide
    with the conv's own zero padding, so results are unchanged.
    """
    H, W, C = x.shape[-3], x.shape[-2], x.shape[-1]
    pad_h, pad_w = H % 2, W % 2
    if pad_h or pad_w:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(0, pad_h), (0, pad_w), (0, 0)])
        H, W = H + pad_h, W + pad_w
    B = x.shape[0]
    # [B, H/2, 2, W/2, 2, C] -> [B, H/2, W/2, (2, 2, C)]
    xs = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(B, H // 2, W // 2, 4 * C)
    # kernel [7, 7, C, O] -> [4, 4, (2, 2, C), O]; k2[m+2, n+2, r, s] = k[2m+r+3, 2n+s+3]
    k2 = jnp.zeros((4, 4, 2, 2) + kernel.shape[2:], kernel.dtype)
    for m in range(-2, 2):
        for r in range(2):
            u = 2 * m + r + 3
            if not 0 <= u <= 6:
                continue
            for n in range(-2, 2):
                for s in range(2):
                    v = 2 * n + s + 3
                    if 0 <= v <= 6:
                        k2 = k2.at[m + 2, n + 2, r, s].set(kernel[u, v])
    k2 = k2.reshape((4, 4, 4 * C) + kernel.shape[3:])
    out = jax.lax.conv_general_dilated(
        xs.astype(dtype), k2.astype(dtype), (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # the conv's own output already matches the strided original; crop the
    # extra column/row introduced when the input needed parity padding only
    # if it produced one (it does not: ceil((H+pad)/2) == floor((H-1)/2)+1).
    return out


class FrozenBatchNorm(nn.Module):
    """Affine-only batch norm with fixed statistics (backbone.py:21-56)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = weight * jax.lax.rsqrt(var + 1e-5)
        shift = bias - mean * scale
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck block with identity/projection shortcut."""

    mid: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out_ch = self.mid * 4
        conv = lambda f, k, s, d, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), padding=[(d * (k // 2),) * 2] * 2,
            kernel_dilation=(d, d), use_bias=False, dtype=self.dtype, name=name,
        )
        identity = x
        y = conv(self.mid, 1, 1, 1, "conv1")(x)
        y = FrozenBatchNorm(self.mid, self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.mid, 3, self.stride, self.dilation, "conv2")(y)
        y = FrozenBatchNorm(self.mid, self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = conv(out_ch, 1, 1, 1, "conv3")(y)
        y = FrozenBatchNorm(out_ch, self.dtype, name="bn3")(y)
        if x.shape[-1] != out_ch or self.stride != 1:
            identity = conv(out_ch, 1, self.stride, 1, "downsample_conv")(x)
            identity = FrozenBatchNorm(out_ch, self.dtype, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """ResNet-D variants with frozen BN; returns requested stage outputs.

    Args (module attrs):
        stage_sizes: blocks per stage (ResNet-50 = (3, 4, 6, 3)).
        return_stages: which stages to return, 1-indexed; the last entry is
            the DETR feature map (stride 32 without dilation).
        dilate_last: replace the last stage's stride with dilation
            (reference's ``dilation`` flag, backbone.py:90-92).
        stem: "conv" = the literal 7x7/s2 conv; "s2d" = the space-to-depth
            rewrite (same math, same params — see ``_stem_conv_s2d``).
    """

    stage_sizes: Sequence[int] = RESNET50_STAGES
    return_stages: Sequence[int] = (4,)
    dilate_last: bool = False
    dtype: Any = jnp.float32
    stem: str = "conv"

    @nn.compact
    def __call__(self, x: Array) -> dict[int, Array]:
        x = x.astype(self.dtype)
        kernel = _StemKernel(in_ch=x.shape[-1], name="conv1")()
        stem_fn = {"conv": _stem_conv, "s2d": _stem_conv_s2d,
                   "im2col": _stem_conv_im2col}[self.stem]
        x = stem_fn(x, kernel, self.dtype)
        x = FrozenBatchNorm(64, self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outputs: dict[int, Array] = {}
        mid = 64
        for stage_idx, n_blocks in enumerate(self.stage_sizes, start=1):
            dilate = self.dilate_last and stage_idx == len(self.stage_sizes)
            for block_idx in range(n_blocks):
                stride = 2 if (block_idx == 0 and stage_idx > 1 and not dilate) else 1
                dilation = 2 if dilate else 1
                x = Bottleneck(
                    mid, stride=stride, dilation=dilation, dtype=self.dtype,
                    name=f"layer{stage_idx}_{block_idx}",
                )(x)
            if stage_idx in self.return_stages:
                outputs[stage_idx] = x
            mid *= 2
        return outputs


def resnet50(dtype: Any = jnp.float32, dilate_last: bool = False,
             return_stages: Sequence[int] = (4,), stem: str = "conv") -> ResNet:
    return ResNet(stage_sizes=RESNET50_STAGES, return_stages=return_stages,
                  dilate_last=dilate_last, dtype=dtype, stem=stem)


class TinyBackbone(nn.Module):
    """Small fully-trainable conv backbone (GroupNorm residual stages).

    The reference's backbone factory accepts any torchvision resnet
    (backbone.py:84-94); this is the rebuild's lightweight member of that
    family — no frozen statistics, so it trains end-to-end on a CPU host.
    Used by the CLI rehearsal's end-to-end detector training (a frozen
    *random* ResNet-50 cannot generalize over held-out layouts — measured
    98% vs 33% recall train/eval) and by fast tests.

    Emits the same ``{stage: NHWC feature}`` dict as :class:`ResNet` with
    matching strides (stage s ⇒ stride 2**s); channels are
    ``width * 2**(s-1)``.
    """

    width: int = 32
    return_stages: Sequence[int] = (4,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> dict[int, Array]:
        x = x.astype(self.dtype)
        x = nn.Conv(self.width, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="gn1")(x)
        x = nn.relu(x)
        outputs: dict[int, Array] = {}
        for stage in range(1, max(self.return_stages) + 1):
            ch = self.width * 2 ** (stage - 1)
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype,
                        name=f"stage{stage}_down")(x)
            x = nn.GroupNorm(num_groups=8, dtype=self.dtype,
                             name=f"stage{stage}_gn1")(x)
            x = nn.relu(x)
            y = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name=f"stage{stage}_conv")(x)
            y = nn.GroupNorm(num_groups=8, dtype=self.dtype,
                             name=f"stage{stage}_gn2")(y)
            x = nn.relu(x + y)
            if stage in self.return_stages:
                outputs[stage] = x
        return outputs
