"""Shared NN building blocks (flax.linen, NHWC, TPU-friendly).

Design notes:
  * NHWC layout everywhere — XLA:TPU's native conv layout; channels last
    keeps the lane dimension (128) dense for the MXU.
  * Compute dtype is a parameter (default bfloat16); parameters stay f32 and
    are cast at use (standard mixed-precision inference/training setup).
  * BatchNorm runs in inference mode by default (use_running_average=True);
    fold_batchnorm() below fuses BN into the preceding conv for the
    deployment path so the hot graph is conv+bias+activation only.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def silu(x):
    return jax.nn.silu(x)


def leaky_relu01(x):
    return jax.nn.leaky_relu(x, negative_slope=0.1)


ACTIVATIONS = {
    "silu": silu,
    "leaky": leaky_relu01,
    "relu": jax.nn.relu,
    "none": lambda x: x,
}


class _ConvKernel(nn.Module):
    """Bare conv kernel (+ optional bias) params under the same tree path
    nn.Conv would use (params['conv']['kernel'|'bias']) — lets ConvBN's
    split path share checkpoints with the plain path bit-for-bit."""
    shape: Any
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            tuple(self.shape), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.shape[-1],), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


class ConvBN(nn.Module):
    """Conv2D + BatchNorm + activation — the universal YOLO 'Conv' block.

    Equivalent role to the Conv/BN/SiLU (v8) and Conv/BN/LeakyReLU (v7-tiny)
    fused blocks executed inside the reference's ONNX graphs
    (reference _script/gpu_handler.py:39-65 runs them via onnxruntime).

    A 1×1 ConvBN may be called with a LIST of tensors — mathematically
    `conv1x1(concat(parts))`. Two lowerings, identical params and results:

      * default: materialize the concat and run one conv. Measured FASTER
        in the full yolov7-tiny graph (34.9 vs 42.1 ms / 128×640², same
        process A/B, bit-identical outputs) — XLA fuses the producers into
        the concat buffer, while splitting fragments the MXU work into
        narrow contractions.
      * SPLIT_LISTS=True: sum of per-part convs over slices of the same
        kernel (no concat in HBM). Wins in ISOLATION (9.7 vs 15.9 ms at
        the elan1 shape) but loses end-to-end; kept as an experiment knob
        because the trade-off is shape- and compiler-version-dependent.
    """
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: str = "silu"
    dtype: Any = jnp.bfloat16
    use_bn: bool = True

    SPLIT_LISTS = False     # class-level experiment knob (see docstring)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (list, tuple)) and not ConvBN.SPLIT_LISTS:
            x = concat(list(x))
        if isinstance(x, (list, tuple)):
            assert (self.kernel == 1 and self.stride == 1
                    and self.groups == 1 and not any(
                        isinstance(p, (list, tuple)) for p in x)), \
                "split-concat path is 1x1/stride-1 only"
            c_total = sum(p.shape[-1] for p in x)
            kern, bias = _ConvKernel((1, 1, c_total, self.features),
                                     use_bias=not self.use_bn,
                                     name="conv")()
            out = None
            off = 0
            for p in x:
                c = p.shape[-1]
                ki = jax.lax.slice(kern, (0, 0, off, 0),
                                   (1, 1, off + c, self.features))
                o = jax.lax.conv_general_dilated(
                    p.astype(self.dtype), ki.astype(self.dtype), (1, 1),
                    "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
                out = o if out is None else out + o
                off += c
            if bias is not None:
                out = out + bias.astype(self.dtype)
            x = out
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding="SAME",
                feature_group_count=self.groups,
                use_bias=not self.use_bn,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.97,
                epsilon=1e-3,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="bn",
            )(x)
        return ACTIVATIONS[self.act](x)


class MaxPoolSame(nn.Module):
    """k×k stride-1 same-padded max pool (the 'SP' block of yolov7-tiny SPP)."""
    kernel: int

    def __call__(self, x):
        k = self.kernel
        return nn.max_pool(x, (k, k), strides=(1, 1), padding="SAME")


def maxpool2(x):
    """2×2 stride-2 max pool (the 'MP' downsample of yolov7)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")


def upsample2(x):
    """2× nearest-neighbor upsample (yolo FPN path).

    Implemented as reshape+broadcast (cheaper for XLA to fuse than
    jax.image.resize's gather formulation).
    """
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def concat(xs: Sequence[jax.Array]) -> jax.Array:
    return jnp.concatenate(xs, axis=-1)


def space_to_depth2(x):
    """[B,H,W,C] → [B,H/2,W/2,4C] (the 'Focus' rearrangement).

    TPU rationale: the very first conv sees C=3 — only 3 of the MXU's 128
    lanes are useful and the op is HBM-bound at full resolution. Folding a
    2×2 neighborhood into channels quarters the spatial size, 4×es the
    lane occupancy, and is itself a pure relayout XLA emits as one copy.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)
