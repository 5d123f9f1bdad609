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

from contextlib import contextmanager
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
    # upstream BatchNorm epsilon: ultralytics v8 uses 1e-3; the yolov7 repo
    # uses nn.BatchNorm2d's default 1e-5 (models/yolov7.py passes it) —
    # imported real weights are mis-scaled ~sqrt((var+1e-3)/(var+1e-5)) on
    # low-variance channels if this doesn't match the training framework.
    bn_eps: float = 1e-3

    SPLIT_LISTS = False     # class-level experiment knob (see docstring)
    # trace-time knob set by folded_convbn(): BN is dropped from the
    # graph and the conv reads folded weights (kernel·γ/√(σ²+ε), bias under
    # the bn/bias param path so the tree structure stays load-compatible)
    FOLDED = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        folded = ConvBN.FOLDED and self.use_bn
        if folded:
            assert not train and not ConvBN.SPLIT_LISTS, \
                "folded BN is an inference-only lowering (concat path)"
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
            # Explicit k//2 padding = torch Conv2d(padding=k//2) ("autopad").
            # For stride 1 this equals SAME; for stride 2 it does NOT —
            # SAME pads (0,1) on even inputs, a one-pixel window shift vs
            # upstream that silently breaks imported-weight parity (caught
            # by tests/test_arch_differential.py, round 3).
            p = self.kernel // 2
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((p, p), (p, p)),
                feature_group_count=self.groups,
                use_bias=not self.use_bn,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        if folded:
            x = _FoldedBias(self.features, name="bn")(x)
        elif self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.97,
                epsilon=self.bn_eps,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="bn",
            )(x)
        return ACTIVATIONS[self.act](x)


class _FoldedBias(nn.Module):
    """Bias-add standing in for a folded BatchNorm (scope name 'bn' keeps
    the param path meaningful: params['...']['bn']['bias'])."""
    features: int

    @nn.compact
    def __call__(self, x):
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return x + b.astype(x.dtype)


def fold_batchnorm(variables, eps: float = 1e-3):
    """Fold inference-mode BatchNorm into conv weights for deployment.

    variables: {'params': ..., 'batch_stats': ...} from a standard ConvBN
    model. Returns {'params': ...} shaped for the FOLDED lowering (run the
    model under `folded_convbn()`): every conv kernel is pre-scaled by
    γ·rsqrt(σ²+ε) along its output channel and the whole affine shift
    β − μ·γ·rsqrt(σ²+ε) lands in params[...]['bn']['bias'], so the hot
    graph is conv + bias + activation only — no BN op. Non-ConvBN leaves
    (detect heads, plain convs) pass through untouched.

    NOTE: under jit the unfolded BN affine cannot be constant-folded by XLA
    (params are runtime inputs), so this is a genuine graph change; whether
    it *wins* depends on how well XLA already fuses the affine into the conv
    epilogue — see BASELINE.md for the measured verdict.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p, s):
        if not isinstance(p, dict):
            return p
        if "conv" in p and "bn" in p and isinstance(p["bn"], dict) \
                and "scale" in p["bn"] and s and "mean" in s.get("bn", {}):
            scale = jnp.asarray(p["bn"]["scale"], jnp.float32)
            beta = jnp.asarray(p["bn"]["bias"], jnp.float32)
            mean = jnp.asarray(s["bn"]["mean"], jnp.float32)
            var = jnp.asarray(s["bn"]["var"], jnp.float32)
            k = jnp.asarray(p["conv"]["kernel"], jnp.float32)
            g = scale * jax.lax.rsqrt(var + eps)
            out = dict(p)
            out["conv"] = {"kernel": k * g}           # HWIO: O is last
            out["bn"] = {"bias": beta - mean * g}
            # recurse into any sibling submodules (e.g. nested blocks)
            for key, val in p.items():
                if key not in ("conv", "bn"):
                    out[key] = walk(val, s.get(key, {}) if isinstance(
                        s, dict) else {})
            return out
        return {key: walk(val, s.get(key, {}) if isinstance(s, dict)
                          else {}) for key, val in p.items()}

    return {"params": walk(params, stats)}


@contextmanager
def folded_convbn():
    """Trace-time context: ConvBN emits the folded (BN-less) lowering.

    jit defers tracing to the first call, so wrap the CALL, not the jit():
        fn = jax.jit(detect)
        with folded_convbn():
            fn(fold_batchnorm(variables), x)   # traces folded
    """
    old = ConvBN.FOLDED
    ConvBN.FOLDED = True
    try:
        yield
    finally:
        ConvBN.FOLDED = old


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
