"""XUnet-256 — building-footprint segmentation head.

Parity slot for the reference's ``ramp_XUnet_256.onnx`` model artifact
(listed in reference .MISSING_LARGE_BLOBS; never invoked by reference code —
SURVEY.md §1 treats it as a second supported model head with the contract
implied by its name: 256×256 input, per-pixel mask output). Standard U-Net
encoder/decoder with skip connections; sigmoid applied by the caller.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from aerial_image_recognition_tpu.models.layers import ConvBN, concat, maxpool2, upsample2


class DoubleConv(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.features, 3, act="relu", name="cv1", dtype=self.dtype)(x, train)
        return ConvBN(self.features, 3, act="relu", name="cv2", dtype=self.dtype)(x, train)


class XUnet(nn.Module):
    """U-Net-256: [B,256,256,3] → [B,256,256,out_channels] mask logits."""
    out_channels: int = 1
    base: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base
        skips = []
        for i, mult in enumerate((1, 2, 4, 8)):
            x = DoubleConv(c * mult, name=f"enc{i}", dtype=self.dtype)(x, train)
            skips.append(x)
            x = maxpool2(x)
        x = DoubleConv(c * 16, name="bottleneck", dtype=self.dtype)(x, train)
        for i, mult in enumerate((8, 4, 2, 1)):
            x = upsample2(x)
            x = ConvBN(c * mult, 1, act="relu", name=f"up{i}", dtype=self.dtype)(x, train)
            x = concat([x, skips[-(i + 1)]])
            x = DoubleConv(c * mult, name=f"dec{i}", dtype=self.dtype)(x, train)
        return nn.Conv(self.out_channels, (1, 1), use_bias=True,
                       dtype=jnp.float32, param_dtype=jnp.float32,
                       name="mask_out")(x.astype(jnp.float32))
