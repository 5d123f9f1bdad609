"""Packed-layout XUnet lowering: exact parity with the standard forward.

The s2d cell-conv rewrite (ops/packed_unet.py) must reproduce the standard
XUnet-256 inference bit-for-bit up to dtype rounding — same contract the
quad-stem lowering carries for the detectors (VERDICT r2 item 7: measure,
don't estimate; parity is the precondition for the A/B to mean anything).
"""

import numpy as np
import jax
import jax.numpy as jnp

from aerial_image_recognition_tpu.models.registry import create_model
from aerial_image_recognition_tpu.ops.packed_unet import (
    host_s2d, s2d_conv3x3, s2d_conv3x3_kernel, s2d_unpack,
    xunet_forward_packed)


def test_s2d_conv3x3_matches_full_res_conv(rng):
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 8)).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    kernels = {(a, b): s2d_conv3x3_kernel(w, a, b)
               for a in (0, 1) for b in (0, 1)}
    packed = s2d_conv3x3(jnp.asarray(host_s2d(x)), kernels)
    got = s2d_unpack(packed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_xunet_matches_standard_forward(rng):
    bundle = create_model("xunet_256", dtype=jnp.float32, seed=3)
    xu8 = rng.integers(0, 255, (2, 256, 256, 3), dtype=np.uint8)

    ref = bundle.raw_apply(bundle.params,
                           jnp.asarray(xu8, jnp.float32) / 255.0)
    packed = xunet_forward_packed(bundle.params,
                                  jnp.asarray(host_s2d(xu8)),
                                  dtype=jnp.float32)
    got = s2d_unpack(packed)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=2e-4)
