"""Environment diagnostic — the reference's check_gpu.py parity slot.

Reports the accelerator the way x_arch/check_gpu.py:73-104 reported CUDA:
platform, devices, HBM, a compile smoke test, native-library and fetch-plane
availability. Exposed as ``python -m aerial_image_recognition_tpu doctor``.
"""

import json
import time
from typing import Dict


def diagnose(compile_check: bool = True) -> Dict:
    out: Dict = {}
    try:
        import jax
        import jax.numpy as jnp
        out["jax_version"] = jax.__version__
        out["backend"] = jax.default_backend()
        out["devices"] = [str(d) for d in jax.devices()]
        out["process_count"] = jax.process_count()
        try:
            stats = jax.devices()[0].memory_stats() or {}
            out["hbm_limit_gb"] = round(stats.get("bytes_limit", 0) / 1e9, 2)
            out["hbm_used_gb"] = round(stats.get("bytes_in_use", 0) / 1e9, 3)
        except Exception as e:
            out["memory_stats_error"] = str(e)[:100]
        if compile_check:
            t0 = time.time()
            x = jnp.ones((256, 256), jnp.bfloat16)
            y = jax.jit(lambda a: (a @ a).sum())(x)
            out["compile_smoke_test"] = {
                "ok": bool(jnp.isfinite(y)),
                "seconds": round(time.time() - t0, 2),
            }
    except Exception as e:
        out["jax_error"] = repr(e)

    from aerial_image_recognition_tpu.utils.native import load
    out["native_fastgeo"] = load() is not None

    try:
        import flax
        import optax  # noqa: F401 — availability probe
        out["flax_version"] = flax.__version__
        out["optax"] = True
    except Exception:
        out["optax"] = False

    try:
        import requests  # noqa: F401
        from PIL import Image  # noqa: F401
        out["fetch_plane"] = True
    except Exception:
        out["fetch_plane"] = False
    return out


def main() -> int:
    print(json.dumps(diagnose(), indent=2))
    return 0
