"""Environment diagnostic — the reference's check_gpu.py parity slot.

Reports the accelerator the way x_arch/check_gpu.py:73-104 reported CUDA:
platform, devices, HBM, a compile smoke test, native-library and fetch-plane
availability. Exposed as ``python -m aerial_image_recognition_tpu doctor``.
"""

import json
import time
from typing import Dict


def _devices_with_timeout(jax, timeout_s: float):
    """jax.devices() can HANG (not fail) when a remote TPU backend's
    transport is wedged — observed with the PJRT claim leg never completing
    while the relay port still accepts TCP. A diagnostic that hangs is
    worse than no diagnostic, so probe from a daemon thread and give up
    loudly after timeout_s. (The thread leaks if the claim never returns —
    acceptable in a short-lived doctor process.)"""
    import threading

    box: list = []

    def probe():
        try:
            box.append(jax.devices())
        except Exception as e:        # surfaced as jax_error by the caller
            box.append(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not box:
        raise TimeoutError(
            f"jax.devices() did not return within {timeout_s:.0f}s — the "
            "accelerator backend is likely wedged (remote transport up but "
            "device claim never completes); retry later or check the "
            "tunnel/plugin")
    if isinstance(box[0], Exception):
        raise box[0]
    return box[0]


def diagnose(compile_check: bool = True,
             device_timeout_s: float = 60.0) -> Dict:
    out: Dict = {}
    try:
        import jax
        import jax.numpy as jnp
        out["jax_version"] = jax.__version__
        devices = _devices_with_timeout(jax, device_timeout_s)
        out["backend"] = jax.default_backend()
        out["devices"] = [str(d) for d in devices]
        out["process_count"] = jax.process_count()
        try:
            stats = devices[0].memory_stats() or {}
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
