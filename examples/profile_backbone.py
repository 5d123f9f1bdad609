"""Per-stage timing of the yolov7-tiny backbone on the TPU chip.

Times cumulative prefixes of the forward (stem, +elan1, ..., full) in one
process, interleaved, so stage cost = difference of adjacent medians.
Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/profile_backbone.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from aerial_image_recognition_tpu.models.layers import ConvBN, maxpool2
from aerial_image_recognition_tpu.models.yolov7 import ELANTiny, SPPCSPCTiny
from aerial_image_recognition_tpu.models.registry import create_model

B, S = 128, 640
REPS, TRIALS = 10, 5

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


class Prefix(nn.Module):
    depth: int          # how many stages to run
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kw = dict(act="leaky", dtype=self.dtype)
        stages = []
        stages.append(lambda v: ConvBN(32, 3, stride=2, name="stem0", **kw)(v))
        stages.append(lambda v: ConvBN(64, 3, stride=2, name="stem1", **kw)(v))
        stages.append(lambda v: ELANTiny(32, 64, name="elan1",
                                         dtype=self.dtype)(v))
        stages.append(lambda v: ELANTiny(64, 128, name="elan2",
                                         dtype=self.dtype)(maxpool2(v)))
        stages.append(lambda v: ELANTiny(128, 256, name="elan3",
                                         dtype=self.dtype)(maxpool2(v)))
        stages.append(lambda v: ELANTiny(256, 512, name="elan4",
                                         dtype=self.dtype)(maxpool2(v)))
        stages.append(lambda v: SPPCSPCTiny(256, name="sppcspc",
                                            dtype=self.dtype)(v))
        for st in stages[: self.depth]:
            x = st(x)
        return x


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, S, S, 3)), jnp.bfloat16)
    names = ["stem0", "stem1", "elan1", "elan2", "elan3", "elan4", "sppcspc"]
    fns, params = [], []
    for d in range(1, len(names) + 1):
        m = Prefix(depth=d)
        v = m.init(jax.random.PRNGKey(0), x[:1])
        p = v["params"]
        st = v.get("batch_stats", {})
        fns.append(jax.jit(lambda pp, ss, im, m=m: m.apply(
            {"params": pp, "batch_stats": ss}, im)))
        params.append((p, st))

    def timed(i):
        f, (p, s) = fns[i], params[i]
        out = f(p, s, x)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = f(p, s, x)
        _ = float(out.astype(jnp.float32).sum())
        return (time.perf_counter() - t0) / REPS * 1e3

    for i in range(len(fns)):       # compile pass
        timed(i)
        print(f"compiled prefix {i + 1}", flush=True)
    med = [[] for _ in fns]
    for t in range(TRIALS):
        for i in range(len(fns)):
            med[i].append(timed(i))
        print(f"trial {t}: " + " ".join(f"{np.median(med[i]):.2f}"
                                        for i in range(len(fns))), flush=True)
    cum = [np.median(m) for m in med]
    prev = 0.0
    for n, c in zip(names, cum):
        print(f"{n:10s} cum {c:7.2f} ms   stage {c - prev:6.2f} ms",
              flush=True)
        prev = c

    # full-model reference point in the same process
    bundle = create_model("yolov7_itcvd", dtype=jnp.bfloat16, seed=0)
    fwd = jax.jit(lambda v, im: bundle.forward(v, im))
    fwd(bundle.params, x)
    ts = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fwd(bundle.params, x)
        _ = float(out[0].astype(jnp.float32).sum())
        ts.append((time.perf_counter() - t0) / REPS * 1e3)
    print(f"full fwd   {np.median(ts):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
