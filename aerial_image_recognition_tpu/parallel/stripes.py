"""AOI stripe sharding + halo-exchange dedup over the device mesh.

This is the framework's long-context analogue (SURVEY.md §5): the reference
scales AOI size by streaming on one GPU; here a city AOI is split into
per-chip UTM stripes whose borders carry a halo ≥ the dedup radius (so
every car is fully seen by at least one shard). Each shard dedups locally
on-device, then exchanges its fixed-slot kept set with its two ring
neighbors via ``lax.ppermute`` (ICI traffic only) and suppresses local
detections that lose to a higher-confidence neighbor within the radius —
the morally-equivalent slot for ring attention in a detection pipeline.

Tie-break: equal-confidence conflicts resolve to the lower shard index, so
the result is deterministic and agrees with global confidence-greedy NMS
whenever suppression chains don't straddle a stripe border (guaranteed not
to matter when halo ≥ radius and a detection's suppressor is within radius).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aerial_image_recognition_tpu.geo.tmerc import tm_forward, utm_epsg, utm_params
from aerial_image_recognition_tpu.post.dedup import dedup_device


def split_aoi_stripes(bounds, n_shards: int, halo_m: float = 64.0):
    """WGS84 AOI bounds → per-shard WGS84 stripe bounds (vertical stripes in
    the AOI's UTM frame), each widened by halo_m on interior borders.

    Returns (stripes [n,4] WGS84, utm_params, (x0, x1) stripe edges in UTM).
    Each host/shard fetches only its stripe's tiles — mirrors the
    per-server queue sharding idea of the reference's mt0-mt3 round-robin
    (simple_detector.py:176-179) lifted to AOI space.
    """
    from aerial_image_recognition_tpu.geo.tmerc import tm_inverse

    minx, miny, maxx, maxy = bounds
    epsg = utm_epsg((minx + maxx) / 2, (miny + maxy) / 2)
    p = utm_params(epsg % 100, south=epsg >= 32700)
    # full covering UTM extent (meridian convergence — see
    # geo.tmerc.utm_extent; two corners would under-cover)
    from aerial_image_recognition_tpu.geo.tmerc import utm_extent
    ux0, uy0, ux1, uy1 = utm_extent(bounds, p)
    edges = np.linspace(ux0, ux1, n_shards + 1)
    stripes = []
    for i in range(n_shards):
        x0 = edges[i] - (halo_m if i > 0 else 0.0)
        x1 = edges[i + 1] + (halo_m if i < n_shards - 1 else 0.0)
        # stripe rect in WGS84 from all four stripe corners, expanded
        # outward: constant-UTM-x boundaries tilt vs meridians, so taking
        # one corner per edge leaves unfetched slivers between stripes
        sx, sy = tm_inverse(np.array([x0, x0, x1, x1]),
                            np.array([uy0, uy1, uy0, uy1]), p)
        stripes.append((float(np.min(sx)), float(np.min(sy)),
                        float(np.max(sx)), float(np.max(sy))))
    return np.asarray(stripes), p, (edges[:-1], edges[1:])


def assign_to_stripes(x_utm: np.ndarray, edges: Tuple[np.ndarray, np.ndarray],
                      n_shards: int) -> np.ndarray:
    """Owner shard of each detection: by its UTM x against interior edges
    (halo duplicates get the same owner on every shard — dedup handles the
    rest)."""
    lo = np.asarray(edges[0])
    owner = np.clip(np.searchsorted(lo, x_utm, side="right") - 1,
                    0, n_shards - 1)
    return owner.astype(np.int32)


def make_halo_dedup(mesh: Mesh, *, k_slots: int, radius_m: float,
                    axis_name: str = "data"):
    """Build the jitted sharded dedup: inputs [n_shards·K] (x, y, conf) in
    local UTM meters (f32, relative to an AOI anchor), sharded over the
    mesh; −inf conf marks empty slots. Returns (keep_conf, x, y) with
    suppressed slots at −inf, same sharding.
    """
    n_shards = mesh.shape[axis_name]

    def body(x, y, conf):
        # per-shard blocks: [K] own detections
        x, y, conf = x.reshape(-1), y.reshape(-1), conf.reshape(-1)

        # Ring exchange of the FULL raw sets with both neighbors (ICI).
        # Exchanging raw (pre-dedup) sets makes the greedy scan below exact
        # for any suppression chain contained in {left, me, right} — i.e.
        # everything short of a chain spanning three stripes (kilometers).
        # Wrap-around pairs on the non-torus stripe split are geometrically
        # distant, so the distance gate makes their contributions no-ops.
        def shift(v, offset):
            perm = [(i, (i + offset) % n_shards) for i in range(n_shards)]
            return jax.lax.ppermute(v, axis_name, perm)

        cx = jnp.concatenate([x, shift(x, 1), shift(x, -1)])
        cy = jnp.concatenate([y, shift(y, 1), shift(y, -1)])
        cc = jnp.concatenate([conf, shift(conf, 1), shift(conf, -1)])
        # Global slot ids travel with the detections so exact-confidence
        # ties resolve identically on every shard (lowest shard·K+slot id
        # wins); without them each shard's own copy would win its local
        # scan and both duplicates would survive.
        own_id = (jax.lax.axis_index(axis_name).astype(jnp.int32) * k_slots
                  + jnp.arange(k_slots, dtype=jnp.int32))
        cid = jnp.concatenate([own_id, shift(own_id, 1), shift(own_id, -1)])

        # One global-order greedy scan over the combined 3K set; enough
        # rounds to classify every candidate.
        idx, kconf, _ = dedup_device(cx, cy, cc, radius_m, 3 * k_slots,
                                     tie_id=cid)
        picked = jnp.isfinite(kconf) & (kconf > -jnp.inf)
        keep = jnp.zeros((3 * k_slots,), bool).at[idx].max(picked,
                                                           mode="drop")
        own_keep = keep[:k_slots] & jnp.isfinite(conf)
        out_conf = jnp.where(own_keep, conf, -jnp.inf)
        return x, y, out_conf

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P(axis_name)))
    return jax.jit(sharded)


def halo_dedup_host(lon: np.ndarray, lat: np.ndarray, conf: np.ndarray,
                    bounds, mesh: Mesh, *, radius_m: float,
                    k_slots: int = 4096, axis_name: str = "data"):
    """Host wrapper: WGS84 detections → sharded halo dedup → keep mask
    equivalent. Returns (lon, lat, conf) of the kept set (order not
    preserved)."""
    n_shards = mesh.shape[axis_name]
    stripes, p, edges = split_aoi_stripes(bounds, n_shards, halo_m=radius_m)
    x, y = tm_forward(np.asarray(lon, np.float64),
                      np.asarray(lat, np.float64), p)
    anchor = (float(np.min(x)) if len(x) else 0.0,
              float(np.min(y)) if len(y) else 0.0)
    owner = assign_to_stripes(np.asarray(x), edges, n_shards)

    # pack per-shard fixed slots (empty slots parked far away so the
    # distance gate can never couple them to real detections)
    xs = np.full((n_shards, k_slots), 1e9, np.float32)
    ys = np.full((n_shards, k_slots), 1e9, np.float32)
    cs = np.full((n_shards, k_slots), -np.inf, np.float32)
    fill = np.zeros(n_shards, np.int64)
    dropped = 0
    for i in range(len(lon)):
        s = owner[i]
        if fill[s] >= k_slots:
            dropped += 1
            continue
        xs[s, fill[s]] = x[i] - anchor[0]
        ys[s, fill[s]] = y[i] - anchor[1]
        cs[s, fill[s]] = conf[i]
        fill[s] += 1
    if dropped:
        raise ValueError(f"k_slots={k_slots} too small: {dropped} dropped")

    fn = make_halo_dedup(mesh, k_slots=k_slots, radius_m=radius_m,
                         axis_name=axis_name)
    sh = NamedSharding(mesh, P(axis_name))
    kx, ky, kconf = fn(jax.device_put(xs.reshape(-1), sh),
                       jax.device_put(ys.reshape(-1), sh),
                       jax.device_put(cs.reshape(-1), sh))
    kx = np.asarray(kx); ky = np.asarray(ky); kconf = np.asarray(kconf)
    keep = np.isfinite(kconf)
    from aerial_image_recognition_tpu.geo.tmerc import tm_inverse
    klon, klat = tm_inverse(kx[keep].astype(np.float64) + anchor[0],
                            ky[keep].astype(np.float64) + anchor[1], p)
    return klon, klat, kconf[keep]
