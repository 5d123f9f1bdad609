"""compact() soundness: suppressed records may only be destroyed when
their whole proximity component is final (arbitrary-length suppression
chains — the fixed-margin counterexample from the round-2 review)."""

import numpy as np

from aerial_image_recognition_tpu.post.results import (
    ResultsManager, _proximity_components)

M2LAT = 1.0 / 111319.9


def _rec(lon, lat, conf):
    return {"lon": lon, "lat": lat, "confidence": conf, "class": "car"}


def test_proximity_components():
    x = np.array([0.0, 1.5, 3.0, 10.0, 11.0])
    y = np.zeros(5)
    comp = _proximity_components(x, y, 2.0)
    assert comp[0] == comp[1] == comp[2]
    assert comp[3] == comp[4]
    assert comp[0] != comp[3]


def test_compact_retains_long_suppression_chains(tmp_path):
    """Chain A>B>C>D>E, links < radius, E far outside the old 3x-radius
    margin from the active region: E is currently suppressed (by D) but a
    future arrival near A can cascade-resurrect D and re-suppress E's
    suppressor etc. — so E must survive compaction."""
    rm = ResultsManager(str(tmp_path), duplicate_distance=2.0)
    lat0 = 52.2
    m2lon = 1.0 / (111319.9 * np.cos(np.radians(lat0)))
    # chain heading AWAY from the active region, 1.8 m spacing,
    # descending confidence: dedup keeps A, C, E? greedy by confidence:
    # A suppresses B; C survives (>2m from A? no — 3.6m from A, yes),
    # C suppresses D; E survives... make spacing/confs so E is SUPPRESSED:
    # confs A>B>C>D>E with 1.8m links: keep A (suppr B), keep C (suppr D),
    # keep E. For E suppressed, use 4 records: A>B>C>D: keep A, suppr B,
    # keep C, suppr D. D is the far suppressed record.
    xs = [0.0, 1.8, 3.6, 5.4]
    confs = [0.9, 0.8, 0.7, 0.6]
    for x, c in zip(xs, confs):
        rm.add([_rec(21.0 + x * m2lon, lat0, c)])
    # active region far PAST the chain head: 20 m beyond A on the other
    # side, so D sits ~25 m (>> 3x radius = 6 m) from the active bbox
    active = (21.0 - 22.0 * m2lon, lat0 - 1.0 * M2LAT,
              21.0 - 20.0 * m2lon, lat0 + 1.0 * M2LAT)
    # chain link from active region to A: records every 1.8 m bridging
    # the gap keep the whole chain in ONE proximity component
    xbridge = np.arange(-20.0 + 1.8, 0.0, 1.8)
    for i, x in enumerate(xbridge):
        rm.add([_rec(21.0 + x * m2lon, lat0, 0.3 + 0.001 * i)])
    n_before = len(rm.detections)
    removed = rm.compact(active_bounds=active)
    # every record connects (via the bridge) to the active region, so
    # NOTHING may be destroyed — including far-away suppressed D
    assert removed == 0, f"destroyed {removed} of {n_before}"

    # control: once the component is cut (no bridge), far suppressed
    # records ARE destroyed (memory stays bounded)
    rm2 = ResultsManager(str(tmp_path), duplicate_distance=2.0)
    for x, c in zip(xs, confs):
        rm2.add([_rec(21.0 + x * m2lon, lat0, c)])
    removed2 = rm2.compact(active_bounds=active)
    assert removed2 == 2          # suppressed B and D, both final now
