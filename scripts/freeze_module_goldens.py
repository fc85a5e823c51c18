"""Freeze whole-module reference-semantics golden values (VERDICT r2 #6).

The reference pins real-data golden values for every module
(``/root/reference/tests_basic/test_cbct.py:560``, ``test_picketfence.py:668``,
``test_winstonlutz.py:1525``); its demo datasets are network-gated here, so —
like ``tests/data/profile_regression.npz`` froze reference-computed profile
metrics — this script freezes the *numpy/scipy reference-semantics baselines*
(the independent twins in ``bench.py``, written from the reference sources,
no jax in the compute path) evaluated on the deterministic synthetic
scenarios the reference's own benchmarking docs use
(``/root/reference/docs/source/picketfence.rst:455`` pattern).

Output: ``tests/data/module_goldens.json``, consumed by
``tests/models/test_module_goldens.py`` which runs the PRODUCT batch
pipelines on the identical scenarios and must match within the north-star
parity budget. Regenerate with::

    JAX_PLATFORMS=cpu python scripts/freeze_module_goldens.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def small_configs():
    """The bench scenario configs at golden-fixture scale (the baselines
    only depend on the distinct generated phantoms, not the batch length)."""
    import bench

    pf = bench.PicketFenceConfig()
    pf.n_images = 4
    fa = bench.FieldAnalysisConfig()
    fa.n_images = 4
    star = bench.StarshotConfig()
    star.n_images = 2
    wl = bench.WinstonLutzConfig()          # 8 images fixed by the axes list
    ct = bench.CatPhanConfig()
    ct.n_images = 1
    return {"PicketFence": pf, "FieldAnalysis": fa, "Starshot": star,
            "WinstonLutz": wl, "CatPhan504": ct}


def freeze() -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    cfgs = small_configs()
    golden: dict = {}

    pf = cfgs["PicketFence"]
    pf.setup()
    golden["PicketFence"] = {
        "max_error_mm": [float(pf.run_baseline_one(i)) for i in range(4)],
    }

    fa = cfgs["FieldAnalysis"]
    fa.setup()
    keys = ("v_flat", "v_sym", "v_size", "h_flat", "h_sym", "h_size")
    vals = [fa.run_baseline_one(i) for i in range(4)]
    golden["FieldAnalysis"] = {k: [float(v[k]) for v in vals] for k in keys}

    star = cfgs["Starshot"]
    star.setup()
    centers, wobbles = [], []
    for i in range(2):
        (bx, by), wob_px = star.run_baseline_one(i)
        centers.append([float(bx), float(by)])
        wobbles.append(float(wob_px))
    golden["Starshot"] = {"center_xy": centers, "wobble_px": wobbles}

    wl = cfgs["WinstonLutz"]
    wl.setup()
    fields, bbs = [], []
    for i in range(8):
        # the baseline replicates the reference detection chain exactly
        # (bench.py WinstonLutzConfig.run_baseline_one), so these goldens
        # carry the full 0.01 mm budget
        fy, fx, (bby, bbx) = wl.run_baseline_one(i)
        fields.append([float(fx), float(fy)])
        bbs.append([float(bbx), float(bby)])
    golden["WinstonLutz"] = {"field_xy": fields, "bb_xy": bbs}

    ct = cfgs["CatPhan504"]
    ct.setup()
    origin, hu = ct.run_baseline_one(0)
    golden["CatPhan504"] = {
        "origin_slice": int(origin),
        # baseline sampling order: angles [-87, -116, 120, 60, 0, 180, -60]
        "hu_names": ["Air", "PMP", "Poly", "Acrylic", "Delrin", "LDPE", "Teflon"],
        "hu_values": [float(v) for v in hu],
    }
    return golden


if __name__ == "__main__":
    out = REPO / "tests" / "data" / "module_goldens.json"
    golden = freeze()
    out.write_text(json.dumps(golden, indent=2))
    print(f"wrote {out}")
