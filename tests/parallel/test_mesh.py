"""Sharded batch/CT pipelines over the 8-virtual-device mesh."""

import numpy as np
import pytest

import jax

from pylinac_tpu.parallel import (
    QABatchRunner,
    sharded_batch_metrics,
    sharded_ct_localization,
)
from pylinac_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_sharded_ct_localization_recovers_tilted_axis(mesh):
    """Phantom disk drifting linearly in x across z; the all-gathered fit
    must recover slope and intercept."""
    rng = np.random.default_rng(0)
    z_total, h, w = 16, 128, 128
    vol = np.zeros((z_total, h, w), np.float32)
    yy, xx = np.mgrid[:h, :w]
    for z in range(z_total):
        cx = 60 + 0.5 * z   # drifts right
        cy = 64.0
        vol[z] = (((yy - cy) ** 2 + (xx - cx) ** 2) < 40**2) * 1000.0
    vol += rng.normal(0, 5, vol.shape)
    fits = np.asarray(sharded_ct_localization(vol, mesh))
    # fits: (2, 2) [slope, intercept] for y then x
    assert fits[0, 0] == pytest.approx(0.0, abs=0.05)    # y slope
    assert fits[0, 1] == pytest.approx(64.0, abs=1.5)    # y intercept
    assert fits[1, 0] == pytest.approx(0.5, abs=0.05)    # x slope
    assert fits[1, 1] == pytest.approx(60.0, abs=1.5)    # x intercept


def test_batch_runner_heterogeneous_padding(mesh):
    imgs = np.random.default_rng(1).random((5, 100, 130)).astype(np.float32) * 50
    imgs[:, 30:70, 40:90] += 1000  # field
    runner = QABatchRunner(mesh)
    metrics, mean_width = runner.run(imgs)
    # 5 images padded to 8 (devices) and 128x256 (bucket); results unpadded
    widths = np.asarray(metrics["vertical"].field_width_px)
    assert widths.shape[0] == 5
    # the global psum mean must exclude the 3 zero-padded images
    assert mean_width == pytest.approx(float(widths.mean()), rel=1e-5)
    assert mean_width == pytest.approx(40.0, abs=2)
