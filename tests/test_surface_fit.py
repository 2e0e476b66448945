"""Contact-surface representation accuracy (3D).

Both 3D contact paths model the hull-decomposition envelope of the finger
(geom/envelope3d.py — what MuJoCo/V-HACD actually contact, per
``sim/sim_3d.py:25-70``): the engine through a ridge-aligned height grid,
the Pallas kernel through per-(x-slab, z-slab) cubic x quadratic
polynomials (sim/surface_fit.py). Millimeters here decide marginal
late-onset grips, so both representations are CI-guarded against the
exact envelope.
"""

import numpy as np
import pytest

from dgdm_tpu.core.config import GRIPPER_3D
from dgdm_tpu.geom.envelope3d import finger_envelope
from dgdm_tpu.geom.fingers import sample_gripper_3d

N_GRIPPERS = 3


def _query_grid():
    g = GRIPPER_3D
    xs = np.linspace(g.ctrl_x_min, g.ctrl_x_max - 1e-6, 181)
    zs = np.linspace(g.ctrl_z_min, g.ctrl_z_max - 1e-6, 49)
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    return gx.ravel(), gz.ravel()


@pytest.mark.parametrize("side,jaw", [("upper", 0), ("lower", 1)])
def test_polyfit_tracks_envelope(side, jaw):
    """Kernel-side piecewise-poly fit: p99 <= 1.5 mm, max <= 2.5 mm
    (measured r3: p99 0.7-1.1 mm, max 1.4-1.8 mm; the pre-z-split fit was
    p99 3.5-4.3 mm and missed marginal grips, e.g. suite case 27)."""
    from dgdm_tpu.sim.surface_fit import eval_fit, fit_surface_batch

    qx, qz = _query_grid()
    ys = np.stack(
        [sample_gripper_3d(i)[jaw].reshape(-1) for i in range(N_GRIPPERS)]
    )
    fitted = fit_surface_batch(ys, sides=[side] * N_GRIPPERS)
    for i in range(N_GRIPPERS):
        ref = finger_envelope(ys[i], qx, qz, side=side)[0]
        err = np.abs(eval_fit(fitted[i], qx, qz) - ref)
        assert np.percentile(err, 99) < 1.5e-3, np.percentile(err, 99)
        assert err.max() < 2.5e-3, err.max()


def test_height_grid_tracks_envelope():
    """Engine-side bilinear height grid: ridge-aligned nodes make the
    dominant (slab-boundary) ridges exact; guard max <= 0.6 mm (measured
    r3: <= 0.3 mm; the old 64x32 grid chopped 1-2 mm off the crests)."""
    from dgdm_tpu.sim import engine3d

    g = GRIPPER_3D
    qx, qz = _query_grid()
    yl, yr = sample_gripper_3d(5)
    grid_l = np.asarray(engine3d.bake_height_grids(yl, yr))[0, ..., 0]
    xs = np.linspace(g.ctrl_x_min, g.ctrl_x_max, engine3d.HGRID_H)
    zs = np.linspace(g.ctrl_z_min, g.ctrl_z_max, engine3d.HGRID_W)
    # reference bilinear interpolation of the baked grid
    ix = np.clip(np.searchsorted(xs, qx) - 1, 0, len(xs) - 2)
    iz = np.clip(np.searchsorted(zs, qz) - 1, 0, len(zs) - 2)
    tx = (qx - xs[ix]) / (xs[1] - xs[0])
    tz = (qz - zs[iz]) / (zs[1] - zs[0])
    val = (
        grid_l[ix, iz] * (1 - tx) * (1 - tz)
        + grid_l[ix + 1, iz] * tx * (1 - tz)
        + grid_l[ix, iz + 1] * (1 - tx) * tz
        + grid_l[ix + 1, iz + 1] * tx * tz
    )
    ref = finger_envelope(yl.reshape(-1), qx, qz, side="upper")[0]
    err = np.abs(val - ref)
    assert err.max() < 0.6e-3, err.max()
