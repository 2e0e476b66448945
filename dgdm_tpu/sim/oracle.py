"""MuJoCo test oracle for the TPU contact engine.

Builds the exact scene the reference builds (same joints, actuators, contact
classes, plane, densities — see reference ``assets/finger_sampler.py:111-177``,
``assets/object_sampler.py:3-29``, ``sim/sim_2d.py:113-182``) but with inline
mesh assets instead of OBJ files and an exact convex decomposition (consecutive
spline-strip slabs for fingers, ear-clip triangle prisms for objects) instead
of the V-HACD binary. Host/CPU only; used by tests and calibration, never by
the TPU path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from dgdm_tpu.core.config import GRIPPER_2D, OBJECT_2D, SIM
from dgdm_tpu.geom.contour import ensure_ccw
from dgdm_tpu.geom.polygon import dedupe_polygon, ear_clip
from dgdm_tpu.geom.spline import cubic_basis_matrix


def _mesh_xml(name: str, verts: np.ndarray, cls: Optional[str] = None) -> str:
    flat = " ".join(f"{v:.8f}" for v in verts.reshape(-1))
    return f'<mesh name="{name}" vertex="{flat}"/>'


def _finger_strip_vertices(
    y_curve: np.ndarray, x_curve: np.ndarray, width: float, height: float
) -> np.ndarray:
    """Full finger solid (matches assets/finger_sampler.py:7-36 vertex set)."""
    n = len(x_curve)
    base = np.stack([x_curve, y_curve, np.zeros(n)], -1)
    return np.concatenate(
        [base, base + [0, width, 0], base + [0, width, height], base + [0, 0, height]]
    )


def _finger_slabs(
    y_curve: np.ndarray, x_curve: np.ndarray, width: float, height: float,
    num_slabs: int,
) -> list:
    """Exact convex decomposition: consecutive curve spans extruded to boxes.
    Stands in for V-HACD (reference sim/sim_2d.py:26-71); with ~4 samples per
    slab the hulls follow the spline to <0.3 mm."""
    n = len(x_curve)
    bounds = np.linspace(0, n - 1, num_slabs + 1).astype(int)
    slabs = []
    for i in range(num_slabs):
        lo, hi = bounds[i], bounds[i + 1] + 1
        xs, ys = x_curve[lo:hi], y_curve[lo:hi]
        base = np.stack([xs, ys, np.zeros(len(xs))], -1)
        verts = np.concatenate(
            [base, base + [0, width, 0], base + [0, width, height], base + [0, 0, height]]
        )
        slabs.append(verts)
    return slabs


def _object_prisms(contour: np.ndarray, height: float,
                   variant: str = "default") -> Tuple[np.ndarray, list]:
    """Ear-clip triangle prisms as the object's convex decomposition.

    ``variant="rolled"`` ear-clips the same polygon from a rolled start
    vertex — a different (equally valid) triangulation of identical
    geometry, used to measure how much of MuJoCo's deterministic signal
    rides on the OBJECT decomposition's crack topology."""
    poly = ensure_ccw(dedupe_polygon(np.asarray(contour, dtype=np.float64)))
    if variant == "rolled":
        n = len(poly)
        r = n // 3
        tris = [tuple((i + r) % n for i in t)
                for t in ear_clip(np.roll(poly, -r, axis=0))]
    else:
        tris = ear_clip(poly)
    full = np.concatenate(
        [
            np.concatenate([poly, np.zeros((len(poly), 1))], -1),
            np.concatenate([poly, np.full((len(poly), 1), height)], -1),
        ]
    )
    prisms = []
    for t in tris:
        p = poly[list(t)]
        # drop degenerate slivers: MuJoCo rejects near-zero-volume meshes
        # (mass impact < 1e-6 relative)
        area = 0.5 * abs(
            (p[1, 0] - p[0, 0]) * (p[2, 1] - p[0, 1])
            - (p[2, 0] - p[0, 0]) * (p[1, 1] - p[0, 1])
        )
        if area < 1e-7:
            continue
        v = np.concatenate(
            [
                np.concatenate([p, np.zeros((3, 1))], -1),
                np.concatenate([p, np.full((3, 1), height)], -1),
            ]
        )
        prisms.append(v)
    return full, prisms


def build_scene_xml_2d(
    yl: np.ndarray,
    yr: np.ndarray,
    contour: np.ndarray,
    num_slabs: int = 50,
    timestep: float = SIM.dt,
    obj_variant: str = "default",
) -> str:
    g = GRIPPER_2D
    x_curve = np.linspace(g.ctrl_x_min, g.ctrl_x_max, g.num_curve_points)
    basis = cubic_basis_matrix(
        g.num_ctrl, g.ctrl_x_min, g.ctrl_x_max, x_curve
    )
    ycl, ycr = basis @ np.asarray(yl), basis @ np.asarray(yr)

    assets, geoms_l, geoms_r, geoms_o = [], [], [], []
    assets.append(
        _mesh_xml("fingerl", _finger_strip_vertices(ycl, x_curve, g.width, g.height))
    )
    assets.append(
        _mesh_xml("fingerr", _finger_strip_vertices(ycr, x_curve, g.width, g.height))
    )
    for i, v in enumerate(_finger_slabs(ycl, x_curve, g.width, g.height, num_slabs)):
        assets.append(_mesh_xml(f"fingerl{i:03d}", v))
        geoms_l.append(f'<geom mesh="fingerl{i:03d}" type="mesh" class="collision"/>')
    for i, v in enumerate(_finger_slabs(ycr, x_curve, g.width, g.height, num_slabs)):
        assets.append(_mesh_xml(f"fingerr{i:03d}", v))
        geoms_r.append(f'<geom mesh="fingerr{i:03d}" type="mesh" class="collision"/>')

    full_obj, prisms = _object_prisms(contour, OBJECT_2D.height, obj_variant)
    assets.append(_mesh_xml("object", full_obj))
    for i, v in enumerate(prisms):
        assets.append(_mesh_xml(f"object{i:03d}", v))
        geoms_o.append(f'<geom mesh="object{i:03d}" type="mesh" class="collision"/>')

    nl = "\n"
    return f"""
<mujoco model="scene">
  <option timestep="{timestep}"/>
  <default>
    <joint type="slide" axis="0 1 0" damping="{g.joint_damping}"/>
    <default class="collision">
      <geom group="3" condim="4" friction="1.0 0.005 0.0001"/>
    </default>
    <default class="visual">
      <geom group="2" contype="0" conaffinity="0"/>
    </default>
  </default>
  <asset>
    {nl.join(assets)}
  </asset>
  <worldbody>
    <body name="object">
      <freejoint name="object_root"/>
      <geom mesh="object" type="mesh" class="visual"/>
      {nl.join(geoms_o)}
    </body>
    <body name="fingers" pos="0 0 0">
      <body name="left_jaw" pos="0 -{g.jaw_offset} 0">
        <joint name="left_grip"/>
        <geom mesh="fingerl" type="mesh" class="visual"/>
        {nl.join(geoms_l)}
      </body>
      <body name="right_jaw" pos="0 {g.jaw_offset} 0">
        <joint name="right_grip"/>
        <geom mesh="fingerr" type="mesh" class="visual"/>
        {nl.join(geoms_r)}
      </body>
    </body>
    <body name="plane" pos="0 0 {SIM.plane_z}">
      <geom type="plane" size="1 1 0.1" rgba="1 1 1 1"/>
    </body>
  </worldbody>
  <actuator>
    <position name="left" joint="left_grip" ctrlrange="0 0.1" kp="{g.kp}"/>
    <position name="right" joint="right_grip" ctrlrange="-0.1 0" kp="{g.kp}"/>
  </actuator>
</mujoco>
"""


class Oracle2D:
    """Run reference-equivalent MuJoCo rollouts for one gripper x object pair."""

    def __init__(self, yl, yr, contour, num_slabs: int = 50,
                 timestep: float = SIM.dt, obj_variant: str = "default"):
        import mujoco

        self._mujoco = mujoco
        self.model = mujoco.MjModel.from_xml_string(
            build_scene_xml_2d(yl, yr, contour, num_slabs, timestep,
                               obj_variant)
        )
        self.data = mujoco.MjData(self.model)
        self._reset_qpos = self.data.qpos.copy()
        self._reset_qvel = self.data.qvel.copy()
        jnames = [self.model.joint(j).name for j in range(self.model.njnt)]
        self._obj_adr = self.model.joint(jnames.index("object_root")).qposadr[0]

    def rollout(
        self, x0: float, y0: float, theta0: float, steps: int = SIM.steps_2d,
        trace: bool = False,
    ):
        """Mirror of the reference datagen inner loop (sim/sim_2d.py:144-171).
        Returns (delta_theta, delta_pos(3,), final_theta) [+ trace]."""
        mujoco, d, adr = self._mujoco, self.data, self._obj_adr
        d.qpos[:] = self._reset_qpos
        d.qvel[:] = self._reset_qvel
        d.qfrc_applied[:] = 0.0
        d.qpos[adr : adr + 3] = [x0, y0, 0.0]
        d.qpos[adr + 3 : adr + 7] = [
            np.cos(theta0 / 2), 0.0, 0.0, np.sin(theta0 / 2),
        ]
        mujoco.mj_forward(self.model, d)
        d.ctrl[0], d.ctrl[1] = SIM.ctrl_2d, -SIM.ctrl_2d
        traj = []
        for _ in range(steps):
            mujoco.mj_step(self.model, d)
            if trace:
                traj.append(d.qpos.copy())
        quat = d.qpos[adr + 3 : adr + 7]
        theta = 2.0 * np.arctan2(quat[3], quat[0])
        final_theta = theta % (2 * np.pi)
        delta = (final_theta - theta0 + np.pi) % (2 * np.pi) - np.pi
        # match the reference wrap to (-pi, pi]
        if delta == -np.pi:
            delta = np.pi
        dpos = d.qpos[adr : adr + 3] - np.array([x0, y0, 0.0])
        out = (float(delta), np.asarray(dpos, dtype=np.float64), float(final_theta))
        return out + ((np.asarray(traj),) if trace else ())

    def body_mass(self, name: str) -> float:
        return float(self.model.body(name).mass[0])
