"""MuJoCo test oracle for the 3D contact engine.

Reference-equivalent 3D scene (``assets/finger_3d.py:110-177``,
``sim/sim_3d.py:108-172``): two B-spline-surface fingers on y-slide joints at
|y| = 0.23 (kp=10, damping 1, ctrl clamped to 0.1), a freejoint object, the
plane at z = -0.01, condim-4 friction. Finger collision = slab hulls along x
of the extruded surface (stands in for V-HACD); the object mesh is used
directly (MuJoCo convexifies it — exact for convex test objects like boxes).
Host/CPU only; tests and calibration.
"""

from __future__ import annotations

import numpy as np

from dgdm_tpu.core.config import GRIPPER_3D, SIM
from dgdm_tpu.geom.spline import bspline_basis, clamped_knot_vector, gripper3d_surface


_HEIGHT_JIT = None


def _height_jit():
    """Module-cached jit of the surface height eval: wrapping jax.jit
    around a bound method PER CALL creates a fresh function identity and
    recompiles every time (~0.3 s x 6 calls per gripper bake — measured as
    the bulk of the 4 s per-gripper host work)."""
    global _HEIGHT_JIT
    if _HEIGHT_JIT is None:
        import jax

        _HEIGHT_JIT = jax.jit(gripper3d_surface().height)
    return _HEIGHT_JIT


def _surface_grid(y_ctrl: np.ndarray, sample_size: int = 25) -> np.ndarray:
    """(S, S, 3) surface points on the geomdl grid (x varies along axis 0)."""
    import jax.numpy as jnp

    g = GRIPPER_3D
    uu = np.linspace(0, 1, sample_size)
    ku = clamped_knot_vector(g.degree_u, g.nu)
    kv = clamped_knot_vector(g.degree_v, g.nv)
    xs = bspline_basis(g.degree_u, ku, g.nu, uu) @ np.linspace(
        g.ctrl_x_min, g.ctrl_x_max, g.nu
    )
    zs = bspline_basis(g.degree_v, kv, g.nv, uu) @ np.linspace(
        g.ctrl_z_min, g.ctrl_z_max, g.nv
    )
    gx = np.repeat(xs, sample_size)
    gz = np.tile(zs, sample_size)
    ys = np.asarray(
        _height_jit()(
            jnp.asarray(np.asarray(y_ctrl).reshape(g.nu, g.nv), jnp.float32),
            jnp.asarray(gx, jnp.float32),
            jnp.asarray(gz, jnp.float32),
        )
    )
    return np.stack([gx, ys, gz], -1).reshape(sample_size, sample_size, 3)


def _finger_slab_meshes(y_ctrl: np.ndarray, num_slabs: int = 12,
                        sample_size: int = 25, num_z: int = 1) -> list:
    """Convex slabs: surface patches (x-strips, optionally z-split) + their
    +width copies. MuJoCo convex-hulls each patch, so the effective contact
    face is the patch's convex envelope.

    num_z matters (measured, round 3): full-z strips (num_z=1) flatten the
    surface's z-concavity, overfilling by 4-5.5 mm mean — far looser than
    the reference's V-HACD (-h 32, assets/finger_3d.py decomposition via
    sim/sim_3d.py:25-70). 12x2 (24 hulls) is ~1.9 mm, 12x3 (36 hulls)
    ~1.0 mm — bracketing V-HACD's 32-hull budget."""
    g = GRIPPER_3D
    grid = _surface_grid(y_ctrl, sample_size)          # (S, S, 3)
    bx = np.linspace(0, sample_size - 1, num_slabs + 1).astype(int)
    bz = np.linspace(0, sample_size - 1, num_z + 1).astype(int)
    slabs = []
    for i in range(num_slabs):
        for j in range(num_z):
            sheet = grid[bx[i]: bx[i + 1] + 1,
                         bz[j]: bz[j + 1] + 1].reshape(-1, 3)
            verts = np.concatenate([sheet, sheet + [0, g.width, 0]])
            slabs.append(verts)
    return slabs


def _mesh_xml(name: str, verts: np.ndarray) -> str:
    flat = " ".join(f"{v:.7f}" for v in verts.reshape(-1))
    return f'<mesh name="{name}" vertex="{flat}"/>'


def build_scene_xml_3d(
    yl: np.ndarray, yr: np.ndarray,
    obj_verts: np.ndarray, obj_faces: np.ndarray,
    num_slabs: int = 12, timestep: float = SIM.dt,
    num_z: int = 1,
) -> str:
    g = GRIPPER_3D
    assets, geoms_l, geoms_r = [], [], []
    for i, v in enumerate(_finger_slab_meshes(yl, num_slabs, num_z=num_z)):
        assets.append(_mesh_xml(f"fingerl{i:03d}", v))
        geoms_l.append(f'<geom mesh="fingerl{i:03d}" type="mesh" class="collision"/>')
    for i, v in enumerate(_finger_slab_meshes(yr, num_slabs, num_z=num_z)):
        assets.append(_mesh_xml(f"fingerr{i:03d}", v))
        geoms_r.append(f'<geom mesh="fingerr{i:03d}" type="mesh" class="collision"/>')
    # visual copies carry the reference's extra mass (visual+collision)
    vis_l = np.concatenate(
        [_surface_grid(yl).reshape(-1, 3),
         _surface_grid(yl).reshape(-1, 3) + [0, g.width, 0]]
    )
    vis_r = np.concatenate(
        [_surface_grid(yr).reshape(-1, 3),
         _surface_grid(yr).reshape(-1, 3) + [0, g.width, 0]]
    )
    assets.append(_mesh_xml("fingerl", vis_l))
    assets.append(_mesh_xml("fingerr", vis_r))
    assets.append(_mesh_xml("object", obj_verts))
    nl = "\n"
    return f"""
<mujoco model="scene3d">
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
      <geom mesh="object" type="mesh" class="collision"/>
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
      <geom type="plane" size="1 1 0.1"/>
    </body>
  </worldbody>
  <actuator>
    <position name="left" joint="left_grip" ctrlrange="0 0.1" kp="{g.kp}"/>
    <position name="right" joint="right_grip" ctrlrange="-0.1 0" kp="{g.kp}"/>
  </actuator>
</mujoco>
"""


class Oracle3D:
    def __init__(self, yl, yr, obj_verts, obj_faces, num_slabs: int = 12,
                 timestep: float = SIM.dt, num_z: int = 1):
        import mujoco

        self._mujoco = mujoco
        self.model = mujoco.MjModel.from_xml_string(
            build_scene_xml_3d(yl, yr, obj_verts, obj_faces, num_slabs,
                               timestep, num_z=num_z)
        )
        self.data = mujoco.MjData(self.model)
        self._reset_qpos = self.data.qpos.copy()
        jnames = [self.model.joint(j).name for j in range(self.model.njnt)]
        self._obj_adr = self.model.joint(jnames.index("object_root")).qposadr[0]

    def rollout(self, x0: float, y0: float, theta0: float,
                steps: int = SIM.steps_3d, trace: bool = False):
        """Returns (delta_theta, delta_pos (3,), final_theta, upright)
        [+ per-step qpos trace]."""
        mujoco, d, adr = self._mujoco, self.data, self._obj_adr
        d.qpos[:] = self._reset_qpos
        d.qvel[:] = 0.0
        d.qfrc_applied[:] = 0.0
        d.qpos[adr : adr + 3] = [x0, y0, 0.0]
        d.qpos[adr + 3 : adr + 7] = [
            np.cos(theta0 / 2), 0, 0, np.sin(theta0 / 2)
        ]
        mujoco.mj_forward(self.model, d)
        d.ctrl[0], d.ctrl[1] = SIM.ctrl_3d, -SIM.ctrl_3d
        traj = []
        for _ in range(steps):
            mujoco.mj_step(self.model, d)
            if trace:
                traj.append(d.qpos.copy())
        quat = d.qpos[adr + 3 : adr + 7]
        theta = (2.0 * np.arctan2(quat[3], quat[0])) % (2 * np.pi)
        delta = (theta - theta0 + np.pi) % (2 * np.pi) - np.pi
        dpos = d.qpos[adr : adr + 3] - [x0, y0, 0.0]
        upright = abs(quat[1]) < SIM.tipover_atol and abs(quat[2]) < SIM.tipover_atol
        out = (float(delta), np.asarray(dpos), float(theta), bool(upright))
        return out + ((np.asarray(traj),) if trace else ())

    def body_mass(self, name: str) -> float:
        return float(self.model.body(name).mass[0])
