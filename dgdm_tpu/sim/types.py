"""Scene/state pytrees for the TPU contact engines.

One ``Scene2D``/``Scene3D`` holds everything static about an object x gripper
pair as dense arrays; batching over pairs and poses is plain ``vmap``. This
replaces the reference's file-mediated MjModel-per-worker design
(``sim/sim_2d.py:113-137``) with resident HBM state.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class Scene2D:
    """Static description of one object x 2D-gripper pair."""

    coef_l: jnp.ndarray        # (6, 4) cubic segment coefs, left finger curve
    coef_r: jnp.ndarray        # (6, 4) right finger curve
    contour: jnp.ndarray       # (P, 2) object boundary, body frame, CCW
    com: jnp.ndarray           # (2,) object centroid in body frame
    mass: jnp.ndarray          # () object mass (incl. MuJoCo double-count)
    inertia: jnp.ndarray       # () polar inertia about the COM
    support_pts: jnp.ndarray   # (S, 2) plane-contact support points, body frame
    support_w: jnp.ndarray     # (S,) weights, sum to 1 over the interior
    finger_mass: jnp.ndarray   # (2,) per-jaw mass (left, right) — exact
                               # MuJoCo parity (geom/polygon.py)
    anchor: jnp.ndarray = 1.0  # (P,) per-vertex crack-fan anchor weights of
                               # the oracle's ear-clip object decomposition
                               # (geom/polygon.py:earclip_anchor_weights,
                               # mean 1). Scales the crack-capture stiction
                               # capacity per contact point; scalar 1.0 =
                               # uniform (decomposition-agnostic).


@flax.struct.dataclass
class State2D:
    com: jnp.ndarray           # (2,) object COM, world frame
    theta: jnp.ndarray         # () orientation (continuous, unwrapped)
    vel: jnp.ndarray           # (2,) COM velocity
    om: jnp.ndarray            # () angular velocity
    zb: jnp.ndarray            # () object bottom-face height
    vz: jnp.ndarray            # () vertical velocity
    q: jnp.ndarray             # (2,) finger slide positions (left, right)
    qd: jnp.ndarray            # (2,) finger velocities


@flax.struct.dataclass
class Scene3D:
    """Static description of one object x 3D-gripper pair.

    The finger B-spline surfaces are baked to dense height/slope grids
    (``hgrid``) at scene-build time: contact evaluation is then a bilinear
    lookup instead of per-step basis math."""

    yl: jnp.ndarray            # (7, 3) left finger B-spline ctrl y values
    yr: jnp.ndarray            # (7, 3) right finger ctrl y values
    hgrid: jnp.ndarray         # (2, H, W, 3): [height, dh/dx, dh/dz] per finger
    points: jnp.ndarray        # (P, 3) object surface points, body frame
    com: jnp.ndarray           # (3,) object COM (body frame)
    mass: jnp.ndarray          # ()
    inertia: jnp.ndarray       # (3, 3) inertia tensor about COM, body frame
    inv_inertia: jnp.ndarray   # (3, 3)
    bottom_pts: jnp.ndarray    # (S, 3) base support points for plane contact
    bottom_w: jnp.ndarray      # (S,)
    finger_mass: jnp.ndarray   # ()


@flax.struct.dataclass
class State3D:
    pos: jnp.ndarray           # (3,) COM position, world frame
    quat: jnp.ndarray          # (4,) body->world rotation (w, x, y, z)
    vel: jnp.ndarray           # (3,)
    om: jnp.ndarray            # (3,) angular velocity, world frame
    q: jnp.ndarray             # (2,) finger slide positions
    qd: jnp.ndarray            # (2,)
