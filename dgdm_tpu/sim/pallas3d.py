"""Pallas TPU kernel: fully fused 3D squeeze rollouts.

Same design as ``pallas2d``: each program runs LANE=128 rollouts of one
object x gripper pair for all timesteps with state resident in VMEM —
rollouts in vector lanes, object surface points in sublanes. The finger
B-spline surfaces are pre-fitted to piecewise bicubic-x x quadratic-z
polynomials (``surface_fit.py``), so contact evaluation is a segment
where-chain + bivariate Horner with zero gathers. Physics matches
``engine3d.step`` (same implicit mass-split Jacobi solver; full 6-DOF
quaternion dynamics, plane contact with lever arms, tip-over validity flags).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgdm_tpu.core.config import GRIPPER_3D, SIM
from dgdm_tpu.sim.engine2d import B_CONTACT, IMPEDANCE, K_CONTACT
from dgdm_tpu.sim.engine3d import (B_PLANE3, K_PLANE3, SOLVER_ITERS,
                                    V_REST_THRESH)
from dgdm_tpu.sim.engine2d import DEPTH_EL_CAP, ROUGH_SAT
from dgdm_tpu.sim.surface_fit import (
    DEG_X, DEG_Z, N_SEG, NZ_SEG, TOT_SEG, fit_surface_batch,
)

LANE = 128
# full-solve damped-Newton iterations (matches engine3d.NEWTON_ITERS3).
# Round 3 measured NIT=5 WITHOUT refitting as a bad trade (ratio 0.963 ->
# 0.843); round 5 instead re-ran the held-out calibration search AT each
# reduced count (scripts/search_calib_3d.py --newton_iters N,
# runs/calib/calib3d_search_nit{3,2,1}_p192.json): every refit holds the
# full-suite statistics of the retired NIT=6 fit (corr 0.697-0.709 vs
# 0.705; val 0.760-0.768 vs 0.659) — at this dt the contact calibration
# fully absorbs Newton truncation, so the fastest count ships:
# NIT=1 = 31.6k rollouts/s vs 15.0k at NIT=6 (2.11x). The line-searched
# single step stays stable on impacts (the damped candidate set includes
# u itself). 128 contact points was tried the same way and REJECTED: its
# refit only reaches corr 0.623 / val 0.613 (calib3d_search_nit3_p128);
# task-level insurance for the shipped config: runs/fidelity_task3d.
NEWTON_KERNEL_ITERS3 = 1
# settled-travel fast-path gate: post-solve velocity magnitude below which
# the object counts as statically supported (measured travel-phase residual
# ~2e-6 m/s; drop/grip transients are 5e-2..5e-1 — 3+ decades of separation,
# runs/calib/probe_settle.json)
EPS_SETTLED = 1e-4


def _surface_eval(coef_ref, finger: int, seg, t, s):
    """Piecewise-polynomial surface height + slopes.

    coef_ref block (1, 2, TOT_SEG, 4, 3); seg (flattened
    xseg * NZ_SEG + zseg) / t / s (P, L) -> (y, dy/dx, dy/dz) each (P, L)."""
    # select the 12 coefficients with a where-chain over cells
    c = [[None] * (DEG_Z + 1) for _ in range(DEG_X + 1)]
    for a in range(DEG_X + 1):
        for b in range(DEG_Z + 1):
            acc = jnp.zeros_like(t) + coef_ref[0, finger, 0, a, b]
            for sg in range(1, TOT_SEG):
                acc = jnp.where(seg >= sg, coef_ref[0, finger, sg, a, b], acc)
            c[a][b] = acc
    # bivariate Horner
    rows = []
    drows = []
    for a in range(DEG_X + 1):
        row = c[a][DEG_Z]
        for b in range(DEG_Z - 1, -1, -1):
            row = row * s + c[a][b]
        rows.append(row)
        drow = c[a][DEG_Z] * DEG_Z
        for b in range(DEG_Z - 1, 0, -1):
            drow = drow * s + c[a][b] * b
        drows.append(drow)
    y = rows[DEG_X]
    dy_dx = rows[DEG_X] * DEG_X
    dy_dz = drows[DEG_X]
    for a in range(DEG_X - 1, -1, -1):
        y = y * t + rows[a]
        if a > 0:
            dy_dx = dy_dx * t + rows[a] * a
        dy_dz = dy_dz * t + drows[a]
    return y, dy_dx, dy_dz


def _rollout3d_kernel(
    coef_ref,        # (1, 2, TOT_SEG, 4, 3) fitted surface polys (l, r)
    pts_ref,         # (1, P, 4): body-frame surface points (x, y, z, pad)
    scal_ref,        # (1, 1, 24): mass, fmass_l, com(3), invI upper-tri(6),
                     # fmass_r, mu_plane, mu_finger, k_con, b_con, unload,
                     # rough, pad (see scene_arrays_3d)
    poses_ref,       # (3, LANE)
    qw_ref, qz_ref, dpx_ref, dpy_ref, valid_ref,     # (1, 1, LANE) each
    sqw_ref, sqz_ref, sdx_ref, sdy_ref,              # snapshot outputs
    cfull_ref, ccheap_ref, citer_ref,  # (1, 1, LANE): per-block step-type
    #                                     + full-solve-iteration counters
    *,
    steps: int,
    dt: float,
    regrasp_every: int,
    solver_iters: int,
    ctrl_mag: float,
    snapshot_step: int,
    solver: str = "jacobi",
    newton_iters: int = NEWTON_KERNEL_ITERS3,
    newton_tol: float = 0.0,
):
    g = GRIPPER_3D
    x0f, x1f = g.ctrl_x_min, g.ctrl_x_max
    z0f, z1f = g.ctrl_z_min, g.ctrl_z_max
    hseg = (x1f - x0f) / N_SEG
    hzseg = (z1f - z0f) / NZ_SEG

    mass = scal_ref[0, 0, 0]
    fmass_l = scal_ref[0, 0, 1]
    com_x = scal_ref[0, 0, 2]
    com_y = scal_ref[0, 0, 3]
    com_z = scal_ref[0, 0, 4]
    # body-frame inverse inertia (symmetric): I00 I11 I22 I01 I02 I12
    i00 = scal_ref[0, 0, 5]
    i11 = scal_ref[0, 0, 6]
    i22 = scal_ref[0, 0, 7]
    i01 = scal_ref[0, 0, 8]
    i02 = scal_ref[0, 0, 9]
    i12 = scal_ref[0, 0, 10]
    fmass_r = scal_ref[0, 0, 11]
    mu_plane = scal_ref[0, 0, 12]
    mu_finger = scal_ref[0, 0, 13]
    k_cal = scal_ref[0, 0, 14]
    b_cal = scal_ref[0, 0, 15]
    unload = scal_ref[0, 0, 16]
    rough = scal_ref[0, 0, 17]
    # body inertia upper-tri + compliance scale (Newton solver only)
    ib00 = scal_ref[0, 0, 18]
    ib11 = scal_ref[0, 0, 19]
    ib22 = scal_ref[0, 0, 20]
    ib01 = scal_ref[0, 0, 21]
    ib02 = scal_ref[0, 0, 22]
    ib12 = scal_ref[0, 0, 23]
    c_r = scal_ref[0, 0, 24]
    restitution = scal_ref[0, 0, 27]
    inv_m = 1.0 / mass
    inv_fml, inv_fmr = 1.0 / fmass_l, 1.0 / fmass_r

    pbx = pts_ref[0, :, 0:1] - com_x               # (P, 1)
    pby = pts_ref[0, :, 1:2] - com_y
    pbz = pts_ref[0, :, 2:3] - com_z

    pose_x = poses_ref[0:1, :]
    pose_y = poses_ref[1:2, :]
    theta0 = poses_ref[2:3, :]

    half = theta0 * 0.5
    qw0, qz0 = jnp.cos(half), jnp.sin(half)
    zero = jnp.zeros_like(pose_x)
    # world COM = origin + R(com): for a z-rotation
    c0, s0 = jnp.cos(theta0), jnp.sin(theta0)
    px = pose_x + c0 * com_x - s0 * com_y
    py = pose_y + s0 * com_x + c0 * com_y
    pz = zero + com_z

    state = (
        px, py, pz,
        qw0, zero, zero, qz0,
        zero, zero, zero,            # vel
        zero, zero, zero,            # om (world)
        zero, zero, zero, zero,      # ql, qr, qdl, qdr
        zero - 1e9, zero - 1e9,      # travel cache (invalid until a solve)
        zero + 0.0, zero + 0.0,      # step-type counters: full, cheap solves
        zero + 0.0,                  # full-solve Newton-iteration counter
        px + zero, py + zero, qw0 + zero, qz0 + zero,  # snapshot
    )

    ctrl_l = jnp.float32(min(ctrl_mag, g.ctrl_clamped))
    d_imp = jnp.float32(IMPEDANCE)

    def _normal_step(st):
        (px, py, pz, qw, qx, qy, qz, vx, vy, vz,
         ox, oy, oz, ql, qr, qdl, qdr, wyn, wyx, cnt_f, cnt_c, cnt_i) = st

        # rotation matrix from quaternion (1, L)
        r00 = 1 - 2 * (qy * qy + qz * qz)
        r01 = 2 * (qx * qy - qw * qz)
        r02 = 2 * (qx * qz + qw * qy)
        r10 = 2 * (qx * qy + qw * qz)
        r11 = 1 - 2 * (qx * qx + qz * qz)
        r12 = 2 * (qy * qz - qw * qx)
        r20 = 2 * (qx * qz - qw * qy)
        r21 = 2 * (qy * qz + qw * qx)
        r22 = 1 - 2 * (qx * qx + qy * qy)

        # world inverse inertia W = R Ib^-1 R^T (symmetric, 6 entries)
        a00 = r00 * i00 + r01 * i01 + r02 * i02
        a01 = r00 * i01 + r01 * i11 + r02 * i12
        a02 = r00 * i02 + r01 * i12 + r02 * i22
        a10 = r10 * i00 + r11 * i01 + r12 * i02
        a11_ = r10 * i01 + r11 * i11 + r12 * i12
        a12 = r10 * i02 + r11 * i12 + r12 * i22
        a20 = r20 * i00 + r21 * i01 + r22 * i02
        a21 = r20 * i01 + r21 * i11 + r22 * i12
        a22_ = r20 * i02 + r21 * i12 + r22 * i22
        w00 = a00 * r00 + a01 * r01 + a02 * r02
        w01 = a00 * r10 + a01 * r11 + a02 * r12
        w02 = a00 * r20 + a01 * r21 + a02 * r22
        w11 = a10 * r10 + a11_ * r11 + a12 * r12
        w12 = a10 * r20 + a11_ * r21 + a12 * r22
        w22 = a20 * r20 + a21 * r21 + a22_ * r22

        def wmul(tx, ty, tz):
            return (
                w00 * tx + w01 * ty + w02 * tz,
                w01 * tx + w11 * ty + w12 * tz,
                w02 * tx + w12 * ty + w22 * tz,
            )

        # world lever arms (P, L)
        rx = r00 * pbx + r01 * pby + r02 * pbz
        ry = r10 * pbx + r11 * pby + r12 * pbz
        rz = r20 * pbx + r21 * pby + r22 * pbz
        wx = px + rx
        wy = py + ry
        wz = pz + rz
        # refresh the settled-travel broad-phase cache: the object's wy span
        # as of this (normal) step. Valid for subsequent travel fast-path
        # steps because those freeze the object (see step_body).
        wyn = jnp.min(wy, 0, keepdims=True)
        wyx = jnp.max(wy, 0, keepdims=True)

        def contact_frame(nx, ny, nz):
            # r x n
            cx = ry * nz - rz * ny
            cy = rz * nx - rx * nz
            cz = rx * ny - ry * nx
            wx_, wy_, wz_ = wmul(cx, cy, cz)
            ang = cx * wx_ + cy * wy_ + cz * wz_
            return cx, cy, cz, ang

        def finger_geometry():
            """Finger narrow phase: two B-spline surface evaluations plus
            normals/frames — the dominant (P, L) per-step cost. In the
            Newton path this runs only inside the full-solve branch of the
            lax.cond (broad-phase gated); the drop/travel phase skips it."""
            in_dom = (wx >= x0f) & (wx <= x1f) & (wz >= z0f) & (wz <= z1f)
            xc = jnp.clip(wx, x0f, x1f)
            zc = jnp.clip(wz, z0f, z1f)
            xsg = jnp.clip(
                ((xc - x0f) * (1.0 / hseg)).astype(jnp.int32), 0, N_SEG - 1)
            zsg = jnp.clip(
                ((zc - z0f) * (1.0 / hzseg)).astype(jnp.int32), 0,
                NZ_SEG - 1)
            seg = xsg * NZ_SEG + zsg
            t_loc = xc - (x0f + xsg.astype(jnp.float32) * hseg)
            s_loc = zc - (z0f + zsg.astype(jnp.float32) * hzseg)

            fl, slx, slz = _surface_eval(coef_ref, 0, seg, t_loc, s_loc)
            fr, srx, srz = _surface_eval(coef_ref, 1, seg, t_loc, s_loc)

            surf_l = (-g.jaw_offset + g.width) + ql + fl
            surf_r = g.jaw_offset + qr + fr
            inv_nl = jax.lax.rsqrt(1.0 + slx * slx + slz * slz)
            inv_nr = jax.lax.rsqrt(1.0 + srx * srx + srz * srz)
            depth_l = (surf_l - wy) * inv_nl
            depth_r = (wy - surf_r) * inv_nr
            # a point can never touch BOTH jaws (they stay apart): merge the
            # two finger contact sets into one (plane stays separate — a
            # point CAN touch plane and finger simultaneously)
            is_l = depth_l > depth_r
            depth_f = jnp.where(is_l, depth_l, depth_r)
            nfx = jnp.where(is_l, -slx * inv_nl, srx * inv_nr)
            nfy = jnp.where(is_l, inv_nl, -inv_nr)
            nfz = jnp.where(is_l, -slz * inv_nl, srz * inv_nr)
            act_f = ((depth_f > 0) & in_dom).astype(jnp.float32)

            cf = contact_frame(nfx, nfy, nfz)
            inv_fm_pt = jnp.where(is_l, inv_fml, inv_fmr)
            me_f = 1.0 / (inv_m + cf[3] + nfy * nfy * inv_fm_pt)
            qd_c0 = jnp.where(is_l, qdl, qdr)
            vn_f0 = vpx * nfx + (vpy - qd_c0) * nfy + vpz * nfz
            return (is_l, depth_f, nfx, nfy, nfz, act_f, cf, inv_fm_pt,
                    me_f, vn_f0)

        depth_p = jnp.float32(SIM.plane_z) - wz
        act_p = (depth_p > 0).astype(jnp.float32)
        w_p = act_p / jnp.maximum(jnp.sum(act_p, 0, keepdims=True), 1.0)
        cp = contact_frame(zero, zero, zero + 1.0)
        me_p = 1.0 / (inv_m + cp[3])

        # pre-update point velocities (shared by finger and plane rows)
        vpx = vx + oy * rz - oz * ry
        vpy = vy + oz * rx - ox * rz
        vpz = vz + ox * ry - oy * rx
        vn_p0 = vpz
        kc, bc = jnp.float32(K_CONTACT), jnp.float32(B_CONTACT)
        kp_, bp_ = jnp.float32(K_PLANE3), jnp.float32(B_PLANE3)
        tgt_p = (1.0 - d_imp * bp_ * dt) * vn_p0 + d_imp * dt * kp_ * depth_p

        if solver == "jacobi":
            (is_l, depth_f, nfx, nfy, nfz, act_f, cf, inv_fm_pt,
             me_f, vn_f0) = finger_geometry()
            is_lf = is_l.astype(jnp.float32)
            w_f = act_f / jnp.maximum(jnp.sum(act_f, 0, keepdims=True), 1.0)
            tgt_f = (1.0 - d_imp * bc * dt) * vn_f0 \
                + d_imp * dt * kc * depth_f
            # explicit elastic wedge on finger contacts (engine3d.step), with the
            # global energy clamp on the summed wrench
            depth_el = act_f * jnp.clip(depth_f, 0.0, DEPTH_EL_CAP)
            v_cap = d_imp * dt * k_cal * depth_el
            dv_el = act_f * jnp.clip(
                d_imp * dt * (k_cal * depth_el - b_cal * vn_f0),
                0.0,
                jnp.maximum(v_cap - vn_f0, 0.0),
            )
            imp0 = me_f * dv_el                           # (P, L)
            i0x, i0y, i0z = imp0 * nfx, imp0 * nfy, imp0 * nfz
            dvx_u = jnp.sum(i0x, 0, keepdims=True) * inv_m
            dvy_u = jnp.sum(i0y, 0, keepdims=True) * inv_m
            dvz_u = jnp.sum(i0z, 0, keepdims=True) * inv_m
            tqx_u = jnp.sum(ry * i0z - rz * i0y, 0, keepdims=True)
            tqy_u = jnp.sum(rz * i0x - rx * i0z, 0, keepdims=True)
            tqz_u = jnp.sum(rx * i0y - ry * i0x, 0, keepdims=True)
            dox_u, doy_u, doz_u = wmul(tqx_u, tqy_u, tqz_u)
            dqdl_u = -jnp.sum(is_lf * i0y, 0, keepdims=True) * inv_fml
            dqdr_u = -jnp.sum((1.0 - is_lf) * i0y, 0, keepdims=True) * inv_fmr
            dqd_pt = jnp.where(is_l, dqdl_u, dqdr_u)
            dvn_ind = (
                (dvx_u + doy_u * rz - doz_u * ry) * nfx
                + (dvy_u + doz_u * rx - dox_u * rz - dqd_pt) * nfy
                + (dvz_u + dox_u * ry - doy_u * rx) * nfz
            )
            headroom = jnp.maximum(v_cap - vn_f0, 0.0)
            take_el = (dv_el > 0) & (dvn_ind > 1e-9)
            denom = jnp.where(take_el, dvn_ind, 1.0)
            s_el = jnp.clip(
                jnp.min(jnp.where(take_el, headroom / denom,
                                  jnp.float32(jnp.inf)), 0, keepdims=True),
                0.0, 1.0,
            )
            imp_el = s_el * imp0                          # (P, L)
            grip_ratio = jnp.sum(imp_el, 0, keepdims=True) / (
                dt * mass * jnp.float32(SIM.gravity)
            )
            plane_scale = 1.0 / (1.0 + unload * grip_ratio)
            rough_cap = rough * me_f * jnp.minimum(depth_el, ROUGH_SAT)

            # unconstrained update (elastic wedge applied)
            f_l = g.kp * (ctrl_l - ql) - g.joint_damping * qdl
            f_r = g.kp * (-ctrl_l - qr) - g.joint_damping * qdr
            vx = vx + s_el * dvx_u
            vy = vy + s_el * dvy_u
            vz = vz - dt * jnp.float32(SIM.gravity) + s_el * dvz_u
            ox = ox + s_el * dox_u
            oy = oy + s_el * doy_u
            oz = oz + s_el * doz_u
            qdl = qdl + dt * f_l * inv_fml + s_el * dqdl_u
            qdr = qdr + dt * f_r * inv_fmr + s_el * dqdr_u

            lam = [jnp.zeros_like(depth_f) for _ in range(2)]
            lamt = [[jnp.zeros_like(depth_f) for _ in range(3)] for _ in range(2)]

            sets = (
                (nfx, nfy, nfz, w_f, me_f, tgt_f, 0),
                (zero, zero + 0.0, zero + 1.0, w_p, me_p, tgt_p, 1),
            )

            def solve(j, carry):
                (vx, vy, vz, ox, oy, oz, qdl, qdr,
                 l0, l1,
                 t0x, t0y, t0z, t1x, t1y, t1z) = carry
                lam_n = [l0, l1]
                lam_t = [[t0x, t0y, t0z], [t1x, t1y, t1z]]
                for idx, (nx, ny, nz, w_c, me, tgt, which) in enumerate(sets):
                    vpx = vx + oy * rz - oz * ry
                    vpy = vy + oz * rx - ox * rz
                    vpz = vz + ox * ry - oy * rx
                    if which == 0:
                        vpy = vpy - jnp.where(is_l, qdl, qdr)
                    vn = vpx * nx + vpy * ny + vpz * nz
                    d_n = w_c * me * (tgt - vn)
                    new_n = jnp.maximum(lam_n[idx] + d_n, 0.0)
                    dn = new_n - lam_n[idx]
                    lam_n[idx] = new_n
                    # tangential (vector) with cone clamp
                    vtx = vpx - vn * nx
                    vty = vpy - vn * ny
                    vtz = vpz - vn * nz
                    ctx = lam_t[idx][0] - w_c * me * vtx
                    cty = lam_t[idx][1] - w_c * me * vty
                    ctz = lam_t[idx][2] - w_c * me * vtz
                    if which == 0:
                        cap = mu_finger * (new_n + imp_el) + rough_cap
                    else:
                        cap = mu_plane * plane_scale * new_n
                    nrm = jnp.sqrt(ctx * ctx + cty * cty + ctz * ctz + 1e-20)
                    sc = jnp.minimum(1.0, cap / nrm)
                    ctx, cty, ctz = ctx * sc, cty * sc, ctz * sc
                    dtx = ctx - lam_t[idx][0]
                    dty = cty - lam_t[idx][1]
                    dtz = ctz - lam_t[idx][2]
                    lam_t[idx] = [ctx, cty, ctz]
                    ix = dn * nx + dtx
                    iy = dn * ny + dty
                    iz = dn * nz + dtz
                    vx = vx + jnp.sum(ix, 0, keepdims=True) * inv_m
                    vy = vy + jnp.sum(iy, 0, keepdims=True) * inv_m
                    vz = vz + jnp.sum(iz, 0, keepdims=True) * inv_m
                    tqx = jnp.sum(ry * iz - rz * iy, 0, keepdims=True)
                    tqy = jnp.sum(rz * ix - rx * iz, 0, keepdims=True)
                    tqz = jnp.sum(rx * iy - ry * ix, 0, keepdims=True)
                    dox, doy, doz = wmul(tqx, tqy, tqz)
                    ox, oy, oz = ox + dox, oy + doy, oz + doz
                    if which == 0:
                        qdl = qdl - jnp.sum(is_lf * iy, 0, keepdims=True) * inv_fml
                        qdr = qdr - jnp.sum(
                            (1.0 - is_lf) * iy, 0, keepdims=True
                        ) * inv_fmr
                return (vx, vy, vz, ox, oy, oz, qdl, qdr,
                        lam_n[0], lam_n[1],
                        lam_t[0][0], lam_t[0][1], lam_t[0][2],
                        lam_t[1][0], lam_t[1][1], lam_t[1][2])

            carry = (vx, vy, vz, ox, oy, oz, qdl, qdr,
                     lam[0], lam[1],
                     lamt[0][0], lamt[0][1], lamt[0][2],
                     lamt[1][0], lamt[1][1], lamt[1][2])
            carry = jax.lax.fori_loop(0, solver_iters, solve, carry)
            (vx, vy, vz, ox, oy, oz, qdl, qdr, *_r) = carry
            cnt_f = cnt_f + 1.0
            cnt_i = cnt_i + jnp.float32(solver_iters)
        else:
            # ---- coupled semi-smooth Newton solve (engine3d.step_newton3) --
            # u = (vx, vy, vz, ox, oy, oz, qdl, qdr); 6 damped Newton
            # iterations on the convex soft-constraint energy with an
            # unrolled 8x8 Cholesky per lane and a 2-point line search.
            # world inertia Iw = R Ib R^T (for the mass block / energy)
            ba0 = r00 * ib00 + r01 * ib01 + r02 * ib02
            ba1 = r00 * ib01 + r01 * ib11 + r02 * ib12
            ba2 = r00 * ib02 + r01 * ib12 + r02 * ib22
            bb0 = r10 * ib00 + r11 * ib01 + r12 * ib02
            bb1 = r10 * ib01 + r11 * ib11 + r12 * ib12
            bb2 = r10 * ib02 + r11 * ib12 + r12 * ib22
            bc0 = r20 * ib00 + r21 * ib01 + r22 * ib02
            bc1 = r20 * ib01 + r21 * ib11 + r22 * ib12
            bc2 = r20 * ib02 + r21 * ib12 + r22 * ib22
            iw00 = ba0 * r00 + ba1 * r01 + ba2 * r02
            iw01 = ba0 * r10 + ba1 * r11 + ba2 * r12
            iw02 = ba0 * r20 + ba1 * r21 + ba2 * r22
            iw11 = bb0 * r10 + bb1 * r11 + bb2 * r12
            iw12 = bb0 * r20 + bb1 * r21 + bb2 * r22
            iw22 = bc0 * r20 + bc1 * r21 + bc2 * r22

            def iwmul(tx, ty, tz):
                return (
                    iw00 * tx + iw01 * ty + iw02 * tz,
                    iw01 * tx + iw11 * ty + iw12 * tz,
                    iw02 * tx + iw12 * ty + iw22 * tz,
                )

            tgt_pn = tgt_p
            w_np = act_p * me_p / c_r
            mg_dt = mass * jnp.float32(SIM.gravity) * dt
            # plane lever cross r x ez = (ry, -rx, 0)
            jp = (zero + 0.0, zero + 0.0, zero + 1.0, ry, -rx, zero + 0.0,
                  zero + 0.0, zero + 0.0)

            f_l = g.kp * (ctrl_l - ql) - g.joint_damping * qdl
            f_r = g.kp * (-ctrl_l - qr) - g.joint_damping * qdr
            u_unc = [vx, vy, vz - dt * jnp.float32(SIM.gravity), ox, oy, oz,
                     qdl + dt * f_l * inv_fml, qdr + dt * f_r * inv_fmr]

            def e_quad(u_):
                dvx_, dvy_, dvz_ = (u_[0] - u_unc[0], u_[1] - u_unc[1],
                                    u_[2] - u_unc[2])
                dox_, doy_, doz_ = (u_[3] - u_unc[3], u_[4] - u_unc[4],
                                    u_[5] - u_unc[5])
                ix_, iy_, iz_ = iwmul(dox_, doy_, doz_)
                return 0.5 * (
                    mass * (dvx_**2 + dvy_**2 + dvz_**2)
                    + dox_ * ix_ + doy_ * iy_ + doz_ * iz_
                    + fmass_l * (u_[6] - u_unc[6]) ** 2
                    + fmass_r * (u_[7] - u_unc[7]) ** 2
                )

            def hub_sum(vn_, vt2_, w_, cap_, tgt_):
                res = jnp.maximum(tgt_ - vn_, 0.0)
                e_n = 0.5 * w_ * res * res
                vt_ = jnp.sqrt(vt2_ + 1e-16)
                q_br = 0.5 * w_ * vt2_
                lin = cap_ * vt_ - 0.5 * cap_ * cap_ / jnp.maximum(w_, 1e-12)
                e_t = jnp.where(w_ * vt_ <= cap_, q_br, lin)
                return jnp.sum(e_n + e_t, 0, keepdims=True)

            def _full_solve(u0_t):
                # finger narrow phase computed HERE so the cheap branch never
                # pays for the two surface evaluations (broad-phase gated
                # lax.cond below)
                (is_l, depth_f, nfx, nfy, nfz, act_f, cf, inv_fm_pt,
                 me_f, vn_f0) = finger_geometry()
                is_lf = is_l.astype(jnp.float32)
                # Newton-specific targets use the CALIBRATED finger gains;
                # restitution adds an outgoing-velocity bonus on closing
                # contacts (ballistic clamp snaps, engine3d.step_newton3)
                tgt_fn = (1.0 - d_imp * b_cal * dt) * vn_f0 \
                    + d_imp * dt * k_cal * depth_f \
                    + restitution * jnp.maximum(
                        -vn_f0 - jnp.float32(V_REST_THRESH), 0.0)
                w_nf = act_f * me_f / c_r
                depth_eln = act_f * jnp.clip(depth_f, 0.0, DEPTH_EL_CAP)
                # depth-proportional crack-capture capacity (engine2d notes)
                rough_capn = rough * me_f * depth_eln
                # finger lever cross r x n
                cfx, cfy, cfz = cf[0], cf[1], cf[2]
                sl = is_lf
                sr = 1.0 - is_lf
                # finger normal-row Jacobian (8-vec per point)
                jf = (nfx, nfy, nfz, cfx, cfy, cfz, -nfy * sl, -nfy * sr)

                def vrel_of(u_):
                    vpx = u_[0] + u_[4] * rz - u_[5] * ry
                    vpy = u_[1] + u_[5] * rx - u_[3] * rz
                    vpz = u_[2] + u_[3] * ry - u_[4] * rx
                    qd_pt = u_[6] * sl + u_[7] * sr
                    return vpx, vpy - qd_pt, vpz, vpy

                def energy(u_, capf_, capp_):
                    fx_, fy_, fz_, pvy_ = vrel_of(u_)
                    vnf_ = fx_ * nfx + fy_ * nfy + fz_ * nfz
                    vtf2 = ((fx_ - vnf_ * nfx) ** 2 + (fy_ - vnf_ * nfy) ** 2
                            + (fz_ - vnf_ * nfz) ** 2)
                    vnp_ = fz_
                    vtp2 = fx_ * fx_ + pvy_ * pvy_
                    return (e_quad(u_)
                            + hub_sum(vnf_, vtf2, w_nf, capf_, tgt_fn)
                            + hub_sum(vnp_, vtp2, w_np, capp_, tgt_pn))

                u = list(u0_t)
                # NIT=5 measured (round 3): +11% rollouts/s (9.0k -> 10.0k
                # on the dev chip) but suite magnitude ratio 0.963 -> 0.843
                # — a bad trade; 6 stays the default
                # (NEWTON_KERNEL_ITERS3), plumbed static for sweeps.
                def newton_body(u):
                    fx_, fy_, fz_, pvy_ = vrel_of(u)
                    vnf = fx_ * nfx + fy_ * nfy + fz_ * nfz
                    vtfx = fx_ - vnf * nfx
                    vtfy = fy_ - vnf * nfy
                    vtfz = fz_ - vnf * nfz
                    resf = jnp.maximum(tgt_fn - vnf, 0.0)
                    lamf = w_nf * resf
                    vnp = fz_
                    vtpx, vtpy = fx_, pvy_
                    resp = jnp.maximum(tgt_pn - vnp, 0.0)
                    lamp = w_np * resp
                    grip = jnp.sum(lamf, 0, keepdims=True) / mg_dt
                    scale_p = 1.0 / (1.0 + unload * grip)
                    capf = mu_finger * lamf + rough_capn
                    capp = mu_plane * scale_p * lamp
                    vtfn = jnp.sqrt(vtfx**2 + vtfy**2 + vtfz**2 + 1e-16)
                    vtpn = jnp.sqrt(vtpx**2 + vtpy**2 + 1e-16)
                    fac_f = jnp.minimum(w_nf, capf / vtfn)
                    fac_p = jnp.minimum(w_np, capp / vtpn)

                    # gradient (8,) of the energy at u
                    def rsum(x):
                        return jnp.sum(x, 0, keepdims=True)

                    ix_, iy_, iz_ = iwmul(u[3] - u_unc[3], u[4] - u_unc[4],
                                          u[5] - u_unc[5])
                    g0 = mass * (u[0] - u_unc[0]) - rsum(lamf * nfx) \
                        + rsum(fac_f * vtfx + fac_p * vtpx)
                    g1 = mass * (u[1] - u_unc[1]) - rsum(lamf * nfy) \
                        + rsum(fac_f * vtfy + fac_p * vtpy)
                    g2 = mass * (u[2] - u_unc[2]) - rsum(lamf * nfz + lamp) \
                        + rsum(fac_f * vtfz)
                    g3 = ix_ - rsum(lamf * cfx + lamp * ry) \
                        + rsum(fac_f * (ry * vtfz - rz * vtfy)
                               + fac_p * (-rz * vtpy))
                    g4 = iy_ - rsum(lamf * cfy - lamp * rx) \
                        + rsum(fac_f * (rz * vtfx - rx * vtfz)
                               + fac_p * (rz * vtpx))
                    g5 = iz_ - rsum(lamf * cfz) \
                        + rsum(fac_f * (rx * vtfy - ry * vtfx)
                               + fac_p * (rx * vtpy - ry * vtpx))
                    g6 = fmass_l * (u[6] - u_unc[6]) \
                        + rsum(sl * (lamf * nfy - fac_f * vtfy))
                    g7 = fmass_r * (u[7] - u_unc[7]) \
                        + rsum(sr * (lamf * nfy - fac_f * vtfy))
                    grad = [g0, g1, g2, g3, g4, g5, g6, g7]

                    # Hessian: M + on.J(x)J + fac.(G^T G - Jn(x)Jn)
                    onf = w_nf * (resf > 0.0)
                    onp = w_np * (resp > 0.0)
                    h = [[None] * 8 for _ in range(8)]

                    def hset(a, b, v):
                        h[a][b] = v

                    # normal outer products minus tangential-GN correction.
                    # Zero structure exploited (round 5): jp =
                    # (0,0,1,ry,-rx,0,0,0) so the plane term survives in only
                    # 6 of 36 entries; jf[6]*jf[7] = nfy^2*sl*sr = 0 exactly
                    # (complementary masks); and cn_f*jf[a] is hoisted out of
                    # the b loop — cuts the (P,L) assembly mults ~2.6x at
                    # identical math modulo float reassociation.
                    cn_f = onf - fac_f
                    cn_p = onp - fac_p
                    yf = [cn_f * jf[a] for a in range(8)]
                    for a in range(8):
                        for b_ in range(a, 8):
                            if (a, b_) == (6, 7):
                                hset(a, b_, 0.0)
                            else:
                                hset(a, b_, rsum(yf[a] * jf[b_]))
                    yp_n = cn_p * ry
                    h[2][2] += rsum(cn_p)
                    h[2][3] += rsum(yp_n)
                    h[2][4] += rsum(-cn_p * rx)
                    h[3][3] += rsum(yp_n * ry)
                    h[3][4] += rsum(-yp_n * rx)
                    h[4][4] += rsum(cn_p * rx * rx)
                    # tangential GN full-velocity blocks (shared by both rows)
                    facs = fac_f + fac_p
                    h[0][0] += rsum(facs)
                    h[1][1] += rsum(facs)
                    h[2][2] += rsum(facs)
                    h[0][4] += rsum(facs * rz)
                    h[0][5] += rsum(facs * (-ry))
                    h[1][3] += rsum(facs * (-rz))
                    h[1][5] += rsum(facs * rx)
                    h[2][3] += rsum(facs * ry)
                    h[2][4] += rsum(facs * (-rx))
                    h[3][3] += rsum(facs * (ry * ry + rz * rz))
                    h[4][4] += rsum(facs * (rx * rx + rz * rz))
                    h[5][5] += rsum(facs * (rx * rx + ry * ry))
                    h[3][4] += rsum(facs * (-rx * ry))
                    h[3][5] += rsum(facs * (-rx * rz))
                    h[4][5] += rsum(facs * (-ry * rz))
                    # finger-column blocks (finger rows only)
                    h[1][6] += rsum(fac_f * (-sl))
                    h[1][7] += rsum(fac_f * (-sr))
                    h[3][6] += rsum(fac_f * sl * rz)
                    h[5][6] += rsum(fac_f * sl * (-rx))
                    h[3][7] += rsum(fac_f * sr * rz)
                    h[5][7] += rsum(fac_f * sr * (-rx))
                    h[6][6] += rsum(fac_f * sl)
                    h[7][7] += rsum(fac_f * sr)
                    # mass block
                    h[0][0] += mass
                    h[1][1] += mass
                    h[2][2] += mass
                    h[3][3] += iw00
                    h[4][4] += iw11
                    h[5][5] += iw22
                    h[3][4] += iw01
                    h[3][5] += iw02
                    h[4][5] += iw12
                    h[6][6] += fmass_l
                    h[7][7] += fmass_r

                    # unrolled Cholesky H = L L^T (lower L over upper-tri h)
                    L = [[None] * 8 for _ in range(8)]
                    Ld = [None] * 8
                    for a in range(8):
                        s_ = h[a][a]
                        for k in range(a):
                            s_ = s_ - L[a][k] * L[a][k]
                        dinv = jax.lax.rsqrt(jnp.maximum(s_, 1e-12))
                        Ld[a] = dinv
                        L[a][a] = 1.0 / dinv
                        for b_ in range(a + 1, 8):
                            s2 = h[a][b_]
                            for k in range(a):
                                s2 = s2 - L[b_][k] * L[a][k]
                            L[b_][a] = s2 * dinv
                    # solve L y = -grad; L^T d = y
                    yv = [None] * 8
                    for a in range(8):
                        s_ = -grad[a]
                        for k in range(a):
                            s_ = s_ - L[a][k] * yv[k]
                        yv[a] = s_ * Ld[a]
                    dv = [None] * 8
                    for a in range(7, -1, -1):
                        s_ = yv[a]
                        for k in range(a + 1, 8):
                            s_ = s_ - L[k][a] * dv[k]
                        dv[a] = s_ * Ld[a]

                    u1 = [u[a] + dv[a] for a in range(8)]
                    u2 = [u[a] + 0.5 * dv[a] for a in range(8)]
                    e0 = energy(u, capf, capp)
                    e1 = energy(u1, capf, capp)
                    e2 = energy(u2, capf, capp)
                    best12 = e1 <= e2
                    eb = jnp.where(best12, e1, e2)
                    take_new = eb <= e0
                    u_new = [jnp.where(take_new,
                                       jnp.where(best12, u1[a], u2[a]), u[a])
                             for a in range(8)]
                    # sup-norm of the ACCEPTED update over DOFs and lanes:
                    # zero when the line search rejects (further iterations
                    # would then be exact no-ops — same caps, same u)
                    alpha = jnp.where(take_new,
                                      jnp.where(best12, 1.0, 0.5), 0.0)
                    mx = jnp.float32(0.0)
                    for a in range(8):
                        mx = jnp.maximum(mx, jnp.max(jnp.abs(dv[a])))
                    mx = mx * jnp.max(alpha)
                    return u_new, mx

                if newton_tol > 0.0:
                    # adaptive damped Newton (round 5): iterate to the
                    # measured convergence tolerance instead of a fixed
                    # count — steady-hold steps exit in 1-2 iterations,
                    # impact steps get up to newton_iters (> 6), so the
                    # average cost drops while hard steps converge FURTHER
                    # than the old NIT=6 truncation.
                    def w_cond(c):
                        it_, _, mx_ = c
                        return (it_ < newton_iters) & (mx_ > newton_tol)

                    def w_body(c):
                        it_, u_, _ = c
                        u2_, mx_ = newton_body(list(u_))
                        return it_ + 1, tuple(u2_), mx_

                    it0 = jnp.int32(0)
                    itn, u_t, _ = jax.lax.while_loop(
                        w_cond, w_body, (it0, tuple(u), jnp.float32(1e9)))
                    return tuple(u_t) + (itn.astype(jnp.float32),)
                for _it in range(newton_iters):
                    u, _ = newton_body(u)
                    u = list(u)
                return tuple(u) + (jnp.float32(newton_iters),)

            def _cheap_solve(u0_t):
                # no finger contact anywhere in the block (the drop/settle +
                # finger-travel phase, ~80% of an 800-step squeeze): Newton on
                # the 6-DOF plane-row subproblem only; finger DOFs stay at
                # their unconstrained servo update.
                u = list(u0_t)

                def e_cheap(u_, capp_):
                    vpx_ = u_[0] + u_[4] * rz - u_[5] * ry
                    vpy_ = u_[1] + u_[5] * rx - u_[3] * rz
                    vpz_ = u_[2] + u_[3] * ry - u_[4] * rx
                    res_ = jnp.maximum(tgt_pn - vpz_, 0.0)
                    vt2_ = vpx_ * vpx_ + vpy_ * vpy_
                    e = jnp.sum(0.5 * w_np * res_ * res_, 0, keepdims=True)
                    vt_ = jnp.sqrt(vt2_ + 1e-16)
                    q_ = 0.5 * w_np * vt2_
                    lin = capp_ * vt_ \
                        - 0.5 * capp_ * capp_ / jnp.maximum(w_np, 1e-12)
                    e = e + jnp.sum(jnp.where(w_np * vt_ <= capp_, q_, lin),
                                    0, keepdims=True)
                    dox_, doy_, doz_ = (u_[3] - u_unc[3], u_[4] - u_unc[4],
                                        u_[5] - u_unc[5])
                    ix2, iy2, iz2 = iwmul(dox_, doy_, doz_)
                    return e + 0.5 * (
                        mass * ((u_[0] - u_unc[0]) ** 2
                                + (u_[1] - u_unc[1]) ** 2
                                + (u_[2] - u_unc[2]) ** 2)
                        + dox_ * ix2 + doy_ * iy2 + doz_ * iz2)

                for _it in range(3):
                    vpx = u[0] + u[4] * rz - u[5] * ry
                    vpy = u[1] + u[5] * rx - u[3] * rz
                    vpz = u[2] + u[3] * ry - u[4] * rx
                    resp = jnp.maximum(tgt_pn - vpz, 0.0)
                    lamp = w_np * resp
                    capp = mu_plane * lamp
                    vtpn = jnp.sqrt(vpx * vpx + vpy * vpy + 1e-16)
                    fac_p = jnp.minimum(w_np, capp / vtpn)

                    def rsum(x):
                        return jnp.sum(x, 0, keepdims=True)

                    ix_, iy_, iz_ = iwmul(u[3] - u_unc[3], u[4] - u_unc[4],
                                          u[5] - u_unc[5])
                    fx_, fy_ = fac_p * vpx, fac_p * vpy
                    g0 = mass * (u[0] - u_unc[0]) + rsum(fx_)
                    g1 = mass * (u[1] - u_unc[1]) + rsum(fy_)
                    g2 = mass * (u[2] - u_unc[2]) - rsum(lamp)
                    g3 = ix_ - rsum(lamp * ry) + rsum(-rz * fy_)
                    g4 = iy_ + rsum(lamp * rx) + rsum(rz * fx_)
                    g5 = iz_ + rsum(rx * fy_ - ry * fx_)
                    onp = w_np * (resp > 0.0)
                    cn_p = onp - fac_p
                    # jp6 = (0, 0, 1, ry, -rx, 0): only the 6 entries over
                    # rows {2,3,4} are nonzero — skip the other 15 (P,L)
                    # products entirely (round 5 zero-structure cut)
                    h = [[0.0] * 6 for _ in range(6)]
                    yp_n = cn_p * ry
                    h[2][2] = rsum(cn_p)
                    h[2][3] = rsum(yp_n)
                    h[2][4] = rsum(-cn_p * rx)
                    h[3][3] = rsum(yp_n * ry)
                    h[3][4] = rsum(-yp_n * rx)
                    h[4][4] = rsum(cn_p * rx * rx)
                    h[0][0] += rsum(fac_p) + mass
                    h[1][1] += rsum(fac_p) + mass
                    h[2][2] += rsum(fac_p) + mass
                    h[0][4] += rsum(fac_p * rz)
                    h[0][5] += rsum(fac_p * (-ry))
                    h[1][3] += rsum(fac_p * (-rz))
                    h[1][5] += rsum(fac_p * rx)
                    h[2][3] += rsum(fac_p * ry)
                    h[2][4] += rsum(fac_p * (-rx))
                    h[3][3] += rsum(fac_p * (ry * ry + rz * rz)) + iw00
                    h[4][4] += rsum(fac_p * (rx * rx + rz * rz)) + iw11
                    h[5][5] += rsum(fac_p * (rx * rx + ry * ry)) + iw22
                    h[3][4] += rsum(fac_p * (-rx * ry)) + iw01
                    h[3][5] += rsum(fac_p * (-rx * rz)) + iw02
                    h[4][5] += rsum(fac_p * (-ry * rz)) + iw12
                    grad6 = [g0, g1, g2, g3, g4, g5]
                    L = [[None] * 6 for _ in range(6)]
                    Ld = [None] * 6
                    for a in range(6):
                        s_ = h[a][a]
                        for k in range(a):
                            s_ = s_ - L[a][k] * L[a][k]
                        dinv = jax.lax.rsqrt(jnp.maximum(s_, 1e-12))
                        Ld[a] = dinv
                        for b_ in range(a + 1, 6):
                            s2 = h[a][b_]
                            for k in range(a):
                                s2 = s2 - L[b_][k] * L[a][k]
                            L[b_][a] = s2 * dinv
                    yv = [None] * 6
                    for a in range(6):
                        s_ = -grad6[a]
                        for k in range(a):
                            s_ = s_ - L[a][k] * yv[k]
                        yv[a] = s_ * Ld[a]
                    dv = [None] * 6
                    for a in range(5, -1, -1):
                        s_ = yv[a]
                        for k in range(a + 1, 6):
                            s_ = s_ - L[k][a] * dv[k]
                        dv[a] = s_ * Ld[a]
                    u1 = [u[0] + dv[0], u[1] + dv[1], u[2] + dv[2],
                          u[3] + dv[3], u[4] + dv[4], u[5] + dv[5],
                          u[6], u[7]]
                    u2 = [u[a] + 0.5 * dv[a] if a < 6 else u[a]
                          for a in range(8)]
                    # the ill-conditioned f32 Cholesky can explode at plane
                    # impact — same monotone energy fallback as the full path
                    e0 = e_cheap(u, capp)
                    e1 = e_cheap(u1, capp)
                    e2 = e_cheap(u2, capp)
                    b12 = e1 <= e2
                    eb = jnp.where(b12, e1, e2)
                    tk = eb <= e0
                    u = [jnp.where(tk, jnp.where(b12, u1[a], u2[a]), u[a])
                         for a in range(8)]
                return tuple(u) + (jnp.float32(0.0),)

            # broad phase: finger contact impossible unless the object's
            # wy span can reach a finger surface (surface extrema precomputed
            # in scene_arrays_3d, scal slots 25/26; conservative — ignores
            # the x/z window). Gated per 128-lane block.
            br_fmax_l = scal_ref[0, 0, 25]
            br_fmin_r = scal_ref[0, 0, 26]
            maybe = (
                (wyn <= (-g.jaw_offset + g.width) + ql + br_fmax_l)
                | (wyx >= g.jaw_offset + qr + br_fmin_r)
            ).astype(jnp.float32)
            any_f = (jnp.sum(maybe) > 0.0)
            u = list(jax.lax.cond(any_f,
                                  _full_solve, _cheap_solve, tuple(u_unc)))
            vx, vy, vz = u[0], u[1], u[2]
            ox, oy, oz = u[3], u[4], u[5]
            qdl, qdr = u[6], u[7]
            mf = any_f.astype(jnp.float32)
            cnt_f = cnt_f + mf
            cnt_c = cnt_c + (1.0 - mf)
            # cnt_i accumulates full-solve NEWTON ITERATIONS (u[8]; equals
            # cnt_f x newton_iters when newton_tol == 0) — the honest flop
            # base for the roofline now that the solve is adaptive
            cnt_i = cnt_i + u[8]

        # integrate
        px = px + dt * vx
        py = py + dt * vy
        pz = pz + dt * vz
        dqw = 0.5 * (-ox * qx - oy * qy - oz * qz)
        dqx = 0.5 * (ox * qw + oy * qz - oz * qy)
        dqy = 0.5 * (-ox * qz + oy * qw + oz * qx)
        dqz = 0.5 * (ox * qy - oy * qx + oz * qw)
        qw = qw + dt * dqw
        qx = qx + dt * dqx
        qy = qy + dt * dqy
        qz = qz + dt * dqz
        qn = jax.lax.rsqrt(qw * qw + qx * qx + qy * qy + qz * qz + 1e-12)
        qw, qx, qy, qz = qw * qn, qx * qn, qy * qn, qz * qn
        ql = ql + dt * qdl
        qr = qr + dt * qdr
        return (px, py, pz, qw, qx, qy, qz, vx, vy, vz,
                ox, oy, oz, ql, qr, qdl, qdr, wyn, wyx, cnt_f, cnt_c, cnt_i)

    def _travel_step(st):
        """Settled-travel fast path: the object is a static fixed point of
        the step map (post-solve |v| < EPS_SETTLED with gravity applied means
        the plane supports it), no finger contact is reachable this step, so
        only the finger servo advances — its no-contact update is EXACTLY the
        engines' unconstrained update (cheap_solve keeps the finger DOFs at
        u_unc). Skips all (P, L) work: ~60-75% of a datagen squeeze is this
        phase (runs/calib/probe_settle.json)."""
        (px, py, pz, qw, qx, qy, qz, vx, vy, vz,
         ox, oy, oz, ql, qr, qdl, qdr, wyn, wyx, cnt_f, cnt_c, cnt_i) = st
        f_l = g.kp * (ctrl_l - ql) - g.joint_damping * qdl
        f_r = g.kp * (-ctrl_l - qr) - g.joint_damping * qdr
        qdl = qdl + dt * f_l * inv_fml
        qdr = qdr + dt * f_r * inv_fmr
        ql = ql + dt * qdl
        qr = qr + dt * qdr
        return (px, py, pz, qw, qx, qy, qz, vx, vy, vz,
                ox, oy, oz, ql, qr, qdl, qdr, wyn, wyx, cnt_f, cnt_c, cnt_i)

    def step_body(i, st):
        (px, py, pz, qw, qx, qy, qz, vx, vy, vz,
         ox, oy, oz, ql, qr, qdl, qdr, wyn, wyx, cnt_f, cnt_c, cnt_i,
         spx, spy, sqw, sqz) = st
        if regrasp_every:
            rg = (i % regrasp_every == 0) & (i > 0)
            z_ = jnp.float32(0.0)
            ql = jnp.where(rg, z_, ql)
            qr = jnp.where(rg, z_, qr)
            qdl = jnp.where(rg, z_, qdl)
            qdr = jnp.where(rg, z_, qdr)
            vx = jnp.where(rg, z_, vx)
            vy = jnp.where(rg, z_, vy)
            vz = jnp.where(rg, z_, vz)
            ox = jnp.where(rg, z_, ox)
            oy = jnp.where(rg, z_, oy)
            oz = jnp.where(rg, z_, oz)
            # a regrasp zeroes velocities WITHOUT a solve confirming
            # equilibrium (the released object may need to relax under
            # gravity): invalidate the travel cache so the next step runs
            # the full physics and re-validates it.
            wyn = jnp.where(rg, jnp.float32(-1e9), wyn)

        # ---- settled-travel gate (all (1, L) work) ----
        # settled: post-solve velocities of the LAST normal step ~ 0 — the
        # solve included gravity, so ~0 means static equilibrium, a fixed
        # point of the step map. Gated per 128-lane block.
        mot = jnp.maximum(
            jnp.maximum(jnp.abs(vx), jnp.abs(vy)), jnp.abs(vz))
        mot = jnp.maximum(
            mot, jnp.maximum(jnp.maximum(jnp.abs(ox), jnp.abs(oy)),
                             jnp.abs(oz)))
        settled = jnp.max(mot) < EPS_SETTLED
        # no finger contact reachable at the current OR the post-step jaw
        # position (the jaw can only close as fast as its servo update).
        f_l = g.kp * (ctrl_l - ql) - g.joint_damping * qdl
        f_r = g.kp * (-ctrl_l - qr) - g.joint_damping * qdr
        ql_n = ql + dt * (qdl + dt * f_l * inv_fml)
        qr_n = qr + dt * (qdr + dt * f_r * inv_fmr)
        br_fmax_l = scal_ref[0, 0, 25]
        br_fmin_r = scal_ref[0, 0, 26]
        marg = jnp.float32(1e-4)  # covers dt*EPS pose drift of one step
        maybe = (
            (wyn - marg <= (-g.jaw_offset + g.width)
             + jnp.maximum(ql, ql_n) + br_fmax_l)
            | (wyx + marg >= g.jaw_offset + jnp.minimum(qr, qr_n)
               + br_fmin_r)
        ).astype(jnp.float32)
        travel = settled & (jnp.sum(maybe) == 0.0)

        dyn = (px, py, pz, qw, qx, qy, qz, vx, vy, vz,
               ox, oy, oz, ql, qr, qdl, qdr, wyn, wyx, cnt_f, cnt_c, cnt_i)
        dyn = jax.lax.cond(travel, _travel_step, _normal_step, dyn)
        (px, py, pz, qw, qx, qy, qz, vx, vy, vz,
         ox, oy, oz, ql, qr, qdl, qdr, wyn, wyx, cnt_f, cnt_c, cnt_i) = dyn

        take = (i + 1) == snapshot_step
        spx = jnp.where(take, px, spx)
        spy = jnp.where(take, py, spy)
        sqw = jnp.where(take, qw, sqw)
        sqz = jnp.where(take, qz, sqz)
        return (px, py, pz, qw, qx, qy, qz, vx, vy, vz,
                ox, oy, oz, ql, qr, qdl, qdr, wyn, wyx, cnt_f, cnt_c, cnt_i,
                spx, spy, sqw, sqz)

    state = jax.lax.fori_loop(0, steps, step_body, state)
    (px, py, pz, qw, qx, qy, qz, *_rest) = state
    cnt_f, cnt_c, cnt_i = state[19], state[20], state[21]
    spx, spy, sqw, sqz = state[22], state[23], state[24], state[25]
    if snapshot_step <= 0 or snapshot_step >= steps:
        spx, spy, sqw, sqz = px, py, qw, qz

    # angle readout happens OUTSIDE the kernel (Mosaic lacks atan2):
    # emit the final z-quaternion components instead
    # body origin = com_w - R @ com_b
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    org_x = px - (r00 * com_x + r01 * com_y + r02 * com_z)
    org_y = py - (r10 * com_x + r11 * com_y + r12 * com_z)
    valid = (jnp.abs(qx) < SIM.tipover_atol) & (jnp.abs(qy) < SIM.tipover_atol)

    # snapshot origin (z-rotation assumption holds within tip tolerance)
    sc = 1 - 2 * sqz * sqz
    ss = 2 * sqw * sqz
    sorg_x = spx - (sc * com_x - ss * com_y)
    sorg_y = spy - (ss * com_x + sc * com_y)
    qw_ref[0, 0, :] = qw[0, :]
    qz_ref[0, 0, :] = qz[0, :]
    dpx_ref[0, 0, :] = (org_x - pose_x)[0, :]
    dpy_ref[0, 0, :] = (org_y - pose_y)[0, :]
    valid_ref[0, 0, :] = valid.astype(jnp.float32)[0, :]
    sqw_ref[0, 0, :] = sqw[0, :]
    sqz_ref[0, 0, :] = sqz[0, :]
    sdx_ref[0, 0, :] = (sorg_x - pose_x)[0, :]
    sdy_ref[0, 0, :] = (sorg_y - pose_y)[0, :]
    cfull_ref[0, 0, :] = cnt_f[0, :]
    ccheap_ref[0, 0, :] = cnt_c[0, :]
    citer_ref[0, 0, :] = cnt_i[0, :]


def profile_batch_pallas3d(*args, solver=None, **kwargs):
    """Public entry: resolves the default contact solver from
    ``engine3d.SOLVER3`` at call time so the kernel and the pure-JAX engine
    switch together (tests assert their parity)."""
    from dgdm_tpu.sim import engine3d as _e3

    if solver is None:
        solver = _e3.SOLVER3
    return _profile_batch_pallas3d(*args, solver=solver, **kwargs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "steps", "dt", "regrasp_every", "solver_iters", "ctrl_mag",
        "snapshot_step", "solver", "newton_iters", "newton_tol",
        "return_step_mix",
    ),
)
def _profile_batch_pallas3d(
    coefs: jnp.ndarray,    # (B, 2, TOT_SEG, 4, 3)
    points: jnp.ndarray,   # (B, P, 4)
    scalars: jnp.ndarray,  # (B, 1, 16)
    poses: jnp.ndarray,    # (N, 3), N % LANE == 0
    steps: int = SIM.steps_3d,
    dt: float = SIM.dt,
    regrasp_every: int = 0,
    solver_iters: int = SOLVER_ITERS,
    ctrl_mag: float = SIM.ctrl_3d,
    snapshot_step: int = 0,
    solver: str = "jacobi",
    newton_iters: int = NEWTON_KERNEL_ITERS3,
    newton_tol: float = 0.0,
    return_step_mix: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    b, p = points.shape[0], points.shape[1]
    n = poses.shape[0]
    assert n % LANE == 0, n
    poses_t = poses.T.astype(jnp.float32)
    kernel = functools.partial(
        _rollout3d_kernel,
        steps=steps, dt=dt, regrasp_every=regrasp_every,
        solver_iters=solver_iters, ctrl_mag=ctrl_mag,
        snapshot_step=snapshot_step, solver=solver,
        newton_iters=newton_iters, newton_tol=newton_tol,
    )
    grid = (b, n // LANE)
    out_shape = [jax.ShapeDtypeStruct((b, 1, n), jnp.float32)
                 for _ in range(12)]
    out_specs = [
        pl.BlockSpec((1, 1, LANE), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM)
        for _ in range(12)
    ]
    (qw, qz, dpx, dpy, valid, sqw, sqz, sdx, sdy,
     cfull, ccheap, citer) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, TOT_SEG, 4, 3), lambda i, j: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 4), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 32), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LANE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(
        coefs.astype(jnp.float32),
        points.astype(jnp.float32),
        scalars.astype(jnp.float32),
        poses_t,
    )
    qw, qz, dpx, dpy, valid, sqw, sqz, sdx, sdy = (
        a[:, 0, :] for a in (qw, qz, dpx, dpy, valid, sqw, sqz, sdx, sdy)
    )
    two_pi = 2.0 * np.pi
    theta0 = jnp.mod(poses[:, 2], two_pi)[None, :]
    theta_s = jnp.mod(2.0 * jnp.arctan2(sqz, sqw), two_pi)
    dth = theta_s - theta0
    dth = dth - two_pi * jnp.round(dth / two_pi)
    theta_f = jnp.mod(2.0 * jnp.arctan2(qz, qw), two_pi)
    sdpos = jnp.stack([sdx, sdy], axis=-1)
    fpos = jnp.stack([dpx, dpy], axis=-1)
    if return_step_mix:
        # per-(pair, block) step-type counts, broadcast over lanes: full
        # 8-DOF solves / cheap 6-DOF plane solves / total full-solve Newton
        # iterations (= full x newton_iters when newton_tol == 0); travel
        # fast-path steps = steps - full - cheap. The honest per-workload
        # phase mix for the bench roofline (VERDICT r4 item 2).
        mix = (cfull[:, 0, :], ccheap[:, 0, :], citer[:, 0, :])
        return dth, sdpos, theta_f, valid > 0.5, fpos, mix
    return dth, sdpos, theta_f, valid > 0.5, fpos


_FIT_CACHE: "dict[bytes, np.ndarray]" = {}
_FIT_CACHE_MAX = 2048


def scene_arrays_3d(scenes, calib=None) -> Tuple[jnp.ndarray, ...]:
    """Stacked Scene3D pytree -> (coefs, points, scalars) kernel inputs.
    Fits the surface polynomials (host-side) from the stacked ctrl grids.

    Per-jaw fits (~50 ms each) are served from a bounded LRU keyed on the
    control points + side + contact-surface mode — production datagen
    (cli/datagen3d.py) loops gripper blocks OUTER so one block's fits are
    reused for every object (same pattern as engine3d's gripper cache)."""
    from dgdm_tpu.sim import engine3d as _e3mode

    yls = np.asarray(scenes.yl)                     # (B, 7, 3)
    yrs = np.asarray(scenes.yr)
    b = yls.shape[0]
    both = np.concatenate([yls, yrs], 0)            # (2B, 7, 3)
    # first half = left jaws (inner face +y), second half = right (-y)
    sides = ["upper"] * b + ["lower"] * b
    mode = _e3mode.CONTACT_SURFACE_3D.encode()
    keys = [both[i].tobytes() + sides[i].encode() + mode
            for i in range(2 * b)]
    miss = [i for i, k in enumerate(keys) if k not in _FIT_CACHE]
    fresh: "dict[bytes, np.ndarray]" = {}
    if miss:
        new = fit_surface_batch(both[miss], sides=[sides[i] for i in miss])
        for j, i in enumerate(miss):
            fresh[keys[i]] = new[j]
    # Materialise the batch BEFORE evicting (eviction during insertion could
    # drop a key this very batch still needs), and pop+reinsert hits so the
    # eviction order is true LRU, not FIFO.
    rows = []
    for k in keys:
        v = fresh.get(k)
        if v is None:
            v = _FIT_CACHE.pop(k)
        _FIT_CACHE[k] = v
        rows.append(v)
    while len(_FIT_CACHE) > _FIT_CACHE_MAX:
        _FIT_CACHE.pop(next(iter(_FIT_CACHE)))
    fitted = np.stack(rows)                          # (2B, TOT_SEG, 4, 3)
    coefs = np.stack([fitted[:b], fitted[b:]], axis=1).astype(np.float32)
    pts = np.asarray(scenes.points)
    points = np.concatenate(
        [pts, np.zeros((b, pts.shape[1], 1), np.float32)], axis=-1
    )
    from dgdm_tpu.sim import engine3d as _e3

    if calib is None:
        calib = _e3.default_calib3()
    scal = np.zeros((b, 1, 32), np.float32)
    scal[:, 0, 0] = np.asarray(scenes.mass)
    scal[:, 0, 1] = np.asarray(scenes.finger_mass)[..., 0]
    scal[:, 0, 2:5] = np.asarray(scenes.com)
    inv_i = np.asarray(scenes.inv_inertia)          # (B, 3, 3)
    scal[:, 0, 5] = inv_i[:, 0, 0]
    scal[:, 0, 6] = inv_i[:, 1, 1]
    scal[:, 0, 7] = inv_i[:, 2, 2]
    scal[:, 0, 8] = inv_i[:, 0, 1]
    scal[:, 0, 9] = inv_i[:, 0, 2]
    scal[:, 0, 10] = inv_i[:, 1, 2]
    scal[:, 0, 11] = np.asarray(scenes.finger_mass)[..., 1]
    scal[:, 0, 12] = float(calib.mu_plane)
    scal[:, 0, 13] = float(calib.mu_finger)
    scal[:, 0, 14] = float(calib.k_contact)
    scal[:, 0, 15] = float(calib.b_contact)
    scal[:, 0, 16] = float(calib.unload)
    scal[:, 0, 17] = float(calib.rough)
    ib = np.asarray(scenes.inertia)                 # (B, 3, 3)
    scal[:, 0, 18] = ib[:, 0, 0]
    scal[:, 0, 19] = ib[:, 1, 1]
    scal[:, 0, 20] = ib[:, 2, 2]
    scal[:, 0, 21] = ib[:, 0, 1]
    scal[:, 0, 22] = ib[:, 0, 2]
    scal[:, 0, 23] = ib[:, 1, 2]
    scal[:, 0, 24] = float(calib.c_r)
    scal[:, 0, 27] = float(calib.restitution)
    # broad-phase surface extrema for the kernel's no-contact fast path
    # (dense-grid evaluation of the fitted per-segment bivariate polys,
    # padded by 1e-3 to stay conservative)
    from dgdm_tpu.core.config import GRIPPER_3D as _g3

    h3 = (_g3.ctrl_x_max - _g3.ctrl_x_min) / N_SEG
    t3 = np.linspace(0.0, h3, 24)
    s3 = np.linspace(0.0, (_g3.ctrl_z_max - _g3.ctrl_z_min) / NZ_SEG, 16)
    basis = np.stack(
        [t3[:, None] ** a * s3[None, :] ** b_
         for a in range(DEG_X + 1) for b_ in range(DEG_Z + 1)], -1
    )  # (T, S, C)
    cflat = coefs.reshape(b, 2, TOT_SEG, -1)        # (B, 2, TOT_SEG, C)
    vals3 = np.einsum("bfnc,tsc->bfnts", cflat, basis)
    scal[:, 0, 25] = vals3[:, 0].max(axis=(1, 2, 3)) + 1e-3   # left max
    scal[:, 0, 26] = vals3[:, 1].min(axis=(1, 2, 3)) - 1e-3   # right min
    return jnp.asarray(coefs), jnp.asarray(points), jnp.asarray(scal)
