"""Pallas TPU kernel: fully fused 2D squeeze rollouts.

The pure-JAX engine (``engine2d.py``) is HBM-bound: every scan step
materializes (batch, contacts) intermediates. This kernel keeps the whole
rollout resident in VMEM: each program runs LANE=128 rollouts of one
object x gripper pair for all ``steps`` timesteps — rollouts live in lanes,
contour points in sublanes, so every contact op is a dense (P, 128) VPU op
and nothing touches HBM until the final (delta_theta, delta_pos, final_theta)
write-back.

Physics is the same implicit mass-split Jacobi solver as ``engine2d.step``
(see that module for the MuJoCo-matching derivation); numerical results agree
to f32 tolerance (tests/test_pallas2d.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgdm_tpu.core.config import GRIPPER_2D, SIM
from dgdm_tpu.sim.engine2d import (
    B_CONTACT,
    B_PLANE,
    DEPTH_EL_CAP,
    ROUGH_SAT,
    IMPEDANCE,
    K_CONTACT,
    K_PLANE,
    SOLVER_ITERS,
)

LANE = 128
# Newton iterations in the full-contact solve (static; also a jit arg on
# profile_batch_pallas). 3, with the calibration refit at 3 iterations
# (round 4, runs/calib/calib2d_search_nit3.json): suite score 1.001 vs the
# 4-iteration fit's 1.011 (val identical at 0.903) at +19% throughput
# (287k vs 241k rollouts/s, runs/calib/sweep_newton_iters_2d_r4.json);
# engine2d uses the same count. NOTE a warm start was tried and REJECTED:
# priming the primal from the previous step's impulse correction
# over-rotates 5x (stale corrections pump energy through the lagged
# cones), and warm-starting only the friction caps under-brakes (ratio
# 1.65) because the fitted constants were calibrated against the
# cold-start lagged-cone transient.
NEWTON_KERNEL_ITERS = 3
# settled-travel fast-path gate (see pallas3d.EPS_SETTLED): post-solve
# velocity magnitude below which the object counts as statically supported
# (travel-phase residual ~1e-6; transients 5e-2+, runs/calib/probe_settle.json)
EPS_SETTLED = 1e-4


def _segment_coefs(coef_ref, finger: int, seg: jnp.ndarray):
    """Select per-point cubic coefficients c0..c3 for segment indices
    ``seg`` (P, L) from coef_ref block (1, 2, 6, 4) via a where-chain
    (6 segments — cheaper than gathers on TPU)."""
    cs = []
    for k in range(4):
        val = jnp.float32(0.0)
        acc = None
        for s in range(6):
            c_sk = coef_ref[0, finger, s, k]
            if acc is None:
                acc = jnp.full_like(seg, 0.0, dtype=jnp.float32) + c_sk
            else:
                acc = jnp.where(seg >= s, c_sk, acc)
        cs.append(acc)
    return cs


def _rollout_kernel(
    # scene refs (per pair)
    coef_ref,        # (1, 2, 6, 4)
    contour_ref,     # (1, P, 2)
    support_ref,     # (1, S, 4): x, y, weight, pad
    scal_ref,        # (1, 1, 16): mass, inertia, fmass_l, com_x, com_y,
                     # fmass_r, mu_plane, mu_finger, mu_torsion, k_contact,
                     # b_contact, unload, pad... (see scene_arrays)
    poses_ref,       # (3, LANE)
    # outputs
    dth_ref,         # (1, 1, LANE)  delta at snapshot_step (the profile)
    dpx_ref,         # (1, 1, LANE)
    dpy_ref,         # (1, 1, LANE)
    fth_ref,         # (1, 1, LANE)  final theta after all steps
    fpx_ref,         # (1, 1, LANE)  final origin x
    fpy_ref,         # (1, 1, LANE)  final origin y
    cfull_ref,       # (1, 1, LANE)  per-block full-solve step count
    ccheap_ref,      # (1, 1, LANE)  per-block cheap-solve step count
    *,
    steps: int,
    dt: float,
    regrasp_every: int,
    solver_iters: int,
    ctrl_mag: float,
    snapshot_step: int,
    solver: str = "jacobi",
    newton_iters: int = NEWTON_KERNEL_ITERS,
):
    g = GRIPPER_2D
    x0f, x1f = g.ctrl_x_min, g.ctrl_x_max
    h = (x1f - x0f) / (g.num_ctrl - 1)

    mass = scal_ref[0, 0, 0]
    inertia = scal_ref[0, 0, 1]
    fmass_l = scal_ref[0, 0, 2]
    com_bx = scal_ref[0, 0, 3]
    com_by = scal_ref[0, 0, 4]
    fmass_r = scal_ref[0, 0, 5]
    mu_plane = scal_ref[0, 0, 6]
    mu_finger = scal_ref[0, 0, 7]
    mu_torsion = scal_ref[0, 0, 8]
    k_con = scal_ref[0, 0, 9]
    b_con = scal_ref[0, 0, 10]
    unload = scal_ref[0, 0, 11]
    rough = scal_ref[0, 0, 12]
    inv_m, inv_i = 1.0 / mass, 1.0 / inertia
    inv_fml, inv_fmr = 1.0 / fmass_l, 1.0 / fmass_r

    # body-frame contour relative to COM: (P, 1) -> broadcast against lanes
    cbx = contour_ref[0, :, 0:1] - com_bx          # (P, 1)
    cby = contour_ref[0, :, 1:2] - com_by
    sbx = support_ref[0, :, 0:1] - com_bx          # (S, 1)
    sby = support_ref[0, :, 1:2] - com_by
    sw = support_ref[0, :, 2:3]                    # (S, 1) weights

    pose_x = poses_ref[0:1, :]                     # (1, L)
    pose_y = poses_ref[1:2, :]
    theta0 = poses_ref[2:3, :]

    c0, s0 = jnp.cos(theta0), jnp.sin(theta0)
    com_x = pose_x + c0 * com_bx - s0 * com_by
    com_y = pose_y + s0 * com_bx + c0 * com_by

    zero = jnp.zeros_like(com_x)
    state = (
        com_x, com_y, theta0 + zero,               # position
        zero, zero, zero,                          # vel x, y, om
        zero, zero,                                # zb, vz
        zero, zero, zero, zero,                    # ql, qr, qdl, qdr
        zero, zero,                                # counters: full, cheap
        com_x + zero, com_y + zero, theta0 + zero, # snapshot (com, theta)
    )

    ctrl_l = jnp.float32(min(ctrl_mag, g.ctrl_clamped))
    ctrl_r = -ctrl_l
    d_imp = jnp.float32(IMPEDANCE)

    def _normal_step(st):
        (cx, cy, th, vx, vy, om, zb, vz, ql, qr, qdl, qdr,
         cnt_f, cnt_c) = st

        c, s = jnp.cos(th), jnp.sin(th)            # (1, L)

        def contact_geometry():
            """Full narrow-phase contact set against both finger curves —
            the dominant (P, L) per-step cost. In the Newton path this runs
            only inside the full-solve branch of the lax.cond, gated by the
            conservative broad-phase bound (scal slots 14/15); the
            drop/travel phase skips it entirely."""
            # world lever arms of contour points: (P, L)
            rx = cbx * c - cby * s
            ry = cbx * s + cby * c
            px = cx + rx
            py = cy + ry

            x_in = (px >= x0f) & (px <= x1f)
            xc = jnp.clip(px, x0f, x1f)
            seg = jnp.clip(
                ((xc - x0f) * (1.0 / h)).astype(jnp.int32), 0, g.num_ctrl - 2
            )
            t_loc = xc - (x0f + seg.astype(jnp.float32) * h)

            f_val = []
            d_val = []
            for fi in range(2):
                c0_, c1, c2, c3 = _segment_coefs(coef_ref, fi, seg)
                val = ((c3 * t_loc + c2) * t_loc + c1) * t_loc + c0_
                der = (3.0 * c3 * t_loc + 2.0 * c2) * t_loc + c1
                f_val.append(val)
                d_val.append(der)

            surf_l = (-g.jaw_offset + g.width) + ql + f_val[0]
            surf_r = g.jaw_offset + qr + f_val[1]
            inv_l = jax.lax.rsqrt(1.0 + d_val[0] * d_val[0])
            inv_r = jax.lax.rsqrt(1.0 + d_val[1] * d_val[1])
            depth_l = (surf_l - py) * inv_l
            depth_r = (py - surf_r) * inv_r
            # a point can never contact BOTH fingers (the closed jaws stay
            # >1 cm apart), so the two finger contact sets merge into one:
            # pick the deeper candidate per point — halves the solver work
            is_l = depth_l > depth_r
            depth = jnp.where(is_l, depth_l, depth_r)
            nx = jnp.where(is_l, -d_val[0] * inv_l, d_val[1] * inv_r)
            ny = jnp.where(is_l, inv_l, -inv_r)
            act = ((depth > 0.0) & x_in).astype(jnp.float32)

            rxn = rx * ny - ry * nx
            tx_, ty_ = -ny, nx
            rxt = rx * ty_ - ry * tx_
            inv_fm_pt = jnp.where(is_l, inv_fml, inv_fmr)
            me_n = 1.0 / (inv_m + rxn * rxn * inv_i + ny * ny * inv_fm_pt)
            me_t = 1.0 / (inv_m + rxt * rxt * inv_i + ty_ * ty_ * inv_fm_pt)

            # soft-constraint normal velocity from pre-update velocities
            qd_c0 = jnp.where(is_l, qdl, qdr)      # coupled finger velocity
            vn0 = (vx - om * ry) * nx + (vy + om * rx - qd_c0) * ny
            return (rx, ry, is_l, depth, nx, ny, act, rxn, tx_, ty_, rxt,
                    me_n, me_t, vn0)

        # plane normal (z penalty)
        depth_z = SIM.plane_z - zb
        n_total = mass * jnp.maximum(K_PLANE * depth_z - B_PLANE * vz, 0.0)
        rsx = sbx * c - sby * s
        rsy = sbx * s + sby * c

        if solver == "jacobi":
            (rx, ry, is_l, depth, nx, ny, act, rxn, tx_, ty_, rxt,
             me_n, me_t, vn0) = contact_geometry()
            is_lf = is_l.astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(act, 0, keepdims=True), 1.0)
            w_c = act / cnt
            # implicit stopping target uses the stable base solref gains;
            # calib gains drive the explicit elastic wedge term (engine2d.step)
            tgt = (1.0 - d_imp * B_CONTACT * dt) * vn0 \
                + d_imp * dt * K_CONTACT * depth
            # explicit elastic wedge impulse, clamped to the pushout velocity
            depth_el = act * jnp.clip(depth, 0.0, DEPTH_EL_CAP)
            v_capn = d_imp * dt * k_con * depth_el
            dv_el = jnp.clip(
                d_imp * dt * (k_con * depth_el - b_con * vn0),
                0.0,
                jnp.maximum(v_capn - vn0, 0.0),
            )
            imp_el = act * me_n * dv_el                  # (P, L) impulse magnitude
            # global energy clamp on the summed elastic wrench (engine2d.step)
            dvx_u = jnp.sum(imp_el * nx, 0, keepdims=True) * inv_m
            dvy_u = jnp.sum(imp_el * ny, 0, keepdims=True) * inv_m
            dom_u = jnp.sum(imp_el * rxn, 0, keepdims=True) * inv_i
            dqdl_u = -jnp.sum(is_lf * imp_el * ny, 0, keepdims=True) * inv_fml
            dqdr_u = -jnp.sum((1.0 - is_lf) * imp_el * ny, 0, keepdims=True) * inv_fmr
            dqd_pt = jnp.where(is_l, dqdl_u, dqdr_u)
            dvn_ind = (dvx_u - dom_u * ry) * nx + (dvy_u + dom_u * rx - dqd_pt) * ny
            headroom = jnp.maximum(v_capn - vn0, 0.0)
            ratio_el = jnp.where(
                (act > 0) & (dvn_ind > 1e-9), headroom / (dvn_ind + 1e-9),
                jnp.float32(jnp.inf),
            )
            s_el = jnp.clip(jnp.min(ratio_el, 0, keepdims=True), 0.0, 1.0)
            imp_el = s_el * imp_el

            # mean-field plane unloading from the grip load (engine2d.step)
            grip_ratio = jnp.sum(imp_el, 0, keepdims=True) / (
                dt * mass * SIM.gravity
            )
            n_i = sw * n_total / (1.0 + unload * grip_ratio)   # (S, L)

            # unconstrained update (elastic wedge impulses included)
            f_l = g.kp * (ctrl_l - ql) - g.joint_damping * qdl
            f_r = g.kp * (ctrl_r - qr) - g.joint_damping * qdr
            vx = vx + jnp.sum(imp_el * nx, 0, keepdims=True) * inv_m
            vy = vy + jnp.sum(imp_el * ny, 0, keepdims=True) * inv_m
            om = om + jnp.sum(imp_el * rxn, 0, keepdims=True) * inv_i
            vz = vz + dt * (-SIM.gravity + n_total * inv_m)
            qdl = (qdl + dt * f_l * inv_fml
                   - jnp.sum(is_lf * imp_el * ny, 0, keepdims=True) * inv_fml)
            qdr = (qdr + dt * f_r * inv_fmr
                   - jnp.sum((1.0 - is_lf) * imp_el * ny, 0, keepdims=True) * inv_fmr)

            lam_n = jnp.zeros_like(depth)
            lam_t = jnp.zeros_like(depth)
            lam_sx = jnp.zeros_like(n_i)
            lam_sy = jnp.zeros_like(n_i)
            lam_w = jnp.zeros_like(n_i)

            def solve(j, carry):
                (vx, vy, om, qdl, qdr,
                 lam_n, lam_t, lam_sx, lam_sy, lam_w) = carry
                qd_cc = jnp.where(is_l, qdl, qdr)
                vpx = vx - om * ry
                vpy = vy + om * rx - qd_cc
                vn = vpx * nx + vpy * ny
                vt = vpx * tx_ + vpy * ty_

                d_n0 = w_c * me_n * (tgt - vn)
                new_n = jnp.maximum(lam_n + d_n0, 0.0)
                d_n = new_n - lam_n

                cap = (mu_finger * (new_n + imp_el)
                       + rough * me_t * jnp.minimum(depth_el, ROUGH_SAT))
                new_t = jnp.clip(lam_t - w_c * me_t * vt, -cap, cap)
                d_t = new_t - lam_t

                imp_x = d_n * nx + d_t * tx_
                imp_y = d_n * ny + d_t * ty_
                vx = vx + jnp.sum(imp_x, 0, keepdims=True) * inv_m
                vy = vy + jnp.sum(imp_y, 0, keepdims=True) * inv_m
                om = om + jnp.sum(d_n * rxn + d_t * rxt, 0, keepdims=True) * inv_i
                qdl = qdl - jnp.sum(is_lf * imp_y, 0, keepdims=True) * inv_fml
                qdr = qdr - jnp.sum((1.0 - is_lf) * imp_y, 0, keepdims=True) * inv_fmr

                # plane friction
                vsx = vx - om * rsy
                vsy = vy + om * rsx
                nsx = lam_sx - sw * mass * vsx
                nsy = lam_sy - sw * mass * vsy
                cap_s = mu_plane * n_i * dt
                nrm = jnp.sqrt(nsx * nsx + nsy * nsy + 1e-20)
                sc = jnp.minimum(1.0, cap_s / nrm)
                nsx = nsx * sc
                nsy = nsy * sc
                d_sx = nsx - lam_sx
                d_sy = nsy - lam_sy
                vx = vx + jnp.sum(d_sx, 0, keepdims=True) * inv_m
                vy = vy + jnp.sum(d_sy, 0, keepdims=True) * inv_m
                om = om + jnp.sum(rsx * d_sy - rsy * d_sx, 0, keepdims=True) * inv_i
                cap_w = mu_torsion * n_i * dt
                new_w = jnp.clip(lam_w - sw * inertia * om, -cap_w, cap_w)
                d_w = new_w - lam_w
                om = om + jnp.sum(d_w, 0, keepdims=True) * inv_i

                return (vx, vy, om, qdl, qdr,
                        new_n, new_t, nsx, nsy, new_w)

            (vx, vy, om, qdl, qdr, *_rest) = jax.lax.fori_loop(
                0, solver_iters, solve,
                (vx, vy, om, qdl, qdr,
                 lam_n, lam_t, lam_sx, lam_sy, lam_w),
            )
            cnt_f = cnt_f + 1.0
        else:
            # ---- coupled semi-smooth Newton solve (engine2d.step_newton) --
            # u = (vx, vy, om, qdl, qdr); damped Newton on the convex
            # soft-constraint energy, unrolled 5x5 Cholesky per lane,
            # 2-point line search with monotone fallback.
            c_r2 = scal_ref[0, 0, 13]
            a_s = inv_m + (rsx * rsx + rsy * rsy) * inv_i * 0.5
            w_s = 1.0 / (c_r2 * a_s)                        # (S, L)
            w_w = inertia / c_r2
            mg_dt = mass * jnp.float32(SIM.gravity) * dt
            mdiag = (mass, mass, inertia, fmass_l, fmass_r)

            f_l = g.kp * (ctrl_l - ql) - g.joint_damping * qdl
            f_r = g.kp * (ctrl_r - qr) - g.joint_damping * qdr
            vz = vz + dt * (-SIM.gravity + n_total * inv_m)
            u_unc = [vx, vy, om, qdl + dt * f_l * inv_fml,
                     qdr + dt * f_r * inv_fmr]

            def hub(v_, w_, cap_):
                q_ = 0.5 * w_ * v_ * v_
                lin = cap_ * jnp.abs(v_) \
                    - 0.5 * cap_ * cap_ / jnp.maximum(w_, 1e-12)
                return jnp.where(w_ * jnp.abs(v_) <= cap_, q_, lin)

            def _full_solve(u0_t):
                # narrow-phase geometry computed HERE so the cheap branch
                # never pays for it (broad-phase gated lax.cond below)
                (rx, ry, is_l, depth, nx, ny, act, rxn, tx_, ty_, rxt,
                 me_n, me_t, vn0) = contact_geometry()
                sl = is_l.astype(jnp.float32)
                sr = 1.0 - sl
                tgt_n = (1.0 - d_imp * b_con * dt) * vn0 \
                    + d_imp * dt * k_con * depth
                w_nn = act * me_n / c_r2
                w_tt = act * me_t / c_r2
                depth_el = act * jnp.clip(depth, 0.0, DEPTH_EL_CAP)
                # depth-proportional crack-capture capacity (engine2d notes)
                cap_rough = rough * me_t * depth_el
                jn = (nx, ny, rxn, -ny * sl, -ny * sr)
                jt = (tx_, ty_, rxt, -ty_ * sl, -ty_ * sr)

                def vels_of(u_):
                    qd_cc = u_[3] * sl + u_[4] * sr
                    vpx = u_[0] - u_[2] * ry
                    vpy = u_[1] + u_[2] * rx - qd_cc
                    vn_ = vpx * nx + vpy * ny
                    vt_ = vpx * tx_ + vpy * ty_
                    vsx_ = u_[0] - u_[2] * rsy
                    vsy_ = u_[1] + u_[2] * rsx
                    return vn_, vt_, vsx_, vsy_

                def caps_of(u_):
                    vn_, _, _, _ = vels_of(u_)
                    lam_ = w_nn * jnp.maximum(tgt_n - vn_, 0.0)
                    grip = jnp.sum(lam_, 0, keepdims=True) / mg_dt
                    n_i_ = sw * n_total / (1.0 + unload * grip)
                    cap_t_ = mu_finger * lam_ + cap_rough
                    cap_s_ = mu_plane * n_i_ * dt
                    cap_w_ = mu_torsion * jnp.sum(n_i_, 0, keepdims=True) * dt
                    return lam_, cap_t_, cap_s_, cap_w_

                def energy(u_, cap_t_, cap_s_, cap_w_):
                    vn_, vt_, vsx_, vsy_ = vels_of(u_)
                    res = jnp.maximum(tgt_n - vn_, 0.0)
                    e_n = jnp.sum(
                        0.5 * w_nn * res * res + hub(vt_, w_tt, cap_t_),
                        0, keepdims=True)
                    vs_ = jnp.sqrt(vsx_ * vsx_ + vsy_ * vsy_ + 1e-16)
                    e_s = jnp.sum(hub(vs_, w_s, cap_s_), 0, keepdims=True)
                    e_w = hub(u_[2], w_w, cap_w_)
                    e_u = 0.5 * (
                        mass * ((u_[0] - u_unc[0]) ** 2
                                + (u_[1] - u_unc[1]) ** 2)
                        + inertia * (u_[2] - u_unc[2]) ** 2
                        + fmass_l * (u_[3] - u_unc[3]) ** 2
                        + fmass_r * (u_[4] - u_unc[4]) ** 2
                    )
                    return e_u + e_n + e_s + e_w

                u = list(u0_t)
                for _it in range(newton_iters):
                    lam_nn, cap_t, cap_s, cap_w = caps_of(u)
                    vn_, vt_, vsx_, vsy_ = vels_of(u)
                    res = jnp.maximum(tgt_n - vn_, 0.0)
                    f_t = jnp.clip(w_tt * vt_, -cap_t, cap_t)
                    vs_ = jnp.sqrt(vsx_ * vsx_ + vsy_ * vsy_ + 1e-16)
                    fac_s = jnp.minimum(w_s, cap_s / vs_)
                    f_w = jnp.clip(w_w * u[2], -cap_w, cap_w)

                    def rsum(x):
                        return jnp.sum(x, 0, keepdims=True)

                    fx_, fy_ = fac_s * vsx_, fac_s * vsy_
                    grad = [
                        mass * (u[0] - u_unc[0]) - rsum(lam_nn * nx)
                        + rsum(f_t * tx_) + rsum(fx_),
                        mass * (u[1] - u_unc[1]) - rsum(lam_nn * ny)
                        + rsum(f_t * ty_) + rsum(fy_),
                        inertia * (u[2] - u_unc[2]) - rsum(lam_nn * rxn)
                        + rsum(f_t * rxt)
                        + rsum(rsx * fy_ - rsy * fx_) + f_w,
                        fmass_l * (u[3] - u_unc[3])
                        + rsum(sl * (lam_nn * ny - f_t * ty_)),
                        fmass_r * (u[4] - u_unc[4])
                        + rsum(sr * (lam_nn * ny - f_t * ty_)),
                    ]

                    on_n = w_nn * (res > 0.0)
                    on_t = w_tt * (jnp.abs(w_tt * vt_) <= cap_t)
                    # hoist on_n*jn[a] / on_t*jt[a] out of the b loop, and
                    # jn[3]*jn[4] = ny^2*sl*sr = 0 exactly (complementary
                    # masks; same for jt) — round-5 zero-structure cut
                    yn = [on_n * jn[a] for a in range(5)]
                    yt = [on_t * jt[a] for a in range(5)]
                    hm = [[None] * 5 for _ in range(5)]
                    for a in range(5):
                        for b_ in range(a, 5):
                            if (a, b_) == (3, 4):
                                hm[a][b_] = 0.0
                            else:
                                hm[a][b_] = rsum(yn[a] * jn[b_]
                                                 + yt[a] * jt[b_])
                    # plane iso-GN + torsion
                    hm[0][0] += rsum(fac_s) + mdiag[0]
                    hm[1][1] += rsum(fac_s) + mdiag[1]
                    hm[0][2] += rsum(fac_s * (-rsy))
                    hm[1][2] += rsum(fac_s * rsx)
                    hm[2][2] += rsum(fac_s * (rsx * rsx + rsy * rsy)) \
                        + w_w * (jnp.abs(w_w * u[2]) <= cap_w) + mdiag[2]
                    hm[3][3] += mdiag[3]
                    hm[4][4] += mdiag[4]

                    # unrolled 5x5 Cholesky solve of H d = -grad
                    L = [[None] * 5 for _ in range(5)]
                    Ld = [None] * 5
                    for a in range(5):
                        s_ = hm[a][a]
                        for k in range(a):
                            s_ = s_ - L[a][k] * L[a][k]
                        dinv = jax.lax.rsqrt(jnp.maximum(s_, 1e-12))
                        Ld[a] = dinv
                        for b_ in range(a + 1, 5):
                            s2 = hm[a][b_]
                            for k in range(a):
                                s2 = s2 - L[b_][k] * L[a][k]
                            L[b_][a] = s2 * dinv
                    yv = [None] * 5
                    for a in range(5):
                        s_ = -grad[a]
                        for k in range(a):
                            s_ = s_ - L[a][k] * yv[k]
                        yv[a] = s_ * Ld[a]
                    dv = [None] * 5
                    for a in range(4, -1, -1):
                        s_ = yv[a]
                        for k in range(a + 1, 5):
                            s_ = s_ - L[k][a] * dv[k]
                        dv[a] = s_ * Ld[a]

                    u1 = [u[a] + dv[a] for a in range(5)]
                    u2 = [u[a] + 0.5 * dv[a] for a in range(5)]
                    e0 = energy(u, cap_t, cap_s, cap_w)
                    e1 = energy(u1, cap_t, cap_s, cap_w)
                    e2 = energy(u2, cap_t, cap_s, cap_w)
                    best12 = e1 <= e2
                    eb = jnp.where(best12, e1, e2)
                    take_new = eb <= e0
                    u = [jnp.where(take_new,
                                   jnp.where(best12, u1[a], u2[a]), u[a])
                         for a in range(5)]

                return tuple(u)

            def _cheap_solve(u0_t):
                # no finger contact anywhere in the block: plane friction +
                # torsion only — 2 Newton iterations on the 3-DOF subproblem
                # (the drop/settle phase; ~70% of datagen steps).
                u = list(u0_t)
                n_i_ = sw * n_total
                cap_s_ = mu_plane * n_i_ * dt
                cap_w_ = mu_torsion * jnp.sum(n_i_, 0, keepdims=True) * dt

                def e_cheap(u_):
                    vsx_ = u_[0] - u_[2] * rsy
                    vsy_ = u_[1] + u_[2] * rsx
                    vs_ = jnp.sqrt(vsx_ * vsx_ + vsy_ * vsy_ + 1e-16)
                    q_ = 0.5 * w_s * vs_ * vs_
                    lin = cap_s_ * vs_ \
                        - 0.5 * cap_s_ * cap_s_ / jnp.maximum(w_s, 1e-12)
                    e = jnp.sum(jnp.where(w_s * vs_ <= cap_s_, q_, lin),
                                0, keepdims=True)
                    qw_ = 0.5 * w_w * u_[2] * u_[2]
                    linw = cap_w_ * jnp.abs(u_[2]) \
                        - 0.5 * cap_w_ * cap_w_ / jnp.maximum(w_w, 1e-12)
                    e = e + jnp.where(w_w * jnp.abs(u_[2]) <= cap_w_, qw_, linw)
                    return e + 0.5 * (
                        mass * ((u_[0] - u_unc[0]) ** 2
                                + (u_[1] - u_unc[1]) ** 2)
                        + inertia * (u_[2] - u_unc[2]) ** 2)

                for _it in range(2):
                    vsx_ = u[0] - u[2] * rsy
                    vsy_ = u[1] + u[2] * rsx
                    vs_ = jnp.sqrt(vsx_ * vsx_ + vsy_ * vsy_ + 1e-16)
                    fac_s = jnp.minimum(w_s, cap_s_ / vs_)
                    f_w = jnp.clip(w_w * u[2], -cap_w_, cap_w_)
                    fx_ = fac_s * vsx_
                    fy_ = fac_s * vsy_
                    g0 = mass * (u[0] - u_unc[0]) + jnp.sum(fx_, 0, keepdims=True)
                    g1 = mass * (u[1] - u_unc[1]) + jnp.sum(fy_, 0, keepdims=True)
                    g2 = inertia * (u[2] - u_unc[2]) + f_w \
                        + jnp.sum(rsx * fy_ - rsy * fx_, 0, keepdims=True)
                    sfac = jnp.sum(fac_s, 0, keepdims=True)
                    h00 = mass + sfac
                    h11 = mass + sfac
                    h02 = jnp.sum(fac_s * (-rsy), 0, keepdims=True)
                    h12 = jnp.sum(fac_s * rsx, 0, keepdims=True)
                    h22 = inertia + w_w * (jnp.abs(w_w * u[2]) <= cap_w_) \
                        + jnp.sum(fac_s * (rsx * rsx + rsy * rsy), 0,
                                  keepdims=True)
                    # Cholesky of [[h00,0,h02],[0,h11,h12],[h02,h12,h22]]
                    l00i = jax.lax.rsqrt(h00)
                    l11i = jax.lax.rsqrt(h11)
                    l20 = h02 * l00i
                    l21 = h12 * l11i
                    l22i = jax.lax.rsqrt(
                        jnp.maximum(h22 - l20 * l20 - l21 * l21, 1e-12))
                    y0 = -g0 * l00i
                    y1 = -g1 * l11i
                    y2 = (-g2 - l20 * y0 - l21 * y1) * l22i
                    d2 = y2 * l22i
                    d1 = (y1 - l21 * d2) * l11i
                    d0 = (y0 - l20 * d2) * l00i
                    # same candidate policy as the full path / engine
                    u1 = [u[0] + d0, u[1] + d1, u[2] + d2, u[3], u[4]]
                    u2 = [u[0] + 0.5 * d0, u[1] + 0.5 * d1,
                          u[2] + 0.5 * d2, u[3], u[4]]
                    e0 = e_cheap(u)
                    e1 = e_cheap(u1)
                    e2 = e_cheap(u2)
                    b12 = e1 <= e2
                    eb = jnp.where(b12, e1, e2)
                    tk = eb <= e0
                    u = [jnp.where(tk, jnp.where(b12, u1[a], u2[a]), u[a])
                         for a in range(5)]
                return tuple(u)

            # broad phase: finger contact impossible unless the object's
            # bounding circle can reach a finger surface (A/B precomputed in
            # scene_arrays; conservative). Gated per 128-lane block.
            broad_a = scal_ref[0, 0, 14]
            broad_b = scal_ref[0, 0, 15]
            maybe = ((cy <= broad_a + ql) | (cy >= broad_b + qr)) \
                .astype(jnp.float32)
            any_f = (jnp.sum(maybe) > 0.0)
            u = list(jax.lax.cond(any_f,
                                  _full_solve, _cheap_solve, tuple(u_unc)))
            vx, vy, om = u[0], u[1], u[2]
            qdl, qdr = u[3], u[4]
            mf = any_f.astype(jnp.float32)
            cnt_f = cnt_f + mf
            cnt_c = cnt_c + (1.0 - mf)

        return (
            cx + dt * vx, cy + dt * vy, th + dt * om,
            vx, vy, om,
            zb + dt * vz, vz,
            ql + dt * qdl, qr + dt * qdr, qdl, qdr,
            cnt_f, cnt_c,
        )

    def _travel_step(st):
        """Settled-travel fast path (see pallas3d._travel_step): the object
        is a static fixed point of the step map (post-solve velocities ~ 0
        with gravity applied), no finger contact is reachable this step, so
        only the finger servo advances — identical to the engines' no-contact
        unconstrained update. Skips all (P, L) narrow-phase + solver work."""
        (cx, cy, th, vx, vy, om, zb, vz, ql, qr, qdl, qdr,
         cnt_f, cnt_c) = st
        f_l = g.kp * (ctrl_l - ql) - g.joint_damping * qdl
        f_r = g.kp * (ctrl_r - qr) - g.joint_damping * qdr
        qdl = qdl + dt * f_l * inv_fml
        qdr = qdr + dt * f_r * inv_fmr
        return (cx, cy, th, vx, vy, om, zb, vz,
                ql + dt * qdl, qr + dt * qdr, qdl, qdr, cnt_f, cnt_c)

    def step_body(i, st):
        (cx, cy, th, vx, vy, om, zb, vz, ql, qr, qdl, qdr,
         cnt_f, cnt_c, scx, scy, sth) = st
        is_rg = jnp.asarray(False)
        if regrasp_every:
            do_rg = (i % regrasp_every == 0) & (i > 0)
            ql = jnp.where(do_rg, 0.0, ql)
            qr = jnp.where(do_rg, 0.0, qr)
            qdl = jnp.where(do_rg, 0.0, qdl)
            qdr = jnp.where(do_rg, 0.0, qdr)
            vx = jnp.where(do_rg, 0.0, vx)
            vy = jnp.where(do_rg, 0.0, vy)
            om = jnp.where(do_rg, 0.0, om)
            vz = jnp.where(do_rg, 0.0, vz)
            # a regrasp zeroes velocities WITHOUT a solve confirming
            # equilibrium: force a normal step to re-validate.
            is_rg = do_rg

        # ---- settled-travel gate (all (1, L) work) ----
        # settled: post-solve velocities ~ 0 — gravity was applied in that
        # solve, so ~0 means static support, a fixed point of the step map.
        mot = jnp.maximum(jnp.maximum(jnp.abs(vx), jnp.abs(vy)),
                          jnp.maximum(jnp.abs(om), jnp.abs(vz)))
        settled = jnp.max(mot) < EPS_SETTLED
        # no finger contact reachable at the current OR post-step jaw
        # position (same conservative bounding-circle broad phase as the
        # solver's full/cheap gate, scal slots 14/15)
        f_l = g.kp * (ctrl_l - ql) - g.joint_damping * qdl
        f_r = g.kp * (ctrl_r - qr) - g.joint_damping * qdr
        ql_n = ql + dt * (qdl + dt * f_l * inv_fml)
        qr_n = qr + dt * (qdr + dt * f_r * inv_fmr)
        broad_a = scal_ref[0, 0, 14]
        broad_b = scal_ref[0, 0, 15]
        marg = jnp.float32(1e-4)
        maybe = ((cy - marg <= broad_a + jnp.maximum(ql, ql_n))
                 | (cy + marg >= broad_b + jnp.minimum(qr, qr_n)))
        travel = settled & (jnp.sum(maybe.astype(jnp.float32)) == 0.0) \
            & jnp.logical_not(is_rg)

        dyn = (cx, cy, th, vx, vy, om, zb, vz, ql, qr, qdl, qdr,
               cnt_f, cnt_c)
        dyn = jax.lax.cond(travel, _travel_step, _normal_step, dyn)
        (cx, cy, th, vx, vy, om, zb, vz, ql, qr, qdl, qdr,
         cnt_f, cnt_c) = dyn

        take = (i + 1) == snapshot_step
        scx = jnp.where(take, cx, scx)
        scy = jnp.where(take, cy, scy)
        sth = jnp.where(take, th, sth)
        return (cx, cy, th, vx, vy, om, zb, vz, ql, qr, qdl, qdr,
                cnt_f, cnt_c, scx, scy, sth)

    state = jax.lax.fori_loop(0, steps, step_body, state)
    (cx, cy, th, *_r) = state
    cnt_f, cnt_c = state[12], state[13]
    scx, scy, sth = state[14], state[15], state[16]
    if snapshot_step <= 0 or snapshot_step >= steps:
        scx, scy, sth = cx, cy, th

    two_pi = jnp.float32(2.0 * np.pi)
    d_theta = sth - theta0
    d_theta = d_theta - two_pi * jnp.round(d_theta / two_pi)
    c1, s1 = jnp.cos(sth), jnp.sin(sth)
    sorg_x = scx - (c1 * com_bx - s1 * com_by)
    sorg_y = scy - (s1 * com_bx + c1 * com_by)
    c, s = jnp.cos(th), jnp.sin(th)
    org_x = cx - (c * com_bx - s * com_by)
    org_y = cy - (s * com_bx + c * com_by)
    dth_ref[0, 0, :] = d_theta[0, :]
    dpx_ref[0, 0, :] = (sorg_x - pose_x)[0, :]
    dpy_ref[0, 0, :] = (sorg_y - pose_y)[0, :]
    fth_ref[0, 0, :] = jnp.mod(th, two_pi)[0, :]
    fpx_ref[0, 0, :] = org_x[0, :]
    fpy_ref[0, 0, :] = org_y[0, :]
    cfull_ref[0, 0, :] = cnt_f[0, :]
    ccheap_ref[0, 0, :] = cnt_c[0, :]


def profile_batch_pallas(*args, solver=None, **kwargs):
    """Public entry: resolves the default contact solver from
    ``engine2d.SOLVER`` at call time so the kernel and the pure-JAX engine
    switch together (tests assert their parity)."""
    from dgdm_tpu.sim import engine2d as _e2

    if solver is None:
        solver = _e2.SOLVER
    return _profile_batch_pallas(*args, solver=solver, **kwargs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "steps", "dt", "regrasp_every", "solver_iters", "ctrl_mag",
        "snapshot_step", "solver", "newton_iters", "return_step_mix",
    ),
)
def _profile_batch_pallas(
    coefs: jnp.ndarray,       # (B, 2, 6, 4)
    contour: jnp.ndarray,     # (B, P, 2)
    support: jnp.ndarray,     # (B, S, 4): x, y, weight, pad
    scalars: jnp.ndarray,     # (B, 1, 16): see scene_arrays
    poses: jnp.ndarray,       # (N, 3) — N must be a multiple of LANE
    steps: int = SIM.steps_2d,
    dt: float = SIM.dt,
    regrasp_every: int = 0,
    solver_iters: int = SOLVER_ITERS,
    ctrl_mag: float = SIM.ctrl_2d,
    snapshot_step: int = 0,
    solver: str = "jacobi",
    newton_iters: int = NEWTON_KERNEL_ITERS,
    return_step_mix: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Fused rollouts: (B pairs) x (N poses) -> (dtheta (B, N),
    dpos (B, N, 2), final_theta (B, N), final_pos (B, N, 2)).

    ``snapshot_step`` > 0 records delta_theta/delta_pos at that step (the
    first-squeeze profile of the eval schedule) while the rollout continues
    to ``steps``; 0 snapshots at the end (datagen behavior)."""
    b, p = contour.shape[0], contour.shape[1]
    s = support.shape[1]
    n = poses.shape[0]
    assert n % LANE == 0, f"pose count {n} must be a multiple of {LANE}"
    poses_t = poses.T.astype(jnp.float32)          # (3, N)

    kernel = functools.partial(
        _rollout_kernel,
        steps=steps,
        dt=dt,
        regrasp_every=regrasp_every,
        solver_iters=solver_iters,
        ctrl_mag=ctrl_mag,
        snapshot_step=snapshot_step,
        solver=solver,
        newton_iters=newton_iters,
    )
    grid = (b, n // LANE)
    out_shape = [
        jax.ShapeDtypeStruct((b, 1, n), jnp.float32) for _ in range(8)
    ]
    out_specs = [
        pl.BlockSpec((1, 1, LANE), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM)
        for _ in range(8)
    ]
    dth, dpx, dpy, fth, fpx, fpy, cfull, ccheap = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, 6, 4), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 4), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 16), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LANE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(
        coefs.astype(jnp.float32),
        contour.astype(jnp.float32),
        support.astype(jnp.float32),
        scalars.astype(jnp.float32),
        poses_t,
    )
    dth, dpx, dpy, fth, fpx, fpy = (
        a[:, 0, :] for a in (dth, dpx, dpy, fth, fpx, fpy)
    )
    dpos = jnp.stack([dpx, dpy], axis=-1)
    fpos = jnp.stack([fpx, fpy], axis=-1)
    if return_step_mix:
        # (full, cheap) solve counts per (pair, pose-block), lane-broadcast
        # — the measured phase mix for the bench roofline (VERDICT r4 item 2)
        return dth, dpos, fth, fpos, (cfull[:, 0, :], ccheap[:, 0, :])
    return dth, dpos, fth, fpos


def scene_arrays(scenes, calib=None) -> Tuple[jnp.ndarray, ...]:
    """Stacked Scene2D pytree (leading dim B) -> the dense array inputs of
    ``profile_batch_pallas``. ``calib`` (engine2d.Calib, unbatched) rides in
    the scalar slots so fitted contact parameters apply to the fused kernel
    without recompilation."""
    from dgdm_tpu.sim import engine2d as _e2

    if calib is None:
        calib = _e2.default_calib()
    # the fused kernel does not implement per-vertex crack anchors
    # (Scene2D.anchor, triangulation != "uniform" — a rejected-by-default
    # probe feature); refuse to silently drop them on the default TPU path
    anc = np.asarray(scenes.anchor)
    if anc.ndim and anc.shape[-1] > 1 and not np.allclose(anc, 1.0):
        import warnings

        warnings.warn(
            "scene_arrays: non-uniform Scene2D.anchor is ignored by the "
            "Pallas kernel; use the engine path (use_pallas=False) for "
            "anchored triangulations", stacklevel=2)
    # numpy on host (cheap, avoids eager device dispatch), one device_put each
    coefs = np.stack(
        [np.asarray(scenes.coef_l), np.asarray(scenes.coef_r)], axis=1
    )
    spts = np.asarray(scenes.support_pts)
    b, s_ = spts.shape[:2]
    support = np.concatenate(
        [
            spts,
            np.asarray(scenes.support_w)[..., None],
            np.zeros((b, s_, 1), np.float32),
        ],
        axis=-1,
    )
    scal = np.zeros((b, 1, 16), np.float32)
    scal[:, 0, 0] = np.asarray(scenes.mass)
    scal[:, 0, 1] = np.asarray(scenes.inertia)
    scal[:, 0, 2] = np.asarray(scenes.finger_mass)[..., 0]
    scal[:, 0, 3] = np.asarray(scenes.com)[:, 0]
    scal[:, 0, 4] = np.asarray(scenes.com)[:, 1]
    scal[:, 0, 5] = np.asarray(scenes.finger_mass)[..., 1]
    scal[:, 0, 6] = float(calib.mu_plane)
    scal[:, 0, 7] = float(calib.mu_finger)
    scal[:, 0, 8] = float(calib.mu_torsion)
    scal[:, 0, 9] = float(calib.k_contact)
    scal[:, 0, 10] = float(calib.b_contact)
    scal[:, 0, 11] = float(calib.unload)
    scal[:, 0, 12] = float(calib.rough)
    scal[:, 0, 13] = float(getattr(calib, "c_r", 0.0526))
    # broad-phase bounds for the kernel's no-contact fast path: finger
    # contact is impossible unless cy <= A + ql (left) or cy >= B + qr
    # (right), where A/B fold the finger-curve extremum and the object's
    # max COM radius (conservative: ignores the x-window, dense-grid spline
    # extremum padded by 1e-3)
    from dgdm_tpu.core.config import GRIPPER_2D as _g

    h = (_g.ctrl_x_max - _g.ctrl_x_min) / (_g.num_ctrl - 1)
    t = np.linspace(0.0, h, 64, dtype=np.float64)  # (T,)
    # (B, 2, 6, T) per-segment cubic values
    vals = (
        coefs[..., 0:1]
        + coefs[..., 1:2] * t
        + coefs[..., 2:3] * t**2
        + coefs[..., 3:4] * t**3
    )
    fmax_l = vals[:, 0].max(axis=(1, 2)) + 1e-3
    fmin_r = vals[:, 1].min(axis=(1, 2)) - 1e-3
    rel = np.asarray(scenes.contour) - np.asarray(scenes.com)[:, None, :]
    r_max = np.sqrt((rel**2).sum(-1)).max(axis=1)
    scal[:, 0, 14] = (-_g.jaw_offset + _g.width) + fmax_l + r_max   # A
    scal[:, 0, 15] = _g.jaw_offset + fmin_r - r_max                 # B
    return (
        jnp.asarray(coefs),
        scenes.contour,
        jnp.asarray(support),
        jnp.asarray(scal),
    )
