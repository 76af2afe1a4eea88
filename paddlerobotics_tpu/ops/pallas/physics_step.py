"""Pallas megakernel: a full control step (all physics substeps) in VMEM.

The SoA JAX path (sim/sbatch.py) compiles each substep into a chain of
fused elementwise kernels; between fusion boundaries the (k,B) state and
intermediates round-trip through HBM ~10× per control step. This kernel
keeps the entire robot state for a block of envs resident in VMEM and
runs all `action_repeat` substeps in one program — HBM traffic collapses
to one state read + one write per control step.

The *math* is literally the functions from sim/sbatch.py (chain poses,
velocities, penalty contacts, blockwise ABA, semi-implicit integration):
they operate on plain (…, B) arrays, so the kernel calls them on values
loaded from refs. Grid is over env blocks; every array is batch-minor so
the env block occupies the TPU lane dimension.

Covers the full motor interface: POSITION, TORQUE, and HYBRID
(qd_ref/tau_ff extend the PD law, laikago_motor.py:152-166 — always
passed; zeros reproduce POSITION exactly), plus the optional
pd_latency-delayed PD input (minitaur._GetPDObservation:1195-1199;
static taps, zero-cost when cfg.pd_latency == 0). Each substep's
[q|qd|quat|w] snapshot is written to a per-substep stack output so the
caller can maintain the substep-resolution policy-obs latency ring
(minitaur.ReceiveObservation:1151-1170) outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from paddlerobotics_tpu.core.config import SimConfig
from paddlerobotics_tpu.sim import a1_model as a1
from paddlerobotics_tpu.sim import sbatch
from paddlerobotics_tpu.sim.sbatch import (BContact, BDynParams, BQuadState,
                                           BRobot, F32, OBS_ROW)

_PARAM_FIELDS = list(BDynParams._fields)


def _kernel(*refs, cfg: SimConfig, h_fn, torque_mode: bool, n_in: int,
            taps, stack_rows: int):
    in_refs = refs[:n_in]
    out_refs = refs[n_in:]
    (pos_r, quat_r, w_r, v_r, q_r, qd_r, prev_r, act_r, qdref_r,
     tauff_r) = in_refs[:10]
    k = 10
    if taps:
        ph_r = in_refs[k]
        k += 1
    n_params = len(_PARAM_FIELDS)
    p_refs = in_refs[k:k + n_params]
    c_refs = in_refs[k + n_params:]
    params = BDynParams(*[r[...] for r in p_refs])
    C = sbatch.unpack_consts(*[r[...] for r in c_refs])
    stack_r = out_refs[-1]

    n = cfg.action_repeat
    prev = prev_r[...]
    act = act_r[...]
    qd_ref = qdref_r[...]
    tau_ff = tauff_r[...]
    inertias = sbatch.build_inertias(params, C)

    state0 = (pos_r[...], quat_r[...], w_r[...], v_r[...], q_r[...],
              qd_r[...])
    B = state0[0].shape[-1]
    aux0 = (jnp.zeros((12, B), F32),        # tau
            jnp.zeros((3, 4, B), F32),      # foot_pos
            jnp.zeros((4, B), F32),         # foot_contact
            jnp.zeros((4, B), F32),         # knee_contact
            jnp.zeros((B,), F32))           # base_contact
    ph0 = ph_r[...] if taps else jnp.zeros((1, 1, B), F32)

    def body(i, carry):
        (pos, quat, w, v, q, qd), _, ph = carry
        s = BQuadState(pos=pos, quat=quat, w=w, v=v, q=q, qd=qd)
        if cfg.enable_action_interpolation and not torque_mode:
            t = (i + 1.0) / n
            cmd = prev + t * (act - prev)
        else:
            cmd = act
        if torque_mode:
            tau = jnp.clip(cmd, -a1.TORQUE_LIMIT[0], a1.TORQUE_LIMIT[0])
        else:
            if taps:
                _, i0, i1, alpha = taps
                pd_row = (1.0 - alpha) * ph[i0] + alpha * ph[i1]
                q_in, qd_in = pd_row[:12], pd_row[12:24]
            else:
                q_in, qd_in = s.q, s.qd
            tau = (-params.motor_kp * (q_in - cmd) -
                   params.motor_kd * (qd_in - qd_ref) + tau_ff)
            tau = jnp.clip(tau, -a1.TORQUE_LIMIT[0], a1.TORQUE_LIMIT[0])

        poses = sbatch._chain_poses(s, C)
        vels = sbatch.chain_velocities(s, poses, C)
        contact, foot_f, knee_f, base_f = sbatch.compute_contacts(
            s, poses, vels, h_fn, params, cfg)
        a0, qdd = sbatch.forward_dynamics(
            s, tau, foot_f, knee_f, base_f, params, poses, vels, C,
            inertias=inertias)
        ns = sbatch.integrate(s, a0, qdd, cfg.substep_dt, cfg)
        row = jnp.concatenate([ns.q, ns.qd, ns.quat, ns.w], axis=0)
        # only the newest `stack_rows` snapshots are ever read when the
        # obs ring is a single control step (batched_env._hist_len) —
        # skip the dead writes (ring HBM traffic drops n/stack_rows ×)
        if stack_rows == n:
            stack_r[pl.dslice(i, 1)] = row[None]
        else:
            @pl.when(i >= n - stack_rows)
            def _():
                stack_r[pl.dslice(i - (n - stack_rows), 1)] = row[None]
        if taps:
            ph = jnp.concatenate([row[None, :24], ph[:-1]], axis=0)
        aux = (tau, contact.foot_pos,
               contact.foot_contact.astype(F32),
               contact.knee_contact.astype(F32),
               contact.base_contact.astype(F32))
        return (ns.pos, ns.quat, ns.w, ns.v, ns.q, ns.qd), aux, ph

    (pos, quat, w, v, q, qd), aux, _ = jax.lax.fori_loop(
        0, n, body, (state0, aux0, ph0))
    tau, foot_pos, fcon, kcon, bcon = aux
    outs = (pos, quat, w, v, q, qd, tau, foot_pos, fcon, kcon, bcon)
    for r, val in zip(out_refs[:-1], outs):
        r[...] = val


@functools.partial(jax.jit, static_argnames=("cfg", "h_fn", "torque_mode",
                                             "block_b", "interpret"))
def control_step_pallas(rb: BRobot, action: jnp.ndarray, p: BDynParams,
                        cfg: SimConfig, h_fn, torque_mode: bool = False,
                        qd_ref: jnp.ndarray | None = None,
                        tau_ff: jnp.ndarray | None = None,
                        block_b: int = 1024,
                        interpret: bool = False) -> BRobot:
    """Drop-in replacement for sbatch.control_step via the megakernel."""
    s = rb.s
    B = s.pos.shape[-1]
    blk = min(block_b, B)
    assert B % blk == 0, (B, blk)
    grid = (B // blk,)
    n = cfg.action_repeat
    L = rb.obs_hist.shape[0]
    # same two ring regimes as sbatch.control_step: single-step ring
    # (L <= n, full overwrite) or long ring (block writes never wrap)
    assert L <= n or L % n == 0, (L, n)
    S = min(L, n)               # snapshot rows the ring can consume
    taps = sbatch.pd_delay_taps(cfg, L)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec(tuple(shape[:-1]) + (blk,),
                            lambda b, _nd=nd: (0,) * (_nd - 1) + (b,))

    zeros12 = jnp.zeros((12, B), F32)
    state_in = (s.pos, s.quat, s.w, s.v, s.q, s.qd, rb.last_action,
                jnp.asarray(action, F32),
                zeros12 if qd_ref is None else jnp.asarray(qd_ref, F32),
                zeros12 if tau_ff is None else jnp.asarray(tau_ff, F32))
    if taps:
        state_in += (sbatch.pd_ring_seed(rb, taps),)
    param_in = tuple(jnp.asarray(getattr(p, f), F32)
                     for f in _PARAM_FIELDS)
    const_in = tuple(jnp.asarray(sbatch.CONST_INPUTS[k], F32)
                     for k in sbatch.CONST_ORDER)
    inputs = state_in + param_in + const_in
    in_specs = [bspec(x.shape) for x in state_in + param_in]
    # constants are un-batched: full-array blocks
    in_specs += [
        pl.BlockSpec(c.shape, lambda b, _nd=c.ndim: (0,) * _nd)
        for c in const_in]

    out_shapes = [
        jax.ShapeDtypeStruct((3, B), F32), jax.ShapeDtypeStruct((4, B), F32),
        jax.ShapeDtypeStruct((3, B), F32), jax.ShapeDtypeStruct((3, B), F32),
        jax.ShapeDtypeStruct((12, B), F32),
        jax.ShapeDtypeStruct((12, B), F32),
        jax.ShapeDtypeStruct((12, B), F32),          # tau
        jax.ShapeDtypeStruct((3, 4, B), F32),        # foot_pos
        jax.ShapeDtypeStruct((4, B), F32),           # foot_contact
        jax.ShapeDtypeStruct((4, B), F32),           # knee_contact
        jax.ShapeDtypeStruct((B,), F32),             # base_contact
        jax.ShapeDtypeStruct((S, OBS_ROW, B), F32),  # newest substep rows
    ]
    out_specs = [bspec(o.shape) for o in out_shapes]

    outs = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg, h_fn=h_fn,
                          torque_mode=torque_mode, n_in=len(inputs),
                          taps=taps, stack_rows=S),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*inputs)
    (pos, quat, w, v, q, qd, tau, foot_pos, fcon, kcon, bcon,
     rows) = outs

    ns = BQuadState(pos=pos, quat=quat, w=w, v=v, q=q, qd=qd)
    contact = BContact(foot_pos=foot_pos, foot_contact=fcon > 0.5,
                       knee_contact=kcon > 0.5, base_contact=bcon > 0.5)
    hist, head = sbatch.ring_push(rb.obs_hist, rb.hist_head, rows)
    return BRobot(s=ns, last_action=jnp.asarray(action, F32), tau=tau,
                  contact=contact, obs_hist=hist, hist_head=head)
