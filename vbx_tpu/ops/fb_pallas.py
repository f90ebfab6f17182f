"""Pallas TPU kernels for the scaled forward-backward recursions.

Why: the XLA `lax.scan` path executes T sequential device steps of tiny
[B, S] work — per-step dispatch dominates while the arithmetic is ~20 us.
These kernels run the whole recursion inside one kernel invocation:
per-frame state lives in registers/VMEM, the T loop is a `fori_loop`, and
each step is a handful of VPU ops on an [8, 128] tile. Same scaled
linear-domain math as ops.forward_backward.forward_backward_structured (see
its docstring for the derivation); outputs are the normalized messages
(ahat, bhat) and per-step forward normalizers, from which gamma/log_px/
pi_stat are assembled by (fully fusable) XLA elementwise/reduction ops
outside. bhat rows carry an arbitrary per-frame scale (gamma/pi_stat are
scale-invariant in bhat — do not compare bhat against the sequential
smoother directly).

Layout: [T, B, S_pad] time-major so each frame step reads one
[B_blk, S_pad] tile; batch on sublanes (blocks of 8), speakers padded to
128 lanes. Padded speaker lanes carry w == 0, so they contribute exactly
nothing to any sum (parity with the masked sequential path).

Padding of the FRAME axis needs no in-kernel masking at all: padded frames
(always a suffix) get UNIFORM emission weights. Going forward nothing valid
follows them, and going backward a uniform w keeps the carry exactly
uniform (b_i = lp*u_i + sum_j col_j u_j is i-independent for uniform u), so
the message entering the last valid frame is the same scale-invariant
uniform vector the sequential smoother starts from. Callers mask
gamma/log_px/pi_stat by frame validity outside — the kernel inner loop is
branch-free.

T is chunked via the grid (sequential innermost grid dimension, carry in
VMEM scratch; the backward kernel walks chunks in reverse via its
index_map), so VMEM holds only one [T_chunk, B_blk, S_pad] block per array
and T is unbounded.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_BLK = 8        # f32 sublane tile
S_PAD = 128      # lane tile
T_CHUNK = 512

_TINY = 1e-37


def _round_up(x: int, q: int) -> int:
    return -(-x // q) * q


def _fwd_kernel(w_ref, col_ref, pinit_ref, lp_ref,
                ahat_ref, cfw_ref, carry_ref):
    k = pl.program_id(1)
    Tc = w_ref.shape[0]
    lp = lp_ref[0, 0]
    col = col_ref[0]
    pinit = pinit_ref[0]

    @pl.when(k == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    def step(t, prev):
        is_first = jnp.logical_and(k == 0, t == 0)
        w_t = w_ref[t]                                   # [B_blk, S_pad]
        a = jnp.where(is_first, w_t * pinit,
                      w_t * (lp * prev + col))
        c = jnp.maximum(jnp.sum(a, axis=-1, keepdims=True),
                        jnp.float32(_TINY))              # [B_blk, 1]
        ahat = a / c
        ahat_ref[t] = ahat
        # lane-dim dynamic stores must be 128-aligned on TPU, so the
        # per-frame normalizer is written lane-broadcast and sliced outside
        cfw_ref[t] = jnp.broadcast_to(c, ahat.shape)
        return ahat

    carry_ref[:] = jax.lax.fori_loop(0, Tc, step, carry_ref[:])


def _bwd_kernel(w_next_ref, col_ref, lp_ref, bhat_ref, carry_ref):
    """w_next_ref holds the ONE-FRAME-SHIFTED view (index t == original
    t+1), so the cross-chunk-boundary read at the top of each chunk never
    leaves the block. Chunk counter k walks time chunks in REVERSE (k == 0
    is the last chunk)."""
    k = pl.program_id(1)
    Tc = w_next_ref.shape[0]
    lp = lp_ref[0, 0]
    col = col_ref[0]
    Sp = bhat_ref.shape[-1]

    @pl.when(k == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref, 1.0 / Sp)

    def step(i, nxt):
        t = Tc - 1 - i
        is_last = jnp.logical_and(k == 0, i == 0)  # global final frame
        u = w_next_ref[t] * nxt                    # w[orig t+1] * bhat_{t+1}
        b = lp * u + jnp.sum(col * u, axis=-1, keepdims=True)
        c = jnp.maximum(jnp.sum(b, axis=-1, keepdims=True),
                        jnp.float32(_TINY))
        out = jnp.where(is_last, jnp.full_like(u, 1.0 / Sp), b / c)
        bhat_ref[t] = out
        return out

    carry_ref[:] = jax.lax.fori_loop(0, Tc, step, carry_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def fb_scan_pallas(w: jax.Array, valid: jax.Array, col: jax.Array,
                   pinit: jax.Array, loop_prob,
                   interpret: bool = False
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run both scaled recursions.

    w:      [T, B, S] per-frame emission weights exp(log_p - m) (padded
            speakers MUST be exactly 0; padded-frame values are ignored).
    valid:  [T, B] float/bool frame validity (False = padding suffix;
            frame 0 must be valid). Outputs at invalid frames are
            arbitrary — mask them downstream.
    col:    [B, S] transition column (1-loopP)*pi + eps.
    pinit:  [B, S] pi + eps initial weights.
    Returns (ahat [T, B, S], bhat [T, B, S], cfw [T, B]).
    """
    T, B, S = w.shape
    Tp, Bp, Sp = _round_up(T, T_CHUNK), _round_up(B, B_BLK), S_PAD
    if S > S_PAD:
        raise ValueError(f"S={S} > {S_PAD} lanes; shard speakers first")

    # padded/invalid frames -> uniform emissions (see module docstring);
    # padded speaker lanes stay 0 only on valid frames, which is what the
    # downstream masking relies on.
    vmask = valid.astype(jnp.float32)
    w = (w.astype(jnp.float32) * vmask[:, :, None]
         + (1.0 - vmask[:, :, None]) / Sp)
    wp = jnp.full((Tp, Bp, Sp), 1.0 / Sp, jnp.float32)
    wp = wp.at[:T, :B, :].set(
        jnp.zeros((T, B, Sp), jnp.float32).at[:, :, :S].set(w))
    colp = jnp.zeros((1, Bp, Sp), jnp.float32).at[0, :B, :S].set(
        col.astype(jnp.float32))
    pinitp = jnp.zeros((1, Bp, Sp), jnp.float32).at[0, :B, :S].set(
        pinit.astype(jnp.float32))
    lp = jnp.asarray(loop_prob, jnp.float32).reshape(1, 1)

    nb, nt = Bp // B_BLK, Tp // T_CHUNK

    def chunk3(i, kk):
        return (kk, i, 0)

    def bcast3(i, kk):
        return (0, i, 0)

    ahat, cfw = pl.pallas_call(
        _fwd_kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((T_CHUNK, B_BLK, Sp), chunk3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_BLK, Sp), bcast3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_BLK, Sp), bcast3, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((T_CHUNK, B_BLK, Sp), chunk3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_CHUNK, B_BLK, Sp), chunk3,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp, Sp), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Bp, Sp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B_BLK, Sp), jnp.float32)],
        interpret=interpret,
    )(wp, colp, pinitp, lp)

    # one-frame-shifted view for the backward pass (see _bwd_kernel)
    w_sh = jnp.concatenate([wp[1:], wp[:1]], axis=0)

    def rchunk3(i, kk):
        return (nt - 1 - kk, i, 0)

    bhat = pl.pallas_call(
        _bwd_kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((T_CHUNK, B_BLK, Sp), rchunk3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_BLK, Sp), bcast3, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((T_CHUNK, B_BLK, Sp), rchunk3,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, Bp, Sp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B_BLK, Sp), jnp.float32)],
        interpret=interpret,
    )(w_sh, colp, lp)

    return ahat[:T, :B, :S], bhat[:T, :B, :S], cfw[:T, :B, 0]
