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

Two layouts, both time-major, both with a FUSED bidirectional kernel as
the default (forward and backward recursions advance in the same
sequential walk — half the step count of the two-pass form; per-frame
normalizers are reconstructed outside in one fused XLA pass):

- `fb_scan_pallas_sb` — [T, S_pad8, B_pad128]: speakers on SUBLANES
  (padded to a multiple of 8), batch on lanes. ~4x less VMEM/HBM traffic
  at diarization-typical S~32, no shifted-w copy (the backward pass
  carries its block-boundary frame in scratch between grid steps), and
  every per-recording reduction is per-lane, so a recording's result is
  bit-identical regardless of batch size/position. The engine's pallas
  path (engine.vbhmm._vbx_batched_pallas_sb_jit).
- `fb_scan_pallas` — [T, B_blk, S_pad128]: batch on sublanes (blocks of
  8/16/32 via _pick_blocks), speakers padded to 128 lanes. The general
  [T, B, S] API; also keeps the original two-pass kernels (fused=False).

Padded speaker entries carry w == 0, so they contribute exactly nothing
to any sum (parity with the masked sequential path).

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

B_BLK = 8        # f32 sublane tile (two-pass kernels)
S_PAD = 128      # lane tile (the [T, B, S->128] layout's structural cap)
# The sb layout holds speakers on SUBLANES, where the extent is just a
# tile count — S up to 256 lowers and matches the structured engine at
# tolerance (round 5; interpret-validated, VMEM bounded by t_chunk).
# Beyond 256 the VMEM slots shrink t_chunk toward the latency-bound
# regime and no diarization corpus comes close — the engine falls back
# to 'structured' with a warning there (VBx.py:97-98 has no S limit).
S_PAD_SB = 256
T_CHUNK = 512    # (two-pass kernels)

_TINY = 1e-37


def _round_up(x: int, q: int) -> int:
    return -(-x // q) * q


def _pick_blocks(B: int) -> Tuple[int, int]:
    """(B_blk, T_chunk) for the fused kernel: batch blocks as large as the
    batch allows (amortizes the per-step loop overhead over more VPU tiles),
    T chunks sized to keep each [T_chunk, B_blk, 128] f32 block at 1 MiB so
    four double-buffered streams fit comfortably in ~16 MiB VMEM."""
    if B <= 8:
        b_blk = 8
    elif B <= 16:
        b_blk = 16
    else:
        b_blk = 32
    return b_blk, (1 << 20) // (b_blk * S_PAD * 4)


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


def _fused_kernel(wf_ref, wb_ref, col_ref, pinit_ref, lp_ref,
                  ahat_ref, bhat_ref, fcarry_ref, bcarry_ref):
    """Both recursions in ONE sequential walk: grid step k advances the
    forward pass through time chunk k while the backward pass (whose chunks
    are mapped in reverse by its index_map) retreats through chunk nt-1-k.
    Each fori step does one forward and one backward frame — half the
    sequential step count of the two-pass kernels, and the per-frame
    normalizers are reconstructed outside from ahat (one fused XLA
    elementwise pass), dropping a whole [T, B, 128] VMEM/HBM stream.

    wb_ref holds the ONE-FRAME-SHIFTED emissions (index t == original t+1)
    so the backward step never reads across its block boundary."""
    k = pl.program_id(1)
    Tc = wf_ref.shape[0]
    lp = lp_ref[0, 0]
    col = col_ref[0]
    pinit = pinit_ref[0]
    Sp = ahat_ref.shape[-1]

    @pl.when(k == 0)
    def _():
        fcarry_ref[:] = jnp.zeros_like(fcarry_ref)
        bcarry_ref[:] = jnp.full_like(bcarry_ref, 1.0 / Sp)

    def step(i, carry):
        fprev, bnext = carry
        at_end = jnp.logical_and(k == 0, i == 0)   # fwd: global frame 0;
        # bwd: global final frame (its chunks walk in reverse)
        w_t = wf_ref[i]
        a = jnp.where(at_end, w_t * pinit, w_t * (lp * fprev + col))
        c = jnp.maximum(jnp.sum(a, axis=-1, keepdims=True),
                        jnp.float32(_TINY))
        af = a / c
        ahat_ref[i] = af

        j = Tc - 1 - i
        u = wb_ref[j] * bnext                      # w[orig t+1] * bhat_{t+1}
        b = lp * u + jnp.sum(col * u, axis=-1, keepdims=True)
        cb = jnp.maximum(jnp.sum(b, axis=-1, keepdims=True),
                         jnp.float32(_TINY))
        bf = jnp.where(at_end, jnp.full_like(u, 1.0 / Sp), b / cb)
        bhat_ref[j] = bf
        return af, bf

    fcarry_ref[:], bcarry_ref[:] = jax.lax.fori_loop(
        0, Tc, step, (fcarry_ref[:], bcarry_ref[:]))


def _fused_kernel_sb(wf_ref, wb_ref, col_ref, pinit_ref, binit_ref, lp_ref,
                     ahat_ref, bhat_ref, cfw_ref,
                     fcarry_ref, bcarry_ref, wsave_ref, *,
                     recip: bool = False, skip_dead: bool = False):
    """Speakers-on-SUBLANES variant of _fused_kernel: tiles are
    [S_pad8, B_pad128] so the speaker axis pads to a multiple of 8 instead
    of 128 lanes — ~4x less VMEM/HBM traffic at diarization-typical S~32 —
    and there is no separate one-frame-shifted w copy: the backward pass
    reads w[t+1] inside its own block and carries the block-boundary frame
    between grid steps in wsave_ref (chunks walk in reverse, so the frame
    needed at the top of chunk c is chunk c+1's first frame, saved on the
    previous grid step). Reductions are sublane sums (axis 0 of the tile).
    The forward normalizer c is emitted per frame on a narrow [8, Bp] tile
    (sublane-broadcast; lane-dim stores must be 128-aligned) so callers
    never re-derive it with an extra full-[T,S,B] pass.

    Arithmetic is float32 regardless of the stream dtype: loads upcast,
    stores downcast. With bfloat16 streams (fb_scan_pallas_sb io_dtype)
    the w/ahat/bhat HBM bytes halve; carries, normalizers (cfw) and the
    boundary-frame scratch stay f32.

    pinit/binit are the BOUNDARY messages: at the walk's first frame the
    forward pass emits normalize(w0 * pinit), and at its last frame the
    backward pass emits binit verbatim (carry init likewise). The
    single-recording callers pass pinit = pi + eps and binit = uniform
    (the sequential smoother's endpoints); the frame-sharded blockwise
    path (parallel.fb_blockwise) passes each chip's incoming block
    boundary messages instead — same kernel, same walk.

    skip_dead (static): frames whose w column is ALL ZERO become exact
    no-ops in both directions (carry and emission keep the neighboring
    message; cfw = 1). The uniform-padded-frame trick in the module
    docstring preserves only a UNIFORM backward carry through a padding
    suffix; a boundary binit needs the padding to be literally skipped, so
    the blockwise path zeroes padded frames and sets this flag. The
    single-recording path keeps skip_dead=False — its walk is unchanged
    to the bit."""
    k = pl.program_id(0)
    Tc = wf_ref.shape[0]
    lp = lp_ref[0, 0]
    col = col_ref[:]
    pinit = pinit_ref[:]
    io_dtype = ahat_ref.dtype

    @pl.when(k == 0)
    def _():
        fcarry_ref[:] = jnp.zeros_like(fcarry_ref)
        bcarry_ref[:] = binit_ref[:]
        wsave_ref[:] = jnp.zeros_like(wsave_ref)   # consumed only at the
        # overridden global-final frame; zeros keep the dead lanes finite

    w_boundary = wsave_ref[:]            # chunk (nt-k)'s first frame (k>0)

    def step(i, carry):
        fprev, bnext = carry
        at_end = jnp.logical_and(k == 0, i == 0)
        w_t = wf_ref[i].astype(jnp.float32)           # [Sp, Bp]
        a = jnp.where(at_end, w_t * pinit, w_t * (lp * fprev + col))
        c_raw = jnp.sum(a, axis=0, keepdims=True)
        c = jnp.maximum(c_raw, jnp.float32(_TINY))
        # recip: normalize by multiplying with the reciprocal computed once
        # on the narrow [1, Bp] row instead of a full-tile broadcast divide
        # (1-ulp different; the pallas path is tolerance-parity)
        af = a * (1.0 / c) if recip else a / c
        if skip_dead:
            flive = c_raw > jnp.float32(_TINY)
            af = jnp.where(flive, af, fprev)
            c = jnp.where(flive, c, 1.0)
        ahat_ref[i] = af.astype(io_dtype)
        cfw_ref[i] = jnp.broadcast_to(c, cfw_ref.shape[1:])

        j = Tc - 1 - i
        w_next = jnp.where(i == 0, w_boundary,
                           wb_ref[jnp.minimum(j + 1, Tc - 1)]
                           .astype(jnp.float32))
        u = w_next * bnext
        b = lp * u + jnp.sum(col * u, axis=0, keepdims=True)
        cb_raw = jnp.sum(b, axis=0, keepdims=True)
        cb = jnp.maximum(cb_raw, jnp.float32(_TINY))
        bn = b * (1.0 / cb) if recip else b / cb
        if skip_dead:
            bn = jnp.where(cb_raw > jnp.float32(_TINY), bn, bnext)
        bf = jnp.where(at_end, binit_ref[:], bn)
        bhat_ref[j] = bf.astype(io_dtype)
        return af, bf

    fcarry_ref[:], bcarry_ref[:] = jax.lax.fori_loop(
        0, Tc, step, (fcarry_ref[:], bcarry_ref[:]))
    # this chunk's first frame, for grid step k+1 (f32 scratch)
    wsave_ref[:] = wb_ref[0].astype(jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "recip", "io_dtype"))
def fb_scan_pallas_sb(w: jax.Array, valid: jax.Array, col: jax.Array,
                      pinit: jax.Array, loop_prob,
                      interpret: bool = False, recip: bool = False,
                      io_dtype=jnp.float32, binit=None,
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused bidirectional smoother in [T, S, B] layout (speakers on
    sublanes, batch on lanes) — the batched-throughput path for B > ~16.

    w:      [T, S, B] emission weights (padded speakers exactly 0 on valid
            frames; padded-frame values ignored).
    valid:  [T, B] frame validity (False = padding suffix).
    col:    [S, B] transition column (1-loopP)*pi + eps.
    pinit:  [S, B] pi + eps.
    io_dtype: dtype of the w/ahat/bhat HBM streams (float32 default, or
            bfloat16 to halve the kernel's HBM traffic; all in-kernel
            arithmetic stays float32 — see _fused_kernel_sb).
    Returns (ahat [T, S, B], bhat [T, S, B], cfw [T, B]); ahat/bhat carry
    io_dtype, cfw is always float32.
    """
    T, S, B = w.shape
    io_dtype = jnp.dtype(io_dtype)
    Sp, Bp, Tp, t_chunk, nt = _sb_geometry(T, S, B, io_dtype)

    vmask = valid.astype(jnp.float32)                     # [T, B]
    wu = (w.astype(jnp.float32) * vmask[:, None, :]
          + (1.0 - vmask[:, None, :]) / Sp).astype(io_dtype)  # [T, S, B]
    wp = _sb_pad_w(wu, Sp, Bp, Tp, io_dtype)
    ahat, bhat, cfw_b = _sb_pallas(wp, col, pinit, loop_prob,
                                   Sp=Sp, Bp=Bp, nt=nt, t_chunk=t_chunk,
                                   interpret=interpret, recip=recip,
                                   io_dtype=io_dtype, binit=binit)
    return ahat[:T, :S, :B], bhat[:T, :S, :B], cfw_b[:T, 0, :B]


def _sb_geometry(T: int, S: int, B: int, io_dtype):
    """(Sp, Bp, Tp, t_chunk, nt) for the sb kernel's padded streams."""
    if S > S_PAD_SB:
        raise ValueError(f"S={S} > {S_PAD_SB}; shard speakers first")
    # bf16 tiles pack sublane pairs: the second-minor axis tiles at 16
    Sp = _round_up(S, 8 if io_dtype.itemsize == 4 else 16)
    Bp = _round_up(B, 128)
    # four double-buffered [t_chunk, Sp, Bp] streams (two w views, ahat,
    # bhat) + scratch + the buffered [Sp, Bp] broadcast operands must fit
    # the 16 MiB scoped VMEM; 13 MiB budget minus 7 frame-slots of fixed
    # overhead leaves the compiler comfortable slack (observed: the
    # compiler accounts more than the naive 8*block sum at large Bp)
    frame_bytes = Sp * Bp * io_dtype.itemsize
    # per-frame VMEM: four double-buffered [Sp, Bp] streams (two w views,
    # ahat, bhat) + the double-buffered [8, Bp] f32 cfw row
    t_chunk = ((13 << 20) - 7 * frame_bytes) \
        // (8 * frame_bytes + 2 * 8 * Bp * 4)
    if t_chunk < 1:
        # even a one-frame chunk double-buffers 8 [Sp, Bp] slots; past this
        # point the kernel cannot fit VMEM and Mosaic would fail at
        # lowering with an opaque allocation error — reject clearly instead
        raise ValueError(
            f"batch too wide for the fused sb kernel's VMEM budget "
            f"(S_pad={Sp}, B_pad={Bp}, ~{8 * frame_bytes >> 20} MiB of "
            f"frame slots): split the batch (smaller max_batch_frames) or "
            f"use fb_impl='structured'")
    Tp = _round_up(T, t_chunk)
    return Sp, Bp, Tp, t_chunk, Tp // t_chunk


def _sb_pad_w(wu, Sp: int, Bp: int, Tp: int, io_dtype):
    """[T, S, B] valid-masked weights -> the kernel's padded [Tp, Sp, Bp]
    stream: padded speaker/batch lanes 0, padded frame rows uniform 1/Sp
    (see module docstring). One pad + one where — XLA fuses both into the
    w producer, writing the padded stream directly (the previous
    two-step .at[].set form materialized an extra full-size copy per EM
    iteration, measured ~9% of the while-body)."""
    T, S, B = wu.shape
    wp = jnp.pad(wu, ((0, Tp - T), (0, Sp - S), (0, Bp - B)))
    if Tp > T:
        tmask = (jnp.arange(Tp) < T)[:, None, None]
        wp = jnp.where(tmask, wp, jnp.asarray(1.0 / Sp, io_dtype))
    return wp


def _sb_pallas(wp, col, pinit, loop_prob, *, Sp, Bp, nt, t_chunk,
               interpret, recip, io_dtype, binit=None,
               skip_dead: bool = False):
    """Invoke the fused sb kernel on a pre-padded [Tp, Sp, Bp] stream.
    col/pinit/binit are the UNPADDED [S, B] operands; binit=None is the
    sequential smoother's uniform backward start (the blockwise path
    passes each chip's incoming boundary message instead)."""
    S, B = col.shape
    colp = jnp.zeros((Sp, Bp), jnp.float32).at[:S, :B].set(
        col.astype(jnp.float32))
    pinitp = jnp.zeros((Sp, Bp), jnp.float32).at[:S, :B].set(
        pinit.astype(jnp.float32))
    if binit is None:
        binitp = jnp.full((Sp, Bp), 1.0 / Sp, jnp.float32)
    else:
        # padded entries: zeros are safe (they only ever multiply the
        # zeroed padded lanes of w)
        binitp = jnp.zeros((Sp, Bp), jnp.float32).at[:S, :B].set(
            binit.astype(jnp.float32))
    lp = jnp.asarray(loop_prob, jnp.float32).reshape(1, 1)
    Tp = nt * t_chunk

    def chunk3(kk):
        return (kk, 0, 0)

    def rchunk3(kk):
        return (nt - 1 - kk, 0, 0)

    def bcast2(kk):
        return (0, 0)

    return pl.pallas_call(
        functools.partial(_fused_kernel_sb, recip=recip,
                          skip_dead=skip_dead),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((t_chunk, Sp, Bp), chunk3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, Sp, Bp), rchunk3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp, Bp), bcast2, memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp, Bp), bcast2, memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp, Bp), bcast2, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_chunk, Sp, Bp), chunk3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, Sp, Bp), rchunk3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, 8, Bp), chunk3,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Sp, Bp), io_dtype),
            jax.ShapeDtypeStruct((Tp, Sp, Bp), io_dtype),
            jax.ShapeDtypeStruct((Tp, 8, Bp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Sp, Bp), jnp.float32),
                        pltpu.VMEM((Sp, Bp), jnp.float32),
                        pltpu.VMEM((Sp, Bp), jnp.float32)],
        interpret=interpret,
    )(wp, wp, colp, pinitp, binitp, lp)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "recip", "io_dtype", "zero_invalid"))
def fb_scan_pallas_sb_logp(log_p, smask_sb, valid, col, pinit, loop_prob,
                           interpret: bool = False, recip: bool = False,
                           io_dtype=jnp.float32, binit=None,
                           zero_invalid: bool = False):
    """fb_scan_pallas_sb that BUILDS w from the log-likelihoods in one
    fused producer: m = max_s(log_p), w = exp(log_p - m) * smask, valid
    masking, and the kernel's frame/speaker/batch padding all land in a
    single XLA loop fusion writing the padded stream directly — the engine
    previously materialized w unpadded (one full write + read) and a
    separate padded copy per EM iteration.

    log_p:    [T, S, B] float32 (padded speakers already masked to -inf).
    smask_sb: [S, B] speaker validity.
    zero_invalid (static): pad/invalid frames become ALL-ZERO w columns
    and the kernel walk SKIPS them exactly (skip_dead) instead of the
    uniform-emission trick — required whenever binit is a non-uniform
    boundary message (see _fused_kernel_sb docstring).
    Returns (ahat, bhat, cfw [T, B], m [T, B], w [T, S, B] io_dtype) —
    m and w are the byproducts the engine's ELBO/pi_stat consume.
    """
    T, S, B = log_p.shape
    io_dtype = jnp.dtype(io_dtype)
    Sp, Bp, Tp, t_chunk, nt = _sb_geometry(T, S, B, io_dtype)

    vmask = valid.astype(jnp.float32)                     # [T, B]
    m = jnp.max(log_p, axis=1)                            # [T, B]
    w_core = jnp.exp(log_p - m[:, None, :]) * smask_sb[None]
    if zero_invalid:
        wu = (w_core * vmask[:, None, :]).astype(io_dtype)
        wp = jnp.pad(wu, ((0, Tp - T), (0, Sp - S), (0, Bp - B)))
    else:
        wu = (w_core * vmask[:, None, :]
              + (1.0 - vmask[:, None, :]) / Sp).astype(io_dtype)
        wp = _sb_pad_w(wu, Sp, Bp, Tp, io_dtype)
    ahat, bhat, cfw_b = _sb_pallas(wp, col, pinit, loop_prob,
                                   Sp=Sp, Bp=Bp, nt=nt, t_chunk=t_chunk,
                                   interpret=interpret, recip=recip,
                                   io_dtype=io_dtype, binit=binit,
                                   skip_dead=zero_invalid)
    return (ahat[:T, :S, :B], bhat[:T, :S, :B], cfw_b[:T, 0, :B],
            m, wp[:T, :S, :B])


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "recip", "io_dtype", "zero_invalid"))
def fb_scan_pallas_sb_logp_bts(log_p_bts, smask_bs, valid, col, pinit,
                               loop_prob, interpret: bool = False,
                               recip: bool = False,
                               io_dtype=jnp.float32, binit=None,
                               zero_invalid: bool = False):
    """fb_scan_pallas_sb_logp that takes the log-likelihoods in the
    E-step dot's NATIVE [B, T, S] layout. The [T, S, B] form forced XLA to
    re-lay the dot's f32 output out before the w producer could read it —
    a full [T, S, B] f32 relayout copy every EM iteration (~9% of
    executable time in the round-4 trace, the copy.56 the battery_r3
    analysis attributed to convergence freezing; VERDICT r3 #2). Here the
    max-shift reduces over the MINOR axis of the dot output and the single
    unavoidable transpose happens inside the w PRODUCER at io_dtype width
    (half the f32 relayout's bytes under bfloat16 streams), fused with the
    exp/masking/padding writes.

    log_p_bts: [B, T, S] float32 (padded speakers already -inf via mask).
    smask_bs:  [B, S] speaker validity.
    valid:     [T, B] frame validity.
    col/pinit: [S, B] (kernel layout, as fb_scan_pallas_sb_logp).
    binit/zero_invalid: boundary-message / exact-padding-skip semantics
    exactly as fb_scan_pallas_sb_logp (the frame-sharded blockwise path
    passes each chip's incoming boundary messages and needs padded
    frames literally skipped).
    Returns (ahat, bhat, cfw [T, B], m [T, B], w [T, S, B] io_dtype).
    """
    B, T, S = log_p_bts.shape
    io_dtype = jnp.dtype(io_dtype)
    Sp, Bp, Tp, t_chunk, nt = _sb_geometry(T, S, B, io_dtype)

    vmask = valid.astype(jnp.float32)                     # [T, B]
    m_bt = jnp.max(log_p_bts, axis=2)                     # [B, T]
    w_core = (jnp.exp(log_p_bts - m_bt[:, :, None])
              * smask_bs[:, None, :])                     # [B, T, S]
    # ALL padding happens in the dot-native [B, T, S] layout, where it
    # fuses into the exp producer; the one structural relayout is then a
    # single transpose writing the kernel's padded stream directly. (The
    # earlier transpose-then-pad order materialized w twice: the relayout
    # copy cannot fuse with the pad, so XLA emitted a separate
    # pad_select pass over the full stream — ~43 us/iter at the headline
    # shape.) Padded-frame rows are uniform 1/Sp across every lane
    # exactly as _sb_pad_w writes them (module docstring has the
    # boundary semantics).
    vm = vmask.T[:, :, None]                              # [B, T, 1]
    if zero_invalid:
        w1 = (w_core * vm).astype(io_dtype)
        w1p = jnp.pad(w1, ((0, Bp - B), (0, Tp - T), (0, Sp - S)))
    else:
        w1 = (w_core * vm + (1.0 - vm) / Sp).astype(io_dtype)
        w1p = jnp.pad(w1, ((0, Bp - B), (0, Tp - T), (0, Sp - S)))
        if Tp > T:
            w1p = jnp.where((jnp.arange(Tp) < T)[None, :, None], w1p,
                            jnp.asarray(1.0 / Sp, io_dtype))
    wp = jnp.transpose(w1p, (1, 2, 0))                    # [Tp, Sp, Bp]
    ahat, bhat, cfw_b = _sb_pallas(wp, col, pinit, loop_prob,
                                   Sp=Sp, Bp=Bp, nt=nt, t_chunk=t_chunk,
                                   interpret=interpret, recip=recip,
                                   io_dtype=io_dtype, binit=binit,
                                   skip_dead=zero_invalid)
    return (ahat[:T, :S, :B], bhat[:T, :S, :B], cfw_b[:T, 0, :B],
            m_bt.T, wp[:T, :S, :B])


def _fwd_product_kernel_sb(w_ref, col_ref, finit_ref, lp_ref,
                           fout_ref, ls_ref, fcarry_ref, lscarry_ref):
    """Forward-only walk that keeps NO per-frame stream: emits only the
    final normalized message and the accumulated log of the per-frame
    normalizers. With per-lane initial messages set to the rows of the
    identity, the L = B*S lanes compute each recording's block transition-
    operator product F = prod_t N_t row by row (the frame-sharded smoother's
    block summary, parallel.fb_blockwise): row i of F is exactly the forward
    recursion started from e_i, per-lane normalized, with its scale in the
    normalizer product. The walk reads each frame once and writes nothing
    per frame — no per-frame output stream. The INPUT stream is the
    caller's S-fold lane replication of w (parallel.fb_blockwise repeats
    the [Tb, S, B] emissions to [Tb, S, B*S] so each identity row gets
    its recording's frames). Cost accounting (round-3 review): lanes pad
    to multiples of 128 regardless, so the padded stream grows only by
    ceil(B*S/128)/ceil(B/128) over the unreplicated one — 1x at the SP
    headline shapes (B <= 16 with B*S <= 128: identical padded stream),
    at most ~2x at B=8, S=32, plus the one-time repeat materialization.
    A grid-over-rows variant with an s-invariant w index_map would shave
    that residual; not worth the kernel surgery at current shapes.

    Boundary semantics match _fused_kernel_sb: the walk's first frame emits
    normalize(w0 * finit) (the caller folds any incoming transition into
    finit, so a non-first block passes finit = lp*prev + col).

    Frames whose w column is ALL ZERO are skipped exactly (carry and scale
    unchanged) — the caller zeroes padded frames instead of making them
    uniform, because an operator product, unlike the posteriors, has no
    downstream masking to hide corrupted suffix frames behind. A valid
    frame's normalizer is >= eps (w's max entry is 1 by construction and
    every unmasked speaker's transition column is >= eps), far above the
    sentinel threshold."""
    k = pl.program_id(0)
    Tc = w_ref.shape[0]
    lp = lp_ref[0, 0]
    col = col_ref[:]

    @pl.when(k == 0)
    def _():
        fcarry_ref[:] = finit_ref[:]
        lscarry_ref[:] = jnp.zeros_like(lscarry_ref)

    def step(i, carry):
        prev, ls = carry
        at0 = jnp.logical_and(k == 0, i == 0)
        w_t = w_ref[i].astype(jnp.float32)            # [Sp, Lp]
        a = w_t * jnp.where(at0, prev, lp * prev + col)
        c = jnp.sum(a, axis=0, keepdims=True)         # [1, Lp]
        live = c > jnp.float32(_TINY)
        csafe = jnp.where(live, c, 1.0)
        nxt = jnp.where(live, a * (1.0 / csafe), prev)
        ls = ls + jnp.where(live, jnp.log(csafe), 0.0)
        return nxt, ls

    fcarry_ref[:], lscarry_ref[:] = jax.lax.fori_loop(
        0, Tc, step, (fcarry_ref[:], lscarry_ref[:]))
    fout_ref[:] = fcarry_ref[:]
    ls_ref[:] = lscarry_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret", "io_dtype"))
def fb_fwd_product_pallas_sb(w: jax.Array, col: jax.Array,
                             finit: jax.Array, loop_prob,
                             interpret: bool = False,
                             io_dtype=jnp.float32,
                             ) -> Tuple[jax.Array, jax.Array]:
    """Normalized forward-recursion endpoint over L independent lanes.

    w:     [T, S, L] emission weights; padded/invalid frames must be ALL
           ZERO columns (skipped exactly), padded speakers zero.
    col:   [S, L] transition column (1-loopP)*pi + eps per lane.
    finit: [S, L] per-lane initial message (frame 0 emits w0 * finit —
           fold `lp*prev + col` in for a non-first block).
    Returns (fhat [S, L] final normalized message, ls [L] summed log
    normalizers). The caller adds the log-domain per-frame max-shifts to
    ls to recover absolute scales.
    """
    T, S, L = w.shape
    io_dtype = jnp.dtype(io_dtype)
    if S > S_PAD:
        raise ValueError(f"S={S} > {S_PAD}; shard speakers first")
    Sp = _round_up(S, 8 if io_dtype.itemsize == 4 else 16)
    Lp = _round_up(L, 128)
    frame_bytes = Sp * Lp * io_dtype.itemsize
    # one double-buffered input stream + fixed [Sp, Lp] operands/scratch
    t_chunk = max(1, ((13 << 20) - 6 * Sp * Lp * 4) // (2 * frame_bytes))
    Tp = _round_up(T, t_chunk)
    nt = Tp // t_chunk

    wp = jnp.pad(w.astype(io_dtype),
                 ((0, Tp - T), (0, Sp - S), (0, Lp - L)))
    colp = jnp.zeros((Sp, Lp), jnp.float32).at[:S, :L].set(
        col.astype(jnp.float32))
    finitp = jnp.zeros((Sp, Lp), jnp.float32).at[:S, :L].set(
        finit.astype(jnp.float32))
    lp = jnp.asarray(loop_prob, jnp.float32).reshape(1, 1)

    fhat, ls = pl.pallas_call(
        _fwd_product_kernel_sb,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((t_chunk, Sp, Lp), lambda kk: (kk, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp, Lp), lambda kk: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp, Lp), lambda kk: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((Sp, Lp), lambda kk: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Lp), lambda kk: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Sp, Lp), jnp.float32),
            jax.ShapeDtypeStruct((8, Lp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Sp, Lp), jnp.float32),
                        pltpu.VMEM((8, Lp), jnp.float32)],
        interpret=interpret,
    )(wp, colp, finitp, lp)
    return fhat[:S, :L], ls[0, :L]


@functools.partial(jax.jit, static_argnames=("interpret", "fused"))
def fb_scan_pallas(w: jax.Array, valid: jax.Array, col: jax.Array,
                   pinit: jax.Array, loop_prob,
                   interpret: bool = False, fused: bool = True,
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run both scaled recursions.

    w:      [T, B, S] per-frame emission weights exp(log_p - m) (padded
            speakers MUST be exactly 0; padded-frame values are ignored).
    valid:  [T, B] float/bool frame validity (False = padding suffix;
            frame 0 must be valid). Outputs at invalid frames are
            arbitrary — mask them downstream.
    col:    [B, S] transition column (1-loopP)*pi + eps.
    pinit:  [B, S] pi + eps initial weights.
    fused:  single bidirectional kernel (default) vs the two-pass kernels.
    Returns (ahat [T, B, S], bhat [T, B, S], cfw [T, B]).
    """
    T, B, S = w.shape
    Sp = S_PAD
    if S > S_PAD:
        raise ValueError(f"S={S} > {S_PAD} lanes; shard speakers first")
    if fused:
        b_blk, t_chunk = _pick_blocks(B)
    else:
        b_blk, t_chunk = B_BLK, T_CHUNK
    Tp, Bp = _round_up(T, t_chunk), _round_up(B, b_blk)

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

    nb, nt = Bp // b_blk, Tp // t_chunk

    def chunk3(i, kk):
        return (kk, i, 0)

    def rchunk3(i, kk):
        return (nt - 1 - kk, i, 0)

    def bcast3(i, kk):
        return (0, i, 0)

    # one-frame-shifted view for the backward pass (see _bwd_kernel)
    w_sh = jnp.concatenate([wp[1:], wp[:1]], axis=0)

    if fused:
        ahat, bhat = pl.pallas_call(
            _fused_kernel,
            grid=(nb, nt),
            in_specs=[
                pl.BlockSpec((t_chunk, b_blk, Sp), chunk3,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t_chunk, b_blk, Sp), rchunk3,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_blk, Sp), bcast3,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_blk, Sp), bcast3,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((t_chunk, b_blk, Sp), chunk3,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t_chunk, b_blk, Sp), rchunk3,
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Tp, Bp, Sp), jnp.float32),
                jax.ShapeDtypeStruct((Tp, Bp, Sp), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((b_blk, Sp), jnp.float32),
                            pltpu.VMEM((b_blk, Sp), jnp.float32)],
            interpret=interpret,
        )(wp, w_sh, colp, pinitp, lp)
        ahat_s = ahat[:T, :B, :S]
        bhat_s = bhat[:T, :B, :S]
        # per-frame forward normalizers, reconstructed in one fused XLA
        # elementwise+reduce pass: c_t = sum_s w_t (lp * ahat_{t-1} + col),
        # c_0 = sum_s w_0 * pinit (w's padded speaker lanes are 0 on valid
        # frames, so the S-lane sum equals the kernel's 128-lane sum)
        prev = jnp.concatenate(
            [jnp.broadcast_to(pinit[None].astype(jnp.float32), (1, B, S)),
             loop_prob * ahat_s[:-1]
             + col[None].astype(jnp.float32)], axis=0)
        cfw = jnp.maximum(jnp.sum(w[:, :, :S] * prev, axis=-1),
                          jnp.float32(_TINY))
        return ahat_s, bhat_s, cfw

    ahat, cfw = pl.pallas_call(
        _fwd_kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((t_chunk, b_blk, Sp), chunk3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_blk, Sp), bcast3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_blk, Sp), bcast3, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_chunk, b_blk, Sp), chunk3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, b_blk, Sp), chunk3,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp, Sp), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Bp, Sp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b_blk, Sp), jnp.float32)],
        interpret=interpret,
    )(wp, colp, pinitp, lp)

    bhat = pl.pallas_call(
        _bwd_kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((t_chunk, b_blk, Sp), rchunk3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_blk, Sp), bcast3, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((t_chunk, b_blk, Sp), rchunk3,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, Bp, Sp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_blk, Sp), jnp.float32)],
        interpret=interpret,
    )(w_sh, colp, lp)

    return ahat[:T, :B, :S], bhat[:T, :B, :S], cfw[:T, :B, 0]
