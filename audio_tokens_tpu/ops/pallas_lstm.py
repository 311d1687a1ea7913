"""Pallas TPU kernel: full LSTM sequence (forward + hand-written VJP).

The XLA scan LSTM (models/lstm.py) spends most of its step time on
while-loop/dispatch overhead — the per-step work is one small (B, H) x
(H, 4H) gate GEMM plus VPU activations (measured ~11.6 us per
direction-step at B=64 H=512 on v5e, vs ~0.7 us of MXU time).  This kernel
runs the whole T-step recurrence as ONE sequential-grid Pallas program:
the hidden/cell state lives in VMEM scratch across grid steps, ``w_hh``
stays VMEM-resident, and the per-step input-gate block streams from HBM
through Mosaic's pipelined block fetches.

The backward pass is a second sequential-grid kernel walking time in the
opposite order, carrying (dh, dc) in scratch and accumulating ``dw_hh`` in
a VMEM block — wired up via ``jax.custom_vjp`` (pallas_call has no autodiff).
Residuals are the post-activation gates, the cell states, and the hidden
states the forward pass emits anyway.

Numerics match the scan path: f32 carries and elementwise ops; the gate
GEMMs run at the same (configurable) matmul precision the scan uses.
Masked steps pass state through unchanged (variable-length semantics of
models/lstm.py); with all-ones masks this reproduces the reference's
degenerate-mask behavior (SURVEY.md §2.7.1).

Replaces what cuDNN's fused LSTM did for the reference
(reference: models/simple_lstm_token_classifier.py:11-17).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot(a, b, precision):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), precision=precision,
        preferred_element_type=jnp.float32,
    )


def _split4(gates, h):
    return (gates[:, :h], gates[:, h : 2 * h], gates[:, 2 * h : 3 * h],
            gates[:, 3 * h :])


def _fwd_kernel(xg_ref, m_ref, w_ref, hs_ref, gates_ref, c_ref, hlast_ref,
                h_scr, c_scr, *, precision):
    t = pl.program_id(0)
    h = h_scr.shape[1]

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h_prev = h_scr[:]
    c_prev = c_scr[:]
    gates = xg_ref[0] + _dot(h_prev, w_ref[:], precision)
    i, f, g, o = _split4(gates, h)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    o = jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c_prev + i * g
    h_new = o * jnp.tanh(c_new)
    m = m_ref[0]  # (B, 1)
    h_out = m * h_new + (1.0 - m) * h_prev
    c_out = m * c_new + (1.0 - m) * c_prev
    hs_ref[0] = h_out
    gates_ref[0] = jnp.concatenate([i, f, g, o], axis=-1)
    c_ref[0] = c_out
    hlast_ref[:] = h_out  # constant index map: final grid step wins
    h_scr[:] = h_out
    c_scr[:] = c_out


def _bwd_kernel(dhs_ref, dhlast_ref, gates_ref, c_ref, cprev_ref, hprev_ref,
                m_ref, w_ref, dxg_ref, dw_ref, dh_scr, dc_scr, *, precision):
    s = pl.program_id(0)
    n = pl.num_programs(0)
    h = dh_scr.shape[1]

    @pl.when(s == 0)
    def _():
        # the h_last output feeds gradient into the final processing step
        dh_scr[:] = dhlast_ref[:]
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dw_ref[:] = jnp.zeros_like(dw_ref)

    # s == n-1 is the first step of the forward processing order: its
    # previous state was the zero init, not the clamped block we loaded
    not_first = jnp.where(s == n - 1, 0.0, 1.0)
    c_prev = cprev_ref[0] * not_first
    h_prev = hprev_ref[0] * not_first

    gates = gates_ref[0]
    i, f, g, o = _split4(gates, h)
    tanh_c = jnp.tanh(c_ref[0])  # == tanh(c_new) wherever the step was live
    m = m_ref[0]  # (B, 1)

    dh_total = dhs_ref[0] + dh_scr[:]
    dh_new = m * dh_total
    dh_prev_direct = (1.0 - m) * dh_total
    dc_carry = dc_scr[:]
    dc_new = m * dc_carry
    dc_prev_direct = (1.0 - m) * dc_carry

    do = dh_new * tanh_c
    dcn = dc_new + dh_new * o * (1.0 - tanh_c * tanh_c)
    di = dcn * g
    dg = dcn * i
    df = dcn * c_prev
    dc_prev = dcn * f + dc_prev_direct

    dgp = jnp.concatenate(
        [di * i * (1.0 - i), df * f * (1.0 - f), dg * (1.0 - g * g),
         do * o * (1.0 - o)], axis=-1,
    )  # pre-activation gate grads (B, 4H)
    dxg_ref[0] = dgp
    dw_ref[:] += _dot(h_prev.T, dgp, precision)
    dh_scr[:] = _dot(dgp, w_ref[:].T, precision) + dh_prev_direct
    dc_scr[:] = dc_prev


def _time_maps(t_steps: int, reverse: bool):
    """(processing-order time index, fwd prev-time index) maps."""
    if reverse:
        fwd_t = lambda s: t_steps - 1 - s
    else:
        fwd_t = lambda s: s
    return fwd_t


@functools.partial(
    jax.jit, static_argnames=("reverse", "precision", "interpret")
)
def _lstm_fwd_call(xg, mask, w_hh, reverse, precision, interpret):
    t_steps, b, g4 = xg.shape
    h = g4 // 4
    fwd_t = _time_maps(t_steps, reverse)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, precision=precision),
        grid=(t_steps,),
        in_specs=[
            pl.BlockSpec((1, b, g4), lambda s: (fwd_t(s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, 1), lambda s: (fwd_t(s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, h), lambda s: (fwd_t(s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, g4), lambda s: (fwd_t(s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h), lambda s: (fwd_t(s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_steps, b, h), jnp.float32),   # hs
            jax.ShapeDtypeStruct((t_steps, b, g4), jnp.float32),  # gates
            jax.ShapeDtypeStruct((t_steps, b, h), jnp.float32),   # c
            jax.ShapeDtypeStruct((b, h), jnp.float32),            # h_last
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
        interpret=interpret,
    )(xg, mask[:, :, None], w_hh)


@functools.partial(
    jax.jit, static_argnames=("reverse", "precision", "interpret")
)
def _lstm_bwd_call(dhs, dh_last, gates, c, hs, mask, w_hh, reverse,
                   precision, interpret):
    t_steps, b, g4 = gates.shape
    h = g4 // 4
    fwd_t = _time_maps(t_steps, reverse)
    # bwd grid step s handles fwd processing position p = T-1-s; the state
    # feeding p came from position p-1 (clamped; zeroed in-kernel at p==0)
    t_of = lambda s: fwd_t(t_steps - 1 - s)
    tprev_of = lambda s: fwd_t(jnp.maximum(t_steps - 2 - s, 0))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, precision=precision),
        grid=(t_steps,),
        in_specs=[
            pl.BlockSpec((1, b, h), lambda s: (t_of(s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, g4), lambda s: (t_of(s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h), lambda s: (t_of(s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h), lambda s: (tprev_of(s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h), lambda s: (tprev_of(s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, 1), lambda s: (t_of(s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, g4), lambda s: (t_of(s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_steps, b, g4), jnp.float32),  # dxg
            jax.ShapeDtypeStruct((h, g4), jnp.float32),           # dw_hh
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
        interpret=interpret,
    )(dhs, dh_last, gates, c, c, hs, mask[:, :, None], w_hh)  # c twice: t, t-1


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def lstm_sequence(xg, mask, w_hh, reverse=False,
                  precision=jax.lax.Precision.DEFAULT, interpret=False):
    """One LSTM direction over precomputed input gates.

    xg (T, B, 4H) f32 = x @ w_ih + bias; mask (T, B) f32 prefix mask;
    w_hh (H, 4H) f32.  Returns (hs (T, B, H), h_last (B, H)).  ``reverse``
    processes time back-to-front (outputs stay in original time order),
    matching ``lax.scan(reverse=True)``.
    """
    hs, _, _, h_last = _lstm_fwd_call(xg, mask, w_hh, reverse, precision,
                                      interpret)
    return hs, h_last


def _lstm_seq_fwd(xg, mask, w_hh, reverse, precision, interpret):
    hs, gates, c, h_last = _lstm_fwd_call(xg, mask, w_hh, reverse, precision,
                                          interpret)
    return (hs, h_last), (gates, c, hs, mask, w_hh)


def _lstm_seq_bwd(reverse, precision, interpret, res, grads):
    gates, c, hs, mask, w_hh = res
    dhs, dh_last = grads
    dxg, dw_hh = _lstm_bwd_call(dhs, dh_last, gates, c, hs, mask, w_hh,
                                reverse, precision, interpret)
    return dxg, jnp.zeros_like(mask), dw_hh


lstm_sequence.defvjp(_lstm_seq_fwd, _lstm_seq_bwd)
