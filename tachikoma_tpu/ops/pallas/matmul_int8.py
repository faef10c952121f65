"""Pallas int8 MXU matmul with fused integer requantize epilogue.

The hand-written replacement for the reference's tuned int8 GEMM schedules
(TOPI `conv2d_int8` / `dense_tensorcore` / VNNI paths, SURVEY.md §8.4):
int8 x int8 -> int32 on the MXU, tiled (M, N, K) with a VMEM accumulator,
and the exact fixed-point requantize (bias add + multiply/shift + zero point
+ clip, ops/pallas/qms32.py) fused into the epilogue so the int32
accumulator never round-trips to HBM.

Zero points: the quantizer always produces wzp=0; a nonzero input zero point
folds into the bias (acc(x - izp, w) = x.w - izp*colsum(w)), so the inner
loop is a pure int8 matmul.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np

from .qms32 import q_multiply_shift_u32


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _mm_kernel(x_ref, w_ref, bias_ref, m_ref, s_ref, o_ref, acc_ref, *,
               n_k: int, out_zp: int, rounding: str, qmin: int, qmax: int,
               out_dtype, shift_values: tuple, rq_mode: str | None = None):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from .qms32 import fused_requantize

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.int32
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _epilogue():
        acc = acc_ref[...]
        acc = acc + bias_ref[...]  # (1, bn) broadcast over rows
        # rq_mode clamp16/clamp11: the 2/3-multiply clamped requantize
        # (qms32.plan_rq_clamp); else the mulhi select-tree (Mosaic rejects
        # vector shift amounts, so both branch over static shift values)
        v = fused_requantize(acc, m_ref[...], s_ref[...], shift_values,
                             rounding, out_zp, qmin, qmax, rq_mode)
        o_ref[...] = v.astype(o_ref.dtype)


def _mm_kernel_raw(x_ref, w_ref, o_ref, acc_ref, *, n_k: int):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.int32
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _store():
        o_ref[...] = acc_ref[...]


def _interpret_default() -> bool:
    import jax

    return jax.devices()[0].platform != "tpu"


def _x32_tracing():
    """Trace pallas calls with 32-bit default types: the kernels are pure
    32-bit, but under global x64 the python-int ref indices and scalar
    literals become i64 constants, and Mosaic's i64 convert_element_type
    lowering recurses unboundedly (observed on v5e)."""
    import jax

    return jax.enable_x64(False)


@functools.partial(
    # cache compiled callables per static config
    functools.lru_cache(maxsize=None)
)
def _build_qmatmul(M, K, N, block_m, block_n, block_k, out_zp, rounding,
                   qmin, qmax, out_dtype, fuse: bool, interpret: bool = False,
                   shift_values: tuple = (), rq_mode: str | None = None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_k = K // block_k
    grid = (M // block_m, N // block_n, n_k)
    m_rows = 4 if rq_mode in ("clamp16", "clamp11") else 1
    if fuse:
        kernel = functools.partial(
            _mm_kernel, n_k=n_k, out_zp=out_zp, rounding=rounding,
            qmin=qmin, qmax=qmax, out_dtype=out_dtype,
            shift_values=shift_values, rq_mode=rq_mode,
        )
        in_specs = [
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),   # bias
            # multiplier row, or the (4, bn) [m; blo; bhi; cp] clamp block
            pl.BlockSpec((m_rows, block_n), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),   # shift
        ]
        out_jdt = jnp.dtype(out_dtype)
    else:
        kernel = functools.partial(_mm_kernel_raw, n_k=n_k)
        in_specs = [
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
        ]
        out_jdt = jnp.int32

    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        )
        kw["cost_estimate"] = pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N * (1 if fuse else 4),
            transcendentals=0,
        )
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), out_jdt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        ),
        interpret=interpret,
        **kw,
    )
    return jax.jit(fn)


def default_blocks(M, K, N) -> tuple[int, int, int]:
    """Block sizes: int8 tiling needs (32, 128) minimums; prefer large K
    blocks (reduction reuse) and M/N ~512 for MXU utilization."""
    bm = min(_round_up(M, 32), 512)
    bn = min(_round_up(N, 128), 512)
    bk = min(_round_up(K, 128), 1024)
    return bm, bn, bk


def qmatmul_int8(
    x, w, bias=None, multiplier=None, shift=None, out_zp: int = 0,
    rounding: str = "UPWARD", out_dtype: str = "int8",
    qmin: int = -128, qmax: int = 127,
    blocks: tuple[int, int, int] | None = None,
):
    """x (M, K) int8  @  w (K, N) int8.

    With multiplier/shift (scalars or per-column (N,) int32 arrays): returns
    requantized out_dtype (M, N), computing
        clip(qms(acc + bias, m, s) + out_zp, qmin, qmax)
    bit-identically to the unfused qnn.dense + bias_add + qnn.requantize
    chain.  Without multiplier: returns the raw int32 accumulator (+bias).
    """
    import jax.numpy as jnp

    M, K = x.shape
    K2, N = w.shape
    assert K == K2
    fuse = multiplier is not None
    if blocks is None:
        # consult the tuning database under apply_history_best, like the
        # reference's dispatch contexts (`autotvm/task/dispatcher.py`)
        from ...tune.database import lookup_config
        from ...tune.tuner import matmul_workload

        cfg = lookup_config(matmul_workload(M, K, N, fuse))
        if cfg and "blocks" in cfg:
            blocks = tuple(cfg["blocks"])
        elif cfg and cfg.get("impl") == "xla":
            blocks = "xla"
    if blocks == "xla":
        # XLA int8 MXU dot + u32-emulated exact epilogue: measured FASTER
        # than the Pallas kernel at small/skinny shapes (the tuner records
        # which implementation wins per workload)
        return _qmatmul_xla(x, w, bias, multiplier, shift, out_zp, rounding,
                            out_dtype, qmin, qmax, fuse)
    bm, bn, bk = blocks or default_blocks(M, K, N)
    Mp, Kp, Np = _round_up(M, bm), _round_up(K, bk), _round_up(N, bn)

    xp = jnp.pad(x, ((0, Mp - M), (0, Kp - K))) if (Mp != M or Kp != K) else x
    wp = jnp.pad(w, ((0, Kp - K), (0, Np - N))) if (Kp != K or Np != N) else w

    if fuse:
        from .qms32 import plan_rq_clamp

        bias_arr = jnp.zeros((N,), jnp.int32) if bias is None else jnp.asarray(bias, jnp.int32)
        m_host = np.broadcast_to(np.asarray(multiplier, np.int32), (N,))
        s_host = np.broadcast_to(np.asarray(shift, np.int32), (N,))
        pad1 = lambda a: (jnp.pad(a, (0, Np - N)) if Np != N else a).reshape(1, Np)
        shift_values = tuple(sorted({int(v) for v in np.atleast_1d(np.asarray(shift))}))
        rq_mode, rows = plan_rq_clamp(m_host, s_host, int(out_zp), qmin,
                                      qmax, rounding)
        if rq_mode is not None:
            mx = np.zeros((4, Np), np.int32)
            mx[:, :N] = rows  # padded cols: m=0, window [0,0] (sliced off)
            m_pad = jnp.asarray(mx)
        else:
            # pad multiplier with 1s to keep shifts valid (cols sliced off)
            m_pad = (pad1(jnp.asarray(m_host)) if Np == N else
                     jnp.pad(jnp.asarray(m_host), (0, Np - N),
                             constant_values=1).reshape(1, Np))
        fn = _build_qmatmul(
            Mp, Kp, Np, bm, bn, bk, int(out_zp), rounding, qmin, qmax,
            out_dtype, True, _interpret_default(), shift_values, rq_mode,
        )
        with _x32_tracing():
            out = fn(xp, wp, pad1(bias_arr), m_pad,
                     pad1(jnp.asarray(s_host)))
    else:
        fn = _build_qmatmul(
            Mp, Kp, Np, bm, bn, bk, 0, rounding, qmin, qmax, "int32", False,
            _interpret_default(),
        )
        with _x32_tracing():
            out = fn(xp, wp)
        if bias is not None:
            out = out + jnp.asarray(bias, jnp.int32)[None, :]
    if Mp != M or Np != N:
        out = out[:M, :N]
    return out


def _qmatmul_xla(x, w, bias, multiplier, shift, out_zp, rounding, out_dtype,
                 qmin, qmax, fuse):
    """Bit-exact XLA realization of qmatmul_int8 (int32 MXU dot + the u32
    fixed-point epilogue); selected by tuned config {"impl": "xla"}."""
    import jax.numpy as jnp

    from .qms32 import fused_requantize, plan_rq_clamp, q_multiply_shift_u32

    acc = jnp.dot(x.astype(jnp.int32), w.astype(jnp.int32),
                  preferred_element_type=jnp.int32)
    if bias is not None:
        acc = acc + jnp.asarray(bias, jnp.int32)[None, :]
    if not fuse:
        return acc
    # concrete numpy m/s keep the trace-time fast requantize paths available
    m_arr = np.broadcast_to(np.asarray(multiplier, np.int32), (acc.shape[-1],))
    s_arr = np.broadcast_to(np.asarray(shift, np.int32), (acc.shape[-1],))
    rq_mode, rows = plan_rq_clamp(m_arr, s_arr, int(out_zp), qmin, qmax,
                                  rounding)
    if rq_mode is not None:
        svals = tuple(sorted({int(v) for v in s_arr}))
        v = fused_requantize(acc, jnp.asarray(rows), jnp.asarray(s_arr),
                             svals, rounding, int(out_zp), qmin, qmax,
                             rq_mode)
        return v.astype(jnp.dtype(out_dtype))
    v = q_multiply_shift_u32(acc, m_arr, s_arr, rounding)
    if out_zp:
        v = v + jnp.int32(out_zp)
    return jnp.clip(v, jnp.int32(qmin), jnp.int32(qmax)).astype(jnp.dtype(out_dtype))
