"""Fused joint-entropy kernel for EPIG scoring (Pallas/Mosaic, TPU).

Why: the EPIG joint-entropy term (ref:bayesvlm/epig.py:313-397) is
``-sum xlogy(J)`` over ``J = probs_pool [N_p*C, K] @ probs_targ^T
[K, N_t*C] / K``. At the reference's operating point (pool 4000, targets
2000, C=65, K=100 MC samples) the joint matrix is [260k, 130k] — ~135 GB
in fp32 — so the XLA path is bound by streaming it through HBM (or by
XLA's fusion choices around the dot). This kernel computes score tiles
S = Bt_blk @ A_blk^T on the MXU, applies xlogy and the column reduction
while the tile is still in VMEM, and accumulates per-pool-row entropy
partial sums across the target grid axis. The joint matrix never exists
in HBM.

Layout choice: the *pool* rows live on the lane axis of the tile (the
kernel computes S^T = targ_tile [bn, K] @ pool_tile [bm, K]^T -> [bn, bm])
so the in-tile reduction runs over sublanes and the [1, bm] partial-sum
block lands lane-aligned — no transposes anywhere.

Grid order is (targets outer, pool inner): the output block index is
constant in the inner axis, and the pool operand streams N/bn times
(~2 GB total at the reference scale vs 135 GB for the unfused joint).

Numerics: identical contract to the XLA path in
``bayesvlm_tpu.select.epig`` — bf16 operands, fp32 MXU accumulation,
fp32 xlogy. K is zero-padded to the lane width (zero columns add zero to
the dot products); M/N are zero-padded to tile multiples (zero probs =>
xlogy(0) = 0 contributes nothing).

No reference counterpart (the reference materializes the joint in fp16 on
CUDA, chunked over the pool axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xlogy_rowsum_kernel(bt_ref, a_ref, o_ref, acc_ref, *, inv_k: float,
                         nj: int, bm: int):
    # Grid (j outer, i inner): the target block bt is constant over the
    # inner sweep (loaded once per j), the pool blocks stream, and the
    # full [1, M] partial-sum vector lives in a VMEM scratch — output
    # blocks cannot accumulate across an *outer* grid axis (they are
    # evicted between revisits), so the scratch carries the sum and the
    # last j sweep materializes the output.
    j = pl.program_id(0)
    i = pl.program_id(1)

    s = jax.lax.dot_general(
        bt_ref[...], a_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_k                                     # [bn, bm] fp32 joint tile
    xlogy = jnp.where(s > 0, s * jnp.log(s), 0.0)
    part = jnp.sum(xlogy, axis=0, keepdims=True)  # [1, bm]

    sl = pl.ds(i * bm, bm)

    @pl.when(j == 0)
    def _init():
        acc_ref[:, sl] = part

    @pl.when(j > 0)
    def _acc():
        acc_ref[:, sl] += part

    @pl.when(j == nj - 1)
    def _write():
        o_ref[...] = acc_ref[:, sl]


def _xlogy_rowsum_kernel_int8(bt_ref, bts_ref, a_ref, as_ref, o_ref,
                              acc_ref, *, inv_k: float, nj: int, bm: int):
    # int8 variant: the score tile accumulates on the double-rate int8
    # MXU path (int32, exact); dequant is a rank-1 outer-product scale
    # in the epilogue (per-row absmax scales computed by the caller).
    j = pl.program_id(0)
    i = pl.program_id(1)

    s32 = jax.lax.dot_general(
        bt_ref[...], a_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                             # [bn, bm] int32 exact
    s = s32.astype(jnp.float32) * bts_ref[...] * as_ref[...] * inv_k
    xlogy = jnp.where(s > 0, s * jnp.log(s), 0.0)
    part = jnp.sum(xlogy, axis=0, keepdims=True)  # [1, bm]

    sl = pl.ds(i * bm, bm)

    @pl.when(j == 0)
    def _init():
        acc_ref[:, sl] = part

    @pl.when(j > 0)
    def _acc():
        acc_ref[:, sl] += part

    @pl.when(j == nj - 1)
    def _write():
        o_ref[...] = acc_ref[:, sl]


def _quant_rows_i8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row absmax int8 for probability rows: [R, K] fp32 ->
    (int8 [R, K], fp32 scale [R, 1]) with x ~= q * scale. Zero rows
    (padding) get the _EPS-clamped scale and stay exactly zero."""
    r = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-12)
    scale = r * (1.0 / 127.0)
    q = jnp.round(x * (127.0 / r)).astype(jnp.int8)
    return q, scale


@functools.partial(
    jax.jit, static_argnames=("num_samples", "interpret", "use_int8"))
def joint_xlogy_rowsums(
    pool_flat: jax.Array,    # [M, K] bf16 probs (pool, classes flattened)
    targ_flat: jax.Array,    # [N, K] bf16 probs (targets, classes flattened)
    num_samples: int,
    interpret: bool = False,
    use_int8: bool = False,
) -> jax.Array:
    """sum_n xlogy(pool_flat @ targ_flat^T / K)[n, m] -> [M] fp32.

    The caller turns this into the joint entropy via
    ``-(rowsums.reshape(N_p, C).sum(1)) / N_t``.

    `use_int8`: score tiles on the double-rate int8 MXU path (W8A8,
    per-row absmax scales, exact int32 accumulation). MEASURED DOUBLE
    NEGATIVE at the reference operating point (BASELINE.md "int8
    EPIG"): SLOWER (58.1 vs 46.7 ms — the quantize pass costs more
    than the double-rate MXU saves, and the xlogy VPU work bounds the
    kernel) AND ranking-destroying (EPIG = small difference of large
    entropies; int8's ~1.4e-3 score error vs the ~0.012 score scale
    gives 5% top-50 overlap). Kept ONLY as an internal tested variant
    for reproducibility (scripts/dev/bench_epig_int8.py); deliberately
    NOT exposed in any driver or CLI.
    """
    M, K = pool_flat.shape
    N, _ = targ_flat.shape

    # tile sweep on v5 lite (BASELINE.md round 3): (512,2048) 55.6 ms,
    # (1024,2048) 52.9, (1024,4096) 51.5, (1024,8192) 51.2 — program-count
    # overhead dominates the tail; (1024,4096) keeps the score tile at a
    # comfortable 16 MB VMEM budget for ~the same speed.
    bm, bn = 1024, 4096
    k_pad = max(128, ((K + 127) // 128) * 128)
    m_pad = ((M + bm - 1) // bm) * bm
    n_pad = ((N + bn - 1) // bn) * bn

    a = jnp.zeros((m_pad, k_pad), jnp.bfloat16).at[:M, :K].set(
        pool_flat.astype(jnp.bfloat16))
    bt = jnp.zeros((n_pad, k_pad), jnp.bfloat16).at[:N, :K].set(
        targ_flat.astype(jnp.bfloat16))

    ni, nj = m_pad // bm, n_pad // bn
    cost = pl.CostEstimate(
        flops=2 * m_pad * n_pad * k_pad,
        bytes_accessed=(nj * m_pad * k_pad * 2 + n_pad * k_pad * 2
                        + m_pad * 4),
        transcendentals=m_pad * n_pad,
    )
    # j (targ blocks) accumulates into the scratch -> arbitrary;
    # pool blocks i are independent -> parallel
    comp = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "parallel"),
    )
    out_spec = pl.BlockSpec((1, bm), lambda j, i: (0, i),
                            memory_space=pltpu.VMEM)

    if use_int8:
        aq, as_ = _quant_rows_i8(a.astype(jnp.float32))
        btq, bts = _quant_rows_i8(bt.astype(jnp.float32))
        as_T = as_.reshape(1, m_pad)          # lane-aligned for the tile
        out = pl.pallas_call(
            functools.partial(
                _xlogy_rowsum_kernel_int8, inv_k=1.0 / num_samples,
                nj=nj, bm=bm),
            grid=(nj, ni),
            in_specs=[
                pl.BlockSpec((bn, k_pad), lambda j, i: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, 1), lambda j, i: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, k_pad), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bm), lambda j, i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, m_pad), jnp.float32)],
            cost_estimate=cost,
            compiler_params=comp,
            interpret=interpret,
        )(btq, bts, aq, as_T)
        return out[0, :M]

    out = pl.pallas_call(
        functools.partial(
            _xlogy_rowsum_kernel, inv_k=1.0 / num_samples, nj=nj, bm=bm),
        grid=(nj, ni),
        in_specs=[
            pl.BlockSpec((bn, k_pad), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k_pad), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, m_pad), jnp.float32)],
        cost_estimate=cost,
        compiler_params=comp,
        interpret=interpret,
    )(bt, a)
    return out[0, :M]


def _marginal_entropy_flat(flat: jax.Array, n: int, c: int) -> jax.Array:
    """H[mean_K p] from the [N*C, K] fp32 layout (lane reductions only —
    same math as epig.marginal_entropy_from_probs, which reduces the
    middle axis of [N, K, C] and costs a relayout at scale)."""
    pm = jnp.mean(flat, axis=1)                       # [N*C]
    xlogy = jnp.where(pm > 0, pm * jnp.log(pm), 0.0)
    return -jnp.sum(xlogy.reshape(n, c), axis=1)      # [N]


def epig_from_probs_pallas(
    probs_pool: jax.Array,   # [N_p, K, C]
    probs_targ: jax.Array,   # [N_t, K, C]
    interpret: bool = False,
    use_int8: bool = False,
) -> jax.Array:
    """Drop-in fused equivalent of
    ``epig.epig_from_probs_using_matmul`` (same bf16/fp32 contract;
    `use_int8` is an internal measured-negative variant — see
    joint_xlogy_rowsums, do not expose in drivers).

    One fp32 relayout per operand feeds both the marginal entropies and
    the kernel (the XLA path pays the [N, K, C] middle-axis reduction AND
    a separate transpose)."""
    N_p, K, C = probs_pool.shape
    N_t = probs_targ.shape[0]

    pool_flat = jnp.swapaxes(probs_pool, 1, 2).reshape(N_p * C, K)
    targ_flat = jnp.swapaxes(probs_targ, 1, 2).reshape(N_t * C, K)
    pool_flat = pool_flat.astype(jnp.float32)
    targ_flat = targ_flat.astype(jnp.float32)

    entropy_pool = _marginal_entropy_flat(pool_flat, N_p, C)
    entropy_targ = jnp.mean(_marginal_entropy_flat(targ_flat, N_t, C))

    rowsums = joint_xlogy_rowsums(
        pool_flat, targ_flat, num_samples=K, interpret=interpret,
        use_int8=use_int8)
    entropy_joint = -jnp.sum(rowsums.reshape(N_p, C), axis=1) / N_t
    return entropy_pool + entropy_targ - entropy_joint
