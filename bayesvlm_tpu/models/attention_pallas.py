"""Fused multi-head attention kernel (Pallas/Mosaic, TPU).

Why: at ViT-L shapes (T=257, H=16, Dh=64, B=64) the XLA path writes the
[B, H, T, T] score tensor to HBM between the qk GEMM, the softmax fusion,
and the pv GEMM — ~540 MB of traffic per layer at B=64, ~40% of total
attention time (measured breakdown in BASELINE.md). This kernel keeps one
batch row's q/k/v (3 x [T, H*Dh] bf16 ~ 1.6 MB) in VMEM and runs all
16 heads' qk -> fp32 softmax -> pv without materializing scores off-chip.

Layout: inputs stay in the Dense-output layout [B, T, H*Dh] — heads are
lane slices, so no transposes are introduced on either side.

Numerics: fp32 score accumulation (preferred_element_type) and fp32
softmax — the same precision contract as the default einsum path with
softmax_fp32=True. Non-causal only (the vision towers); the text towers
(T<=77, tiny batches) keep the einsum path.

No reference counterpart (the reference is torch single-device); this is
the SURVEY §7 step-8 fusion target, moved from the Smith head (already
XLA-fused well) to attention where the measured headroom is.

Multi-chip composition: batch-sharded GSPMD jit partitions the kernel's
grid along the sharded batch (verified exact vs unsharded —
tests/test_pallas_attention.py). Under jax.shard_map, interpret-mode
pallas currently trips the check_vma validator upstream (a
dynamic_slice vma mismatch inside the interpreter); pass
check_vma=False there, or use GSPMD sharding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _out_struct(shape, x):
    """ShapeDtypeStruct matching x's dtype and, inside shard_map traces,
    its varying-mesh-axes (vma) — required for pallas_call outputs under
    jax.shard_map(check_vma=True)."""
    try:
        vma = jax.typeof(x).vma
    except Exception:
        vma = None
    if vma:
        return jax.ShapeDtypeStruct(shape, x.dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, x.dtype)


def _mha_split_kernel(q_ref, kp_ref, kc_ref, vp_ref, vc_ref, o_ref, s_ref,
                      *, num_heads: int, head_dim: int, scale: float):
    """Staged MHA with the key axis split into a 128-multiple main block
    plus an r-key remainder (r = T % 128).

    Hypothesis: at T=257 the one-block kernel pads the score lanes
    257 -> 384 — a 1.5x tax on both MXU passes. Splitting one key off
    makes the main score block tile exactly ([T, 256] at ViT-L/H); the
    remainder contributes a thin [T, r] column and a rank-r pv
    correction. Algebraically identical: softmax over keys is invariant
    to partitioning the key set (the -inf filler lanes contribute
    exp() = 0, same fp32 contract as the one-block path).

    MEASURED NEGATIVE (v5 lite, B=80 ViT-L shapes): 1.60 ms vs 1.07 ms
    one-block; end-to-end 859.9 vs 936.0 img/s. The one-block kernel
    runs at only ~20 TFLOP/s — it is softmax/VPU- and VMEM-bound, not
    MXU-bound, so shaving the MXU lane padding buys nothing while the
    per-head remainder stores and -inf fills add VPU work. Kept as an
    opt-in (`fused_attention(..., split_key=True)`), exact-match tested
    at several remainder widths.
    """
    q = q_ref[0]                      # [T, H*Dh] bf16
    kp = kp_ref[0]                    # [T_main, H*Dh]
    kc = kc_ref[0]                    # [r, H*Dh]
    vp = vp_ref[0]
    vc = vc_ref[0]
    r = kc.shape[0]
    T, D = q.shape
    t_main = kp.shape[0]
    r_pad = s_ref.shape[-1] - t_main  # remainder lane-tile (r -> 128)

    neg_inf = jnp.float32(-jnp.inf)
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        # main block: exact-tiling [T, t_main] matmul (no 257->384 lane
        # padding on the MXU pass)
        s_ref[h, :, :t_main] = jax.lax.dot_general(
            q[:, sl], kp[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        # remainder lane-tile: -inf filler (exp -> 0 under the unchanged
        # softmax below), real scores for the r remainder keys on top
        s_ref[h, :, t_main:] = jnp.full((T, r_pad), neg_inf, jnp.float32)
        if r == 1:
            # Mosaic rejects the N=1 matmul form; a lane reduction is
            # exact (bf16*bf16 -> fp32 products, fp32 sum)
            s_ref[h, :, t_main:t_main + 1] = jnp.sum(
                q[:, sl].astype(jnp.float32) * kc[:, sl].astype(jnp.float32),
                axis=-1, keepdims=True,
            ) * scale
        else:
            s_ref[h, :, t_main:t_main + r] = jax.lax.dot_general(
                q[:, sl], kc[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
    # identical softmax structure to the one-block kernel (the -inf
    # filler lanes contribute exp() = 0)
    p = jax.nn.softmax(s_ref[:], axis=-1).astype(q.dtype)
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        main = jax.lax.dot_general(
            p[h, :, :t_main], vp[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if r == 1:
            rest = (p[h, :, t_main:t_main + 1].astype(jnp.float32)
                    * vc[0:1, sl].astype(jnp.float32))   # [T,1]*[1,Dh]
        else:
            rest = jax.lax.dot_general(
                p[h, :, t_main:t_main + r], vc[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[0, :, sl] = (main + rest).astype(o_ref.dtype)


def _mha_packed_kernel(q_ref, k_ref, v_ref, o_ref, s_ref, *, num_heads: int,
                       head_dim: int, scale: float):
    """Packed-pair schedule: two Dh=64 heads share one 128-lane register
    (round-3 VERDICT #3 probe, scripts/dev/probe_packed_heads.py).

    Per head pair p = (2p, 2p+1): K'/V' are [2T, 2*Dh] block-diagonal
    (head A in rows 0:T lanes 0:Dh, head B in rows T:2T lanes Dh:2Dh) —
    the qk and pv dots contract over all 128 lanes instead of 64, and
    the cross-segment products are exact zeros. The scores block is
    [T, 2T] (head A cols 0:T, head B cols T:2T), so the softmax is
    SEGMENTED along the key axis via an iota mask; in padded-lane terms
    the packed softmax touches FEWER elements than per-head
    ((H/2)*ceil(2T/128) vs H*ceil(T/128) lane tiles: 8*640 < 16*384 at
    T=257).

    Block-diagonal operands are built value-level (concatenate), never
    via ragged scratch stores: compiled Mosaic silently zero-drops
    masked sub-tile stores like ref[:257, :64] = ... (interpret mode
    executes them fine) — observed on chip in the round-4 probe, same
    alignment family as the int8 ragged-row-block crash (CLAUDE.md).

    Requires even num_heads (all production towers: 12 or 16 heads).
    """
    q = q_ref[0]                      # [T, H*Dh] bf16
    k = k_ref[0]
    v = v_ref[0]
    T = q.shape[0]
    z = jnp.zeros((T, head_dim), k.dtype)
    pairs = num_heads // 2
    for p in range(pairs):
        a = slice((2 * p) * head_dim, (2 * p + 1) * head_dim)
        b = slice((2 * p + 1) * head_dim, (2 * p + 2) * head_dim)
        ab = slice((2 * p) * head_dim, (2 * p + 2) * head_dim)
        kp = jnp.concatenate(
            [jnp.concatenate([k[:, a], z], axis=1),
             jnp.concatenate([z, k[:, b]], axis=1)], axis=0)  # [2T, 2Dh]
        s_ref[p] = jax.lax.dot_general(
            q[:, ab], kp,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                     # [T, 2T] fp32
    # segmented fp32 softmax: keys of head A live in cols 0:T, head B in
    # T:2T; max-subtraction and the normalizer stay per-segment (same
    # numerics contract as jax.nn.softmax on the per-head blocks)
    s = s_ref[:]                                       # [pairs, T, 2T]
    in_b = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) >= T
    neg_inf = jnp.float32(-jnp.inf)
    m_a = jnp.max(jnp.where(in_b, neg_inf, s), axis=-1, keepdims=True)
    m_b = jnp.max(jnp.where(in_b, s, neg_inf), axis=-1, keepdims=True)
    e = jnp.exp(s - jnp.where(in_b, m_b, m_a))
    d_a = jnp.sum(jnp.where(in_b, 0.0, e), axis=-1, keepdims=True)
    d_b = jnp.sum(jnp.where(in_b, e, 0.0), axis=-1, keepdims=True)
    prob = (e / jnp.where(in_b, d_b, d_a)).astype(q.dtype)  # [pairs, T, 2T]
    for p in range(pairs):
        a = slice((2 * p) * head_dim, (2 * p + 1) * head_dim)
        b = slice((2 * p + 1) * head_dim, (2 * p + 2) * head_dim)
        ab = slice((2 * p) * head_dim, (2 * p + 2) * head_dim)
        vp = jnp.concatenate(
            [jnp.concatenate([v[:, a], z], axis=1),
             jnp.concatenate([z, v[:, b]], axis=1)], axis=0)  # [2T, 2Dh]
        o_ref[0, :, ab] = jax.lax.dot_general(
            prob[p], vp,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, s_ref, *, num_heads: int,
                head_dim: int, scale: float):
    # Staged schedule (measured 11% faster than per-head
    # dot->softmax->dot at ViT-L B=64): all heads' qk scores land in the
    # fp32 VMEM scratch first, the softmax runs once over the whole
    # [H, T, T] block (bigger VPU batches), then the pv dots drain it.
    q = q_ref[0]                      # [T, H*Dh] bf16
    k = k_ref[0]
    v = v_ref[0]
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s_ref[h] = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                     # [T, T] fp32
    p = jax.nn.softmax(s_ref[:], axis=-1).astype(q.dtype)  # [H, T, T]
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p[h], v[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _mha_block_kernel(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wk_ref,
                      bk_ref, wv_ref, bv_ref, wo_ref, bo_ref, o_ref, s_ref,
                      a_ref, *, num_heads: int, head_dim: int, scale: float,
                      group: int, ln_eps: float):
    """Whole attention sublayer for one batch row: fp32 LayerNorm -> QKV
    projections -> staged per-head attention -> output projection ->
    residual add, all inside VMEM.

    Weights have constant index maps, so Mosaic keeps them resident
    across the grid instead of re-fetching per program. The LN output,
    q/k/v and attention-output intermediates never leave VMEM, and the
    LN reduction (a separate ~0.2 ms/layer fusion on the XLA path) is
    absorbed into the kernel. Scores go through an fp32 scratch in head
    groups of `group` to stay under the VMEM budget alongside the 4
    resident weight matrices.
    """
    x_raw = x_ref[0]                              # [T, D] bf16 (pre-LN)
    xf = x_raw.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    x = (
        (xf - mu) * jax.lax.rsqrt(var + ln_eps) * lns_ref[0]
        + lnb_ref[0]
    ).astype(x_raw.dtype)                         # post-LN, bf16

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(
            x, w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0].astype(jnp.float32)
        return y.astype(x.dtype)

    q = proj(wq_ref, bq_ref)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)

    for g in range(num_heads // group):
        for j in range(group):
            sl = slice((g * group + j) * head_dim,
                       (g * group + j + 1) * head_dim)
            s_ref[j] = jax.lax.dot_general(
                q[:, sl], k[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        p = jax.nn.softmax(s_ref[:], axis=-1).astype(x.dtype)
        for j in range(group):
            sl = slice((g * group + j) * head_dim,
                       (g * group + j + 1) * head_dim)
            a_ref[:, sl] = jax.lax.dot_general(
                p[j], v[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)

    out = jax.lax.dot_general(
        a_ref[:], wo_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[0].astype(jnp.float32)
    # residual add (the XLA path does x + attn_out in bf16)
    o_ref[0] = x_raw + out.astype(o_ref.dtype)


def _pick_head_group(num_heads: int, T: int, D: int, itemsize: int) -> int:
    """Largest head-group whose fp32 scores scratch + the 4 resident
    weight matrices fit the VMEM budget (~16 MB, 11 MB headroom).

    The result must DIVIDE num_heads — _mha_block_kernel loops
    range(num_heads // group) head-groups, so a non-divisor would
    silently drop the trailing heads (their output lanes would read
    stale scratch). Step down through divisors until the scratch fits.
    """
    def scratch_bytes(g):
        pad_t = ((T + 7) // 8) * 8
        pad_l = ((T + 127) // 128) * 128
        return g * pad_t * pad_l * 4

    weight_bytes = 4 * D * D * itemsize
    group = num_heads
    while group > 1 and scratch_bytes(group) + weight_bytes > 11 * 2**20:
        group -= 1
        while num_heads % group:
            group -= 1
    return group


@functools.partial(jax.jit, static_argnames=("num_heads", "ln_eps"))
def fused_attention_block(x: jax.Array, ln_scale, ln_bias, wq, bq, wk, bk,
                          wv, bv, wo, bo, num_heads: int,
                          ln_eps: float = 1e-5) -> jax.Array:
    """Non-causal attention SUBLAYER with pre-LN and residual:
    x (PRE-LN, [B, T, D]) -> x + out_proj(MHA(LN(x))). Weights [D, D]
    bf16, biases [D], LN params fp32."""
    B, T, D = x.shape
    head_dim = D // num_heads
    group = _pick_head_group(num_heads, T, D, x.dtype.itemsize)

    kernel = functools.partial(
        _mha_block_kernel, num_heads=num_heads, head_dim=head_dim,
        scale=1.0 / (head_dim ** 0.5), group=group, ln_eps=ln_eps,
    )
    row = pl.BlockSpec((1, T, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((D, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    b2 = lambda b_: b_.reshape(1, D)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[row, bspec, bspec,
                  wspec, bspec, wspec, bspec, wspec, bspec, wspec, bspec],
        out_specs=row,
        out_shape=_out_struct((B, T, D), x),
        scratch_shapes=[
            pltpu.VMEM((group, T, T), jnp.float32),
            pltpu.VMEM((T, D), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * (8 * T * D * D + 4 * num_heads * T * T * head_dim),
            bytes_accessed=2 * B * T * D * x.dtype.itemsize + 4 * D * D * 2,
            transcendentals=B * num_heads * T * T,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, ln_scale.reshape(1, D).astype(jnp.float32),
      ln_bias.reshape(1, D).astype(jnp.float32),
      wq, b2(bq), wk, b2(bk), wv, b2(bv), wo, b2(bo))


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "split_key", "packed_heads"))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    num_heads: int, split_key: bool = False,
                    packed_heads: bool = False) -> jax.Array:
    """Non-causal MHA: q, k, v [B, T, H*Dh] (packed heads) -> [B, T, H*Dh].

    Equivalent to the einsum path with fp32 softmax; scores never leave
    VMEM. split_key=True routes to the measured-slower split-key
    schedule (see _mha_split_kernel — kept as a tested research
    variant, NOT the production path). packed_heads=True routes to the
    packed-pair schedule (_mha_packed_kernel, round-4 probe; requires
    even num_heads).
    """
    B, T, D = q.shape
    head_dim = D // num_heads
    interpret = jax.default_backend() != "tpu"

    if packed_heads:
        if num_heads % 2:
            raise ValueError("packed_heads requires an even head count")
        kernel = functools.partial(
            _mha_packed_kernel, num_heads=num_heads, head_dim=head_dim,
            scale=1.0 / (head_dim ** 0.5),
        )
        spec = pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=_out_struct((B, T, D), q),
            scratch_shapes=[
                pltpu.VMEM((num_heads // 2, T, 2 * T), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=8 * B * num_heads * T * T * head_dim,
                bytes_accessed=4 * B * T * D * q.dtype.itemsize,
                transcendentals=B * num_heads * T * T,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=48 * 1024 * 1024,
            ),
            interpret=interpret,
        )(q, k, v)

    t_main = (T // 128) * 128
    r = T - t_main
    if split_key and t_main > 0 and r > 0:
        # split-key schedule: exact-tiling main block + r-key remainder
        # (measured SLOWER than the one-block kernel at ViT-L B=80:
        # 859.9 vs 936.0 img/s end-to-end — see BASELINE.md)
        kernel = functools.partial(
            _mha_split_kernel, num_heads=num_heads, head_dim=head_dim,
            scale=1.0 / (head_dim ** 0.5),
        )
        spec = pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((1, t_main, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
        rspec = pl.BlockSpec((1, r, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[spec, mspec, rspec, mspec, rspec],
            out_specs=spec,
            out_shape=_out_struct((B, T, D), q),
            scratch_shapes=[
                pltpu.VMEM((num_heads, T, t_main + 128), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=4 * B * num_heads * T * T * head_dim,
                bytes_accessed=4 * B * T * D * q.dtype.itemsize,
                transcendentals=B * num_heads * T * T,
            ),
            # the split inputs + fp32 scratch land ~1.5 MB over the 16 MB
            # default scoped-vmem limit at ViT-L shapes; the chip has
            # 128 MB VMEM, so raise the per-kernel cap
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024,
            ),
            interpret=interpret,
        )(q, k[:, :t_main], k[:, t_main:], v[:, :t_main], v[:, t_main:])

    kernel = functools.partial(
        _mha_kernel, num_heads=num_heads, head_dim=head_dim,
        scale=1.0 / (head_dim ** 0.5),
    )
    spec = pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=_out_struct((B, T, D), q),
        scratch_shapes=[pltpu.VMEM((num_heads, T, T), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * T * T * head_dim,
            bytes_accessed=4 * B * T * D * q.dtype.itemsize,
            transcendentals=B * num_heads * T * T,
        ),
        # batch rows are independent: parallel semantics lets Mosaic
        # overlap grid iterations (measured 1.139 -> 1.106 ms at B=80).
        # vmem_limit: at D>=1280 (ViT-H) the resident q/k/v/o rows + fp32
        # scores scratch overflow the 16 MB default scoped cap by ~0.7 MB;
        # the chip has 128 MB (same raise as the split-key variant above).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        # CPU (tests, virtual meshes): run the kernel in interpret mode
        interpret=interpret,
    )(q, k, v)
