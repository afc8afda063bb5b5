"""Fused attentive-pool kernel: LayerNorm + kv-projection + softmax date
reduction in one VMEM pass.

Reference semantics: ``AttentiveReduce`` (/root/reference/maestro/layers/
head.py:28-63) applied over the date axis of the segmentation head's
ref-grid tokens (mim.py:343-394) — for every position, a single learned
query attends over the dates.  The XLA formulation materializes LN(x)
([B,D,L,E]), then k/v ([B,D,L,2E]), then attention weights — ~5x the input
in HBM round-trips, and in the r3 finetune trace the scan that bounds that
memory spent more time on slice/reshape/LN traffic than on the kv matmul
it exists to feed (while.17/18 = 191 ms of a 599 ms step).

Here each (batch, position-block) grid cell streams the date axis through
VMEM once: per date, LN runs on registers (fp32 stats), the kv projection
is one [BL,E]x[E,2E] MXU matmul, and an online softmax accumulates the
v-weighted pool — x is read once, out is written once, nothing else
touches HBM.  Per-head score/broadcast math avoids head loops and lane
masks by using two tiny block-diagonal selector matmuls:

  logits[l,h] = (k @ Qmat)[l,h]      Qmat[e,h] = query[e] * [e in head h]
  bcast[l,e]  = (p @ S)[l,e]         S[h,e]    = [e in head h]

The backward pass is a custom VJP: the forward saves only x and the
per-(position, head) softmax max/denominator (m, s — [B,L,H], ~1MB at
FLAIR scale), and the bwd kernel recomputes LN/kv per date, accumulating
dW_kv / dquery / dscale / dbias across position blocks in revisited output
blocks (sequential grid semantics).  Because the residual set is just the
input, callers need no rematerialization wrapper around the reduce.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl

INTERPRET = False
# position-block rows: bounded by VMEM (x and dx blocks are double-buffered
# across grid steps; the bwd also keeps the fp32 dW_kv accumulator resident).
_FWD_BL = 128
# bwd blocks 128 positions x _BWD_DBLK dates per grid cell: the matmuls then
# run with >=128 rows (a 48-row M dim leaves 62% of the MXU idle — the r3
# profile showed the first bwd kernel merely matching XLA for that reason)
_BWD_BL = 128
_BWD_DBLK = 4


def _selectors(query: jnp.ndarray, heads: int, dtype):
    """Qmat [E, H] (query laid block-diagonally) and S [H, E] (head masks)."""
    e = query.shape[0]
    dh = e // heads
    head_of = (jnp.arange(e) // dh)[:, None]  # [E, 1]
    hs = jnp.arange(heads)[None, :]  # [1, H]
    mask = (head_of == hs).astype(dtype)  # [E, H]
    qmat = query.astype(dtype)[:, None] * mask
    return qmat, mask.T  # [E, H], [H, E]


def _ln_fwd(xd, scale, bias, eps):
    """Row LayerNorm in fp32 registers; returns (y, xhat, rstd)."""
    xd = xd.astype(jnp.float32)
    mu = jnp.mean(xd, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xd - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xd - mu) * rstd
    return xhat * scale + bias, xhat, rstd


def _fwd_kernel(x_ref, scale_ref, bias_ref, wkv_ref, qmat_ref, s_ref,
                o_ref, m_ref, den_ref, *, eps, sm_scale):
    # nb batch elements per grid cell: in the seg-chunk regime the position
    # block is l=64, and a 64-row matmul M dim leaves half the 128-wide MXU
    # idle — stacking batch rows restores a full M without touching the
    # online-softmax math (every row is an independent (batch, position)
    # pair; the date axis stays the only sequential one)
    nb, d = x_ref.shape[0], x_ref.shape[1]
    bl, e = x_ref.shape[2], x_ref.shape[3]
    rows = nb * bl
    h = qmat_ref.shape[1]
    scale = scale_ref[...].astype(jnp.float32)  # [1, E]
    bias = bias_ref[...].astype(jnp.float32)
    sel = s_ref[...].astype(jnp.float32)  # [H, E]

    def date_step(di, carry):
        m, den, acc = carry
        y, _, _ = _ln_fwd(x_ref[:, di].reshape(rows, e), scale, bias, eps)
        kv = jax.lax.dot(
            y.astype(x_ref.dtype), wkv_ref[...],
            preferred_element_type=jnp.float32,
        )  # [rows, 2E]
        k, v = kv[:, :e], kv[:, e:]
        logit = jax.lax.dot(
            k.astype(x_ref.dtype), qmat_ref[...],
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [rows, H]
        mn = jnp.maximum(m, logit)
        alpha = jnp.exp(m - mn)
        p = jnp.exp(logit - mn)
        # per-head broadcast via fp32 selector matmuls (tiny [rows,H]x[H,E]):
        # the rescaling factors compound over dates, so keep them fp32
        ab = jax.lax.dot(alpha, sel, preferred_element_type=jnp.float32)
        pb = jax.lax.dot(p, sel, preferred_element_type=jnp.float32)
        return mn, den * alpha + p, acc * ab + pb * v

    # fori_loop (not an unrolled python loop): Mosaic allocates scoped VMEM
    # for every unrolled iteration's temporaries simultaneously — 26 dates
    # of [rows,2E] fp32 intermediates blew the 16 MB limit 5x over
    m, den, acc = jax.lax.fori_loop(
        0, d, date_step,
        (jnp.full((rows, h), -1e30, jnp.float32),
         jnp.zeros((rows, h), jnp.float32),
         jnp.zeros((rows, e), jnp.float32)),
    )
    db = jax.lax.dot(den, sel, preferred_element_type=jnp.float32)
    o_ref[...] = (acc / db).reshape(nb, bl, e).astype(o_ref.dtype)
    m_ref[...] = m.reshape(nb, bl, h)
    den_ref[...] = den.reshape(nb, bl, h)


def _bwd_kernel(x_ref, scale_ref, bias_ref, wkv_ref, qmat_ref, s_ref,
                m_ref, den_ref, g_ref, out_ref,
                dx_ref, dw_ref, dqm_ref, dscale_ref, dbias_ref,
                *, eps, sm_scale, d_total):
    """One (batch, position-block, date-block) grid cell of the backward.

    The softmax-bwd pivot ``T[l,h] = sum_d a_d * (g . v_d)_h`` needs no date
    sweep: attention is linear in v, so ``sum_d a_d v_d`` IS the forward
    output and ``T[l,h] = sum_{e in head h} g[l,e] * out[l,e]`` — one tiny
    selector matmul on saved tensors.  That removes the whole first
    recompute pass the r3 kernel paid (one of its two LN+kv sweeps), and
    with T independent of the date axis, dates can block into the grid:
    every matmul below runs with _BWD_DBLK*_BWD_BL (=512) rows instead of
    48, the difference between a starved and a full MXU M dimension.
    """
    i, j, dj = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    dblk = x_ref.shape[1]
    bl, e = x_ref.shape[2], x_ref.shape[3]
    h = qmat_ref.shape[1]
    rows = dblk * bl
    scale = scale_ref[...].astype(jnp.float32)  # [1, E]
    bias = bias_ref[...].astype(jnp.float32)
    sel = s_ref[...].astype(jnp.float32)  # [H, E]
    m = m_ref[0]  # [BL, H] fp32
    den = den_ref[0]
    g = g_ref[0].astype(jnp.float32)  # [BL, E]
    outv = out_ref[0].astype(jnp.float32)  # [BL, E]

    @pl.when((i == 0) & (j == 0) & (dj == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dqm_ref[...] = jnp.zeros_like(dqm_ref)
        dscale_ref[...] = jnp.zeros_like(dscale_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    in_dt = x_ref.dtype
    contract = lambda lhs, rhs, dims: jax.lax.dot_general(
        lhs, rhs, (dims, ((), ())), preferred_element_type=jnp.float32,
    )

    t_acc = contract(g * outv, sel, ((1,), (1,)))  # [BL, H]

    y, xhat, rstd = _ln_fwd(x_ref[0].reshape(rows, e), scale, bias, eps)
    kv = jax.lax.dot(y.astype(in_dt), wkv_ref[...],
                     preferred_element_type=jnp.float32)  # [rows, 2E]
    k, v = kv[:, :e], kv[:, e:]
    logit = jax.lax.dot(k.astype(in_dt), qmat_ref[...],
                        preferred_element_type=jnp.float32) * sm_scale
    # date-padding tail: kill those rows' softmax weights before exp (the
    # padded x rows are zeros, but LN(0)=bias gives a finite garbage logit)
    live = (
        dj * dblk + jax.lax.broadcasted_iota(jnp.int32, (dblk, 1, 1), 0)
    ) < d_total
    logit = jnp.where(live, logit.reshape(dblk, bl, h), -1e30)
    a = (jnp.exp(logit - m) / den).reshape(rows, h)  # [rows, H]

    gr = jnp.broadcast_to(g[None], (dblk, bl, e)).reshape(rows, e)
    t_d = contract(gr * v, sel, ((1,), (1,)))  # [rows, H]
    t_rep = jnp.broadcast_to(t_acc[None], (dblk, bl, h)).reshape(rows, h)
    dlogit = a * (t_d - t_rep)  # [rows, H]
    ab = jax.lax.dot(a, sel, preferred_element_type=jnp.float32)
    dv = ab * gr  # [rows, E]
    dlb = jax.lax.dot(dlogit, sel, preferred_element_type=jnp.float32)
    # dk[l,e] = dlogit[l,h(e)] * query[e] * sm_scale; query[e] is Qmat
    # summed over heads — recover it from the selector layout
    qvec = jnp.sum(qmat_ref[...].astype(jnp.float32), axis=1)[None, :]
    dk = dlb * qvec * sm_scale
    dqm_ref[...] += contract(k * sm_scale, dlogit, ((0,), (0,)))  # [E, H]
    dkv = jnp.concatenate([dk, dv], axis=1).astype(in_dt)  # [rows, 2E]
    dy = contract(dkv, wkv_ref[...], ((1,), (1,)))  # [rows, E]
    dw_ref[...] += contract(y, dkv.astype(jnp.float32), ((0,), (0,)))
    # LayerNorm backward
    dscale_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbias_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dxh = dy * scale
    mean1 = jnp.mean(dxh, axis=-1, keepdims=True)
    mean2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxh - mean1 - xhat * mean2)
    dx_ref[0] = dx.reshape(dblk, bl, e).astype(dx_ref.dtype)


def _pad_rows(x, pad):
    if not pad:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def attentive_pool(x, ln_scale, ln_bias, w_kv, query, heads: int,
                   eps: float = 1e-5):
    """[B, D, L, E] -> [B, L, E]: LN + kv-proj + softmax pool over D.

    Equivalent to AttentiveReduce's rank-4 body up to (but not including)
    the final ``norm_fc`` LayerNorm.  E must be a multiple of 128 and of
    ``heads``; use the XLA path otherwise.
    """
    out, _, _ = _fwd_impl(x, ln_scale, ln_bias, w_kv, query, heads, eps)
    return out


def _fwd_impl(x, ln_scale, ln_bias, w_kv, query, heads, eps, block=None):
    b, d, l, e = x.shape
    bl = min(block or _FWD_BL, _round_up(l, 8))
    pad = (-l) % bl
    lp = l + pad
    xp = _pad_rows(x, pad)
    # batch elements per grid cell: fill the MXU's 128-row M dim when the
    # position block alone can't (seg chunks: l=64); see _fwd_kernel. The
    # VMEM cost scales with nb*d*bl*e, so nb never exceeds what _FWD_BL
    # rows allow.
    nb = min(b, max(1, _FWD_BL // bl))
    while b % nb:
        nb -= 1
    qmat, sel = _selectors(query, heads, x.dtype)
    sm_scale = (e // heads) ** -0.5
    kernel = partial(_fwd_kernel, eps=eps, sm_scale=sm_scale)
    out, m, den = pl.pallas_call(
        kernel,
        grid=(b // nb, lp // bl),
        in_specs=[
            pl.BlockSpec((nb, d, bl, e), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, e), lambda i, j: (0, 0)),
            pl.BlockSpec((1, e), lambda i, j: (0, 0)),
            pl.BlockSpec((e, 2 * e), lambda i, j: (0, 0)),
            pl.BlockSpec((e, heads), lambda i, j: (0, 0)),
            pl.BlockSpec((heads, e), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nb, bl, e), lambda i, j: (i, j, 0)),
            pl.BlockSpec((nb, bl, heads), lambda i, j: (i, j, 0)),
            pl.BlockSpec((nb, bl, heads), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lp, e), x.dtype),
            jax.ShapeDtypeStruct((b, lp, heads), jnp.float32),
            jax.ShapeDtypeStruct((b, lp, heads), jnp.float32),
        ],
        compiler_params=_params(),
        cost_estimate=_fwd_cost(b, d, l, e, heads),
        interpret=INTERPRET,
    )(xp, ln_scale[None].astype(x.dtype), ln_bias[None].astype(x.dtype),
      w_kv.astype(x.dtype), qmat, sel)
    return out[:, :l], m[:, :l], den[:, :l]


def _round_up(n, k):
    return -(-n // k) * k


def _pick_dblk(d: int, bl: int) -> tuple[int, int]:
    """(date-block size, date padding) for the bwd grid.

    Prefer a divisor of d — the XLA-side jnp.pad of x to a dblk multiple is
    a full extra HBM copy of the input (~6 ms/step across the FLAIR seg
    chunks, measured r4) — subject to the matmul M dim ``dblk*bl`` landing
    in [128, 1024]: >=128 fills the MXU's M dimension, <=1024 keeps the
    fp32 kv/dkv temporaries inside the kernel's VMEM budget.  Falls back to
    the padded fixed block when d has no usable divisor (e.g. prime d with
    d*bl too large).
    """
    hi = max(1, 1024 // bl)
    for k in range(min(d, hi), 0, -1):
        if d % k == 0 and (k * bl >= 128 or k == d):
            return k, 0
    k = min(_BWD_DBLK, d)
    return k, (-d) % k


def _params():
    from jax.experimental.pallas import tpu as pltpu

    # position blocks revisit the parameter-gradient outputs -> the grid
    # must iterate them sequentially (accumulation), batch stays parallel.
    # vmem_limit_bytes: the default 16 MB scoped-vmem budget is marginal for
    # the [1, D, 128, E] x-block at FLAIR scale (D=26: 4.9 MB double-
    # buffered + fp32 temporaries) — surrounding-fusion changes pushed one
    # build to 19.75 MB and a compile-time OOM; the per-kernel raise does
    # not touch XLA's budget elsewhere
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
        vmem_limit_bytes=64 * 1024 * 1024,
    )


def _bwd_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        vmem_limit_bytes=64 * 1024 * 1024,
    )


def _fwd_cost(b, d, l, e, h):
    """Honest executed-flop estimate: XLA cost analysis scores an opaque
    custom call at ~0 flops, which silently deflates measured MFU when a
    kernel replaces counted XLA ops (bench.py derives MFU from
    compiled.cost_analysis()['flops'])."""
    rows = b * d * l
    return pl.CostEstimate(
        flops=rows * (4 * e * e + 2 * e * h + 12 * e),
        transcendentals=rows * 2 * h,
        bytes_accessed=(
            b * d * l * e * 2  # x read (bf16 nominal)
            + b * l * e * 2  # out write
            + 2 * b * l * h * 4  # m/den
            + 2 * e * 2 * e
        ),
    )


def _bwd_cost(b, d, l, e, h):
    rows = b * d * l
    return pl.CostEstimate(
        flops=rows * (12 * e * e + 8 * e * h + 25 * e),
        transcendentals=rows * h,
        bytes_accessed=(
            2 * b * d * l * e * 2  # x read + dx write
            + 2 * b * l * e * 2  # g, out reads
            + 2 * b * l * h * 4
            + 3 * e * 2 * e * 4
        ),
    )


def _vjp_fwd(x, ln_scale, ln_bias, w_kv, query, heads, eps):
    out, m, den = _fwd_impl(x, ln_scale, ln_bias, w_kv, query, heads, eps)
    # out joins the residuals: the bwd derives the softmax pivot from it
    # (T = per-head <g, out>) instead of re-sweeping the date axis.
    # (out, m, den) are named so a rematerialized caller (the seg head's
    # chunk scan) can SAVE them across the fwd/bwd split instead of
    # replaying the whole forward kernel: they are ~L*(E+16) floats per
    # chunk vs the D*L*E input, and with them saved the recompute pass only
    # rebuilds x (cheap resize einsum) while the fwd pallas_call is DCE'd —
    # x itself stays unnamed exactly so it is NOT stored.
    out, m, den = checkpoint_name((out, m, den), "attn_pool_residuals")
    return out, (x, ln_scale, ln_bias, w_kv, query, m, den, out)


def _vjp_bwd(heads, eps, res, g):
    x, ln_scale, ln_bias, w_kv, query, m, den, out = res
    b, d, l, e = x.shape
    bl = min(_BWD_BL, _round_up(l, 8))
    pad = (-l) % bl
    lp = l + pad
    dblk, dpad = _pick_dblk(d, bl)
    dp = d + dpad
    xp = _pad_rows(x, pad)
    if dpad:
        xp = jnp.pad(xp, ((0, 0), (0, dpad), (0, 0), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, pad), (0, 0))) if pad else g
    # padded positions: m=+1e30 underflows every exp(logit - m) to an exact
    # zero weight (den pads to 1 so the division stays finite); their
    # cotangent rows (gp) are zero as well
    if pad:
        m = jnp.pad(m, ((0, 0), (0, pad), (0, 0)), constant_values=1e30)
        den = jnp.pad(den, ((0, 0), (0, pad), (0, 0)),
                      constant_values=1.0)
        out = jnp.pad(out, ((0, 0), (0, pad), (0, 0)))
    qmat, sel = _selectors(query, heads, x.dtype)
    sm_scale = (e // heads) ** -0.5
    kernel = partial(_bwd_kernel, eps=eps, sm_scale=sm_scale, d_total=d)
    dx, dw, dqm, dsc, dbi = pl.pallas_call(
        kernel,
        grid=(b, lp // bl, dp // dblk),
        in_specs=[
            pl.BlockSpec((1, dblk, bl, e), lambda i, j, dj: (i, dj, j, 0)),
            pl.BlockSpec((1, e), lambda i, j, dj: (0, 0)),
            pl.BlockSpec((1, e), lambda i, j, dj: (0, 0)),
            pl.BlockSpec((e, 2 * e), lambda i, j, dj: (0, 0)),
            pl.BlockSpec((e, heads), lambda i, j, dj: (0, 0)),
            pl.BlockSpec((heads, e), lambda i, j, dj: (0, 0)),
            pl.BlockSpec((1, bl, heads), lambda i, j, dj: (i, j, 0)),
            pl.BlockSpec((1, bl, heads), lambda i, j, dj: (i, j, 0)),
            pl.BlockSpec((1, bl, e), lambda i, j, dj: (i, j, 0)),
            pl.BlockSpec((1, bl, e), lambda i, j, dj: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, dblk, bl, e), lambda i, j, dj: (i, dj, j, 0)),
            pl.BlockSpec((e, 2 * e), lambda i, j, dj: (0, 0)),
            pl.BlockSpec((e, heads), lambda i, j, dj: (0, 0)),
            pl.BlockSpec((1, e), lambda i, j, dj: (0, 0)),
            pl.BlockSpec((1, e), lambda i, j, dj: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, dp, lp, e), x.dtype),
            jax.ShapeDtypeStruct((e, 2 * e), jnp.float32),
            jax.ShapeDtypeStruct((e, heads), jnp.float32),
            jax.ShapeDtypeStruct((1, e), jnp.float32),
            jax.ShapeDtypeStruct((1, e), jnp.float32),
        ],
        compiler_params=_bwd_params(),
        cost_estimate=_bwd_cost(b, d, l, e, heads),
        interpret=INTERPRET,
    )(xp, ln_scale[None].astype(x.dtype), ln_bias[None].astype(x.dtype),
      w_kv.astype(x.dtype), qmat, sel, m, den, gp, out)
    dx = dx[:, :d, :l]
    # dQmat -> dquery: Qmat[e,h] = query[e]*mask[e,h] -> dquery[e] =
    # sum_h dQmat[e,h]*mask[e,h]; mask rows are one-hot so the sum picks
    # the owning head's entry
    dh_mask = _selectors(jnp.ones_like(query), heads, jnp.float32)[0]
    dquery = jnp.sum(dqm * dh_mask, axis=1)
    return (
        dx,
        dsc[0].astype(ln_scale.dtype),
        dbi[0].astype(ln_bias.dtype),
        dw.astype(w_kv.dtype),
        dquery.astype(query.dtype),
    )


attentive_pool.defvjp(_vjp_fwd, _vjp_bwd)


def attentive_pool_reference(x, ln_scale, ln_bias, w_kv, query, heads,
                             eps: float = 1e-5):
    """Pure-jax reference used by the parity tests (and non-TPU callers
    compare against AttentiveReduce's own XLA body)."""
    b, d, l, e = x.shape
    dh = e // heads
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
    kv = jnp.einsum("bdle,ef->bdlf", y, w_kv.astype(jnp.float32))
    k, v = jnp.split(kv, 2, axis=-1)
    k = k.reshape(b, d, l, heads, dh)
    v = v.reshape(b, d, l, heads, dh)
    q = query.reshape(heads, dh).astype(jnp.float32)
    logits = jnp.einsum("he,bdlhe->bdlh", q, k) * dh**-0.5
    attn = jax.nn.softmax(logits, axis=1)
    out = jnp.einsum("bdlh,bdlhe->blhe", attn, v)
    return out.reshape(b, l, e).astype(x.dtype)
