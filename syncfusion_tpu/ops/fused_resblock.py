"""Pallas-fused GroupNorm→FiLM→SiLU→conv1d(k3) for the diffusion UNet.

Why: XLA cost analysis shows the UNet denoise forward is HBM-bound (76% of
bandwidth, 11% MXU) and the traffic concentrates in the shallow levels
(262144×8ch, 65536×32ch) where every resnet block materializes the
normalized/activated intermediate to HBM before the conv reads it back.
This kernel computes the whole chain in VMEM: x is read once (plus a tiny
2-row halo per tile), the conv output is the only write.

Measured status on v5e: three implementations, all equivalence-tested.
  * ``fused_affine_silu_conv`` (manual halo DMA) — rejected by this image's
    remote Mosaic compiler (DMA-from-ANY pattern; plain-BlockSpec kernels
    like flash attention compile fine).  Interpret-validated.
  * ``fused_affine_silu_conv_blocked`` (plain BlockSpec pipeline + XLA
    boundary fix) — COMPILES on the chip: 1.6× faster than the XLA chain at
    C=32 shapes, 0.4× at C=8 (8-lane tiles waste the VPU).
  * ``folded_affine_silu_conv`` (pure-XLA lane folding) — 1.8× at C=64,
    loses at C≤32 to fold/unfold relayouts.
  End-to-end (full UNet forward, B=8): plain XLA 8.4 ms/item; fused-all
  14.0; fused-C≥32-only 10.3 — in context XLA fuses the GN chains into
  neighbors better than isolated microbenchmarks suggested, so
  ``UNet1d(fused_resnet=...)`` defaults OFF.  The kernels remain available,
  equivalence-tested (plain-vs-fused UNet test), for future toolchains; the
  remaining memory-bound headroom needs whole-level folded layout, not
  per-op fusion (docs/ROADMAP.md).

Division of labor: per-(batch, group) GN statistics are a cheap single
reduction done in plain JAX (reads x once at full bandwidth); the kernel
takes the resolved per-(batch, channel) affine (which folds GN gamma/beta,
FiLM scale/shift, and the stats) and fuses normalize→SiLU→conv.

Shapes: x (B, L, C), weight (3, C, Cout), per-batch affine (B, C) × 2.
L must be divisible by ``block_l``; C and Cout ≤ 128 work best (the shallow
levels), larger C still functions via multiple lane tiles.

Training support: wrapped in ``jax.custom_vjp`` whose backward recomputes
through the reference JAX implementation, so the op is usable everywhere
and the kernel only has to be a forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_L = 4096


def _make_kernel(block_l: int, c: int):
    def kernel(x_hbm, scale_ref, shift_ref, w_ref, b_ref, o_ref):
        """Grid (B, L/TL).  x stays in HBM (padded by 1 row each side); the
        tile DMAs its (TL+2)-row halo window into VMEM — overlapping windows
        can't be expressed as BlockSpecs (blocks stride by their size)."""
        i = pl.program_id(0)
        j = pl.program_id(1)

        def body(scratch, sem):
            dma = pltpu.make_async_copy(
                x_hbm.at[i, pl.ds(j * block_l, block_l + 2), :],
                scratch.at[: block_l + 2],
                sem,
            )
            dma.start()
            dma.wait()
            x = scratch[: block_l + 2].astype(jnp.float32)  # (TL+2, C)
            scale = scale_ref[0].astype(jnp.float32)        # (1, C)
            shift = shift_ref[0].astype(jnp.float32)
            h = x * scale + shift
            h = h * jax.nn.sigmoid(h)                       # SiLU
            # conv SAME zero-pads AFTER the activation: halo rows at the
            # array boundary must be exactly 0, not silu(shift)
            rows = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
            is_first = (j == 0) & (rows == 0)
            is_last = (j == pl.num_programs(1) - 1) & (rows == h.shape[0] - 1)
            h = jnp.where(is_first | is_last, 0.0, h)
            tl = o_ref.shape[1]
            w = w_ref[...].astype(jnp.float32)              # (3, C, Cout)
            acc = jax.lax.dot_general(
                h[0:tl], w[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc += jax.lax.dot_general(
                h[1 : tl + 1], w[1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc += jax.lax.dot_general(
                h[2 : tl + 2], w[2], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0] = (acc + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)

        # scratch sublane dim padded to an 8-aligned size (Mosaic tiling)
        pl.run_scoped(
            body,
            pltpu.VMEM((block_l + 8, c), x_hbm.dtype),
            pltpu.SemaphoreType.DMA(()),
        )

    return kernel


def _fused_forward(x, scale, shift, weight, bias, block_l, interpret):
    b, l, c = x.shape
    cout = weight.shape[-1]
    assert l % block_l == 0, f"L={l} not divisible by block_l={block_l}"
    # halo: pad L by 1 on each side so every window is in-bounds
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))

    grid = (b, l // block_l)
    return pl.pallas_call(
        _make_kernel(block_l, c),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # manual halo DMA
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c, cout), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_l, cout), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, cout), x.dtype),
        interpret=interpret,
    )(xp, scale[:, None, :], shift[:, None, :], weight, bias[None])


def _block_local_kernel(x_ref, scale_ref, shift_ref, w_ref, b_ref, o_ref):
    """Block-LOCAL affine→SiLU→conv (zero halo): each (1, TL, C) tile is
    convolved as if it were an independent sequence; the 2-row contributions
    across block boundaries are patched afterwards in XLA (cheap: 2 rows per
    boundary).  Avoids manual DMA, which this image's remote Mosaic compiler
    rejects — only plain BlockSpec pipelines are used."""
    x = x_ref[0].astype(jnp.float32)                # (TL, C)
    scale = scale_ref[0].astype(jnp.float32)
    shift = shift_ref[0].astype(jnp.float32)
    h = x * scale + shift
    h = h * jax.nn.sigmoid(h)
    tl = h.shape[0]
    w = w_ref[...].astype(jnp.float32)              # (3, C, Cout)

    def mm(a, kern):
        return jax.lax.dot_general(
            a, kern, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    acc = mm(h, w[1])
    # dl=-1 (w[0]) needs h[l-1]; dl=+1 (w[2]) needs h[l+1] — zero at edges
    zero = jnp.zeros((1, h.shape[1]), jnp.float32)
    acc += mm(jnp.concatenate([zero, h[: tl - 1]], axis=0), w[0])
    acc += mm(jnp.concatenate([h[1:], zero], axis=0), w[2])
    o_ref[0] = (acc + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def fused_affine_silu_conv_blocked(x, scale, shift, weight, bias,
                                   block_l: int = DEFAULT_BLOCK_L,
                                   interpret: bool = False):
    """TPU-compilable fused op: Pallas block-local conv + XLA boundary fix.

    x is read once by the pallas pipeline; the boundary correction touches
    only 2·(L/block_l) rows per batch (thousandths of the array).
    """
    b, l, c = x.shape
    cout = weight.shape[-1]
    assert l % block_l == 0, f"L={l} not divisible by block_l={block_l}"
    nb = l // block_l
    # Mosaic kernels only target TPU; interpret elsewhere (CPU tests)
    interpret = interpret or jax.default_backend() != "tpu"

    grid = (b, nb)
    y = pl.pallas_call(
        _block_local_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_l, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c, cout), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_l, cout), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, cout), x.dtype),
        interpret=interpret,
    )(x, scale[:, None, :], shift[:, None, :], weight, bias[None])

    if nb == 1:
        return y

    # ---- boundary corrections (XLA, 2·(nb−1) rows per batch) ------------
    bpos = jnp.arange(1, nb) * block_l                 # first row of blocks 1..
    xf = x.astype(jnp.float32)

    def act(rows):  # rows: (B, nb-1, C)
        h = rows * scale[:, None, :] + shift[:, None, :]
        return jax.nn.silu(h)

    h_first = act(xf[:, bpos])          # h at block starts (missing for y[bpos-1])
    h_last = act(xf[:, bpos - 1])       # h at block ends  (missing for y[bpos])
    w = weight.astype(jnp.float32)
    corr_prev = jnp.einsum("bnc,cd->bnd", h_first, w[2])  # into y[bpos-1]
    corr_next = jnp.einsum("bnc,cd->bnd", h_last, w[0])   # into y[bpos]

    y = y.astype(jnp.float32)
    y = y.at[:, bpos - 1].add(corr_prev)
    y = y.at[:, bpos].add(corr_next)
    return y.astype(x.dtype)


def _reference(x, scale, shift, weight, bias):
    h = x.astype(jnp.float32) * scale[:, None, :] + shift[:, None, :]
    h = jax.nn.silu(h)
    y = jax.lax.conv_general_dilated(
        h, weight.astype(jnp.float32), (1,), [(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + bias
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_affine_silu_conv(x, scale, shift, weight, bias,
                           block_l=DEFAULT_BLOCK_L, interpret=False):
    """y = conv1d_k3(silu(x·scale + shift)) + bias, one HBM read of x.

    ``scale``/``shift`` are per-(batch, channel) — the caller folds GN stats,
    GN gamma/beta and FiLM into them (see :func:`fold_groupnorm_film`).
    """
    return _fused_forward(x, scale, shift, weight, bias, block_l, interpret)


def _fwd(x, scale, shift, weight, bias, block_l, interpret):
    y = _fused_forward(x, scale, shift, weight, bias, block_l, interpret)
    return y, (x, scale, shift, weight, bias)


def _bwd(block_l, interpret, res, g):
    x, scale, shift, weight, bias = res
    out, vjp = jax.vjp(lambda *a: _reference(*a), x, scale, shift, weight, bias)
    return vjp(g.astype(out.dtype))  # match the primal output dtype (bf16-safe)


fused_affine_silu_conv.defvjp(_fwd, _bwd)


def folded_affine_silu_conv(x, scale, shift, weight, bias, fold: int = 0):
    """Lane-folded XLA implementation of the same op.

    TPU arrays put the trailing dim on 128 lanes; the UNet's shallow levels
    have C=8..32, so every elementwise op and conv wastes up to 16× the
    bandwidth on lane padding.  Folding ``f`` consecutive time rows into the
    channel dim ((B, L, C) → (B, L/f, f·C) with f·C ≥ 128) makes every
    access dense, and the k=3 conv becomes three block-structured matmuls
    against neighbor folded rows — f× more MXU FLOPs, which are free at 11%
    MXU utilization.  Pure XLA, differentiable, no Pallas.
    """
    b, l, c = x.shape
    cout = weight.shape[-1]
    if fold <= 0:
        fold = max(1, 128 // c)
    if fold == 1 or l % fold:
        return _reference(x, scale, shift, weight, bias)

    f = fold
    xv = x.reshape(b, l // f, f * c)
    scale_v = jnp.tile(scale, (1, f))[:, None, :]   # (B, 1, f·C)
    shift_v = jnp.tile(shift, (1, f))[:, None, :]
    hv = jax.nn.silu(xv.astype(jnp.float32) * scale_v + shift_v).astype(x.dtype)

    w = weight.astype(jnp.float32)  # (3, C, Cout): [dl=-1, 0, +1]
    wc = jnp.zeros((f * c, f * cout), jnp.float32)
    for k in range(f):              # output slot k within the folded row
        for dl, kern in ((-1, w[0]), (0, w[1]), (1, w[2])):
            kp = k + dl
            if 0 <= kp < f:
                wc = wc.at[kp * c : (kp + 1) * c, k * cout : (k + 1) * cout].set(kern)
    wl = jnp.zeros((f * c, f * cout), jnp.float32)
    wl = wl.at[(f - 1) * c :, :cout].set(w[0])      # h[rf−1] → y[rf]
    wr = jnp.zeros((f * c, f * cout), jnp.float32)
    wr = wr.at[:c, (f - 1) * cout :].set(w[2])      # h[rf+f] → y[rf+f−1]

    up = jnp.pad(hv[:, :-1], ((0, 0), (1, 0), (0, 0)))    # folded row r−1
    down = jnp.pad(hv[:, 1:], ((0, 0), (0, 1), (0, 0)))   # folded row r+1
    dtype = x.dtype
    yv = (
        hv @ wc.astype(dtype)
        + up @ wl.astype(dtype)
        + down @ wr.astype(dtype)
    )
    y = yv.reshape(b, l, cout) + bias
    return y.astype(x.dtype)


def fold_groupnorm_film(x, gamma, beta, film_scale, film_shift, num_groups,
                        eps: float = 1e-6):
    """Compute GN stats (one cheap pass) and fold everything into
    per-(batch, channel) affine:  x̂·s + t  ≡  GN(x)·γ(1+fs) applied FiLM.

    Matches blocks.ResnetBlock1d semantics:
        h = GN(x) · (1 + film_scale) + film_shift  with GN's own γ/β inside.
    Returns (scale, shift), each (B, C) float32.
    """
    b, l, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, l, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 3))                       # (B, G)
    var = xf.var(axis=(1, 3))
    inv = jax.lax.rsqrt(var + eps)                    # (B, G)
    inv_c = jnp.repeat(inv, c // num_groups, axis=1)  # (B, C)
    mean_c = jnp.repeat(mean, c // num_groups, axis=1)

    one_plus = 1.0 + film_scale                       # (B, C)
    scale = inv_c * gamma[None] * one_plus
    shift = (beta[None] - mean_c * inv_c * gamma[None]) * one_plus + film_shift
    return scale, shift


# ---------------------------------------------------------------------------
# Producer-side group statistics (one-pass GN chain, docs/ROADMAP.md #1)
# ---------------------------------------------------------------------------

def _group_mask(cout: int, groups: int) -> np.ndarray:
    """(Cout, G) one-hot column→group matrix (groups = contiguous slices)."""
    cols = cout // groups
    m = np.zeros((cout, groups), np.float32)
    for g in range(groups):
        m[g * cols : (g + 1) * cols, g] = 1.0
    return m


def _stats_kernel_factory(groups: int, has_residual: bool):
    def kernel(*refs):
        if has_residual:
            x_ref, scale_ref, shift_ref, w_ref, b_ref, r_ref, o_ref, s_ref, ss_ref = refs
        else:
            x_ref, scale_ref, shift_ref, w_ref, b_ref, o_ref, s_ref, ss_ref = refs
            r_ref = None
        x = x_ref[0].astype(jnp.float32)                # (TL, C)
        scale = scale_ref[0].astype(jnp.float32)
        shift = shift_ref[0].astype(jnp.float32)
        h = x * scale + shift
        h = h * jax.nn.sigmoid(h)
        tl = h.shape[0]
        w = w_ref[...].astype(jnp.float32)              # (3, C, Cout)

        def mm(a, kern):
            return jax.lax.dot_general(
                a, kern, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = mm(h, w[1])
        zero = jnp.zeros((1, h.shape[1]), jnp.float32)
        acc += mm(jnp.concatenate([zero, h[: tl - 1]], axis=0), w[0])
        acc += mm(jnp.concatenate([h[1:], zero], axis=0), w[2])
        acc += b_ref[...].astype(jnp.float32)
        if r_ref is not None:
            acc += r_ref[0].astype(jnp.float32)
        o_ref[0] = acc.astype(o_ref.dtype)

        # per-group sums of the f32 output: ones-row colsum, then group mask
        cout = acc.shape[1]
        mask = (
            jax.lax.broadcasted_iota(jnp.int32, (cout, groups), 0)
            // (cout // groups)
            == jax.lax.broadcasted_iota(jnp.int32, (cout, groups), 1)
        ).astype(jnp.float32)
        # ones(8, TL) @ acc: every result row equals the column sum (8
        # sublanes keep the MXU operand tile-aligned); row 0 is used.
        ones = jnp.ones((8, tl), jnp.float32)
        colsum = jax.lax.dot_general(
            ones, acc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        colsumsq = jax.lax.dot_general(
            ones, acc * acc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # The stats blocks cover ALL nb rows of this batch item (block shape
        # (1, nb, G) revisited across the j loop — Mosaic requires the
        # trailing block dims be sublane/lane-divisible OR equal to the
        # array dims, and (1, 1, G) blocks violate the sublane rule); each
        # grid step writes its own row.
        j = pl.program_id(1)
        s_ref[0, j] = mm(colsum, mask)[0]
        ss_ref[0, j] = mm(colsumsq, mask)[0]

    return kernel


def _fused_stats_forward(
    x, scale, shift, weight, bias,
    residual=None,
    num_groups: int = 8,
    block_l: int = DEFAULT_BLOCK_L,
    interpret: bool = False,
):
    """Blocked fused op that ALSO emits its output's per-group statistics.

    ``y = conv1d_k3(silu(x·scale+shift)) + bias [+ residual]`` plus
    ``(sum, sumsq)`` of y over (L, group channels), each (B, G) float32 —
    so the NEXT GroupNorm's stats pass never re-reads y from HBM (the
    producer-side fusion XLA cannot do; docs/ROADMAP.md #1).  Same
    block-local + XLA-boundary-fix scheme as
    :func:`fused_affine_silu_conv_blocked`; the boundary corrections update
    the statistics exactly (the delta is linear/quadratic in the corrected
    rows, all known in XLA).

    Stats are computed from the float32 accumulator (before the cast to
    ``x.dtype``) — identical in f32 mode, below-rounding different in bf16.
    """
    b, l, c = x.shape
    cout = weight.shape[-1]
    assert l % block_l == 0, f"L={l} not divisible by block_l={block_l}"
    assert cout % num_groups == 0
    nb = l // block_l
    interpret = interpret or jax.default_backend() != "tpu"

    grid = (b, nb)
    in_specs = [
        pl.BlockSpec((1, block_l, c), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, c, cout), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, scale[:, None, :], shift[:, None, :], weight, bias[None]]
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, block_l, cout), lambda i, j: (i, j, 0),
                                     memory_space=pltpu.VMEM))
        args.append(residual)

    y, s_part, ss_part = pl.pallas_call(
        _stats_kernel_factory(num_groups, residual is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_l, cout), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, num_groups), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, num_groups), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, cout), x.dtype),
            jax.ShapeDtypeStruct((b, nb, num_groups), jnp.float32),
            jax.ShapeDtypeStruct((b, nb, num_groups), jnp.float32),
        ],
        interpret=interpret,
    )(*args)

    s = s_part.sum(axis=1)
    ss = ss_part.sum(axis=1)

    if nb > 1:
        # ---- boundary corrections + exact stats deltas ------------------
        bpos = jnp.arange(1, nb) * block_l
        xf = x.astype(jnp.float32)

        def act(rows):
            h = rows * scale[:, None, :] + shift[:, None, :]
            return jax.nn.silu(h)

        h_first = act(xf[:, bpos])
        h_last = act(xf[:, bpos - 1])
        w = weight.astype(jnp.float32)
        corr_prev = jnp.einsum("bnc,cd->bnd", h_first, w[2])
        corr_next = jnp.einsum("bnc,cd->bnd", h_last, w[0])

        y_old_prev = y[:, bpos - 1].astype(jnp.float32)
        y_old_next = y[:, bpos].astype(jnp.float32)

        y = y.astype(jnp.float32)
        y = y.at[:, bpos - 1].add(corr_prev)
        y = y.at[:, bpos].add(corr_next)
        y = y.astype(x.dtype)

        mask = jnp.asarray(_group_mask(cout, num_groups))
        corr = jnp.concatenate([corr_prev, corr_next], axis=1)
        y_old = jnp.concatenate([y_old_prev, y_old_next], axis=1)
        s = s + jnp.einsum("bnc,cg->bg", corr, mask)
        ss = ss + jnp.einsum(
            "bnc,cg->bg", 2.0 * y_old * corr + corr * corr, mask
        )

    return y, s, ss


def _stats_reference(x, scale, shift, weight, bias, residual, num_groups):
    """Plain-JAX reference for :func:`fused_affine_silu_conv_stats`
    (single f32 accumulate + one cast, matching the kernel)."""
    h = jax.nn.silu(x.astype(jnp.float32) * scale[:, None, :] + shift[:, None, :])
    y = jax.lax.conv_general_dilated(
        h, weight.astype(jnp.float32), (1,), [(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + bias
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    b, l, cout = y.shape
    yg = y.reshape(b, l, num_groups, cout // num_groups)
    s = yg.sum(axis=(1, 3))
    ss = (yg * yg).sum(axis=(1, 3))
    return y.astype(x.dtype), s, ss


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_affine_silu_conv_stats(
    x, scale, shift, weight, bias, residual=None,
    num_groups: int = 8, block_l: int = DEFAULT_BLOCK_L,
    interpret: bool = False,
):
    """See :func:`_fused_stats_forward`.  Differentiable: the backward
    recomputes through the plain-JAX reference (same scheme as
    :func:`fused_affine_silu_conv`), so the stats path is usable in
    training graphs too."""
    return _fused_stats_forward(
        x, scale, shift, weight, bias, residual,
        num_groups=num_groups, block_l=block_l, interpret=interpret,
    )


def _stats_fwd(x, scale, shift, weight, bias, residual,
               num_groups, block_l, interpret):
    out = _fused_stats_forward(
        x, scale, shift, weight, bias, residual,
        num_groups=num_groups, block_l=block_l, interpret=interpret,
    )
    return out, (x, scale, shift, weight, bias, residual)


def _stats_bwd(num_groups, block_l, interpret, res, g):
    x, scale, shift, weight, bias, residual = res
    has_res = residual is not None

    def ref(*args):
        if has_res:
            x_, sc_, sh_, w_, b_, r_ = args
        else:
            x_, sc_, sh_, w_, b_ = args
            r_ = None
        return _stats_reference(x_, sc_, sh_, w_, b_, r_, num_groups)

    primals = (x, scale, shift, weight, bias) + ((residual,) if has_res else ())
    ref_out, vjp = jax.vjp(ref, *primals)
    # Cotangent dtypes must match the primal outputs: y is x.dtype (may be
    # bf16), the s/ss stats are f32 — a blanket f32 cast broke bf16 training.
    g_cast = jax.tree_util.tree_map(
        lambda t, o: t.astype(o.dtype), g, ref_out)
    grads = vjp(g_cast)
    if not has_res:
        grads = grads + (None,)
    return grads


fused_affine_silu_conv_stats.defvjp(_stats_fwd, _stats_bwd)
