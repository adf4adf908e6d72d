"""Pallas TPU kernel: fused non-rigid + canonical MLP point queries.

The per-sample MLP stack (reference `_apply_mlp_kernals`,
core/nets/human_nerf/network.py:233-327) is the FLOPs core of the whole
model, but evaluated as separate XLA dots every layer boundary round-trips
an (N, 256) activation through HBM: ~28 KB/sample across the 14 layers,
which caps the renderer at HBM bandwidth while the MXU idles.

This kernel keeps the entire chain

    hannw-embed(x_skel) -> non-rigid MLP -> xyz -> fourier-embed(xyz)
      -> canonical MLP -> raw (rgb, sigma)

inside VMEM for a block of samples: HBM traffic drops to ~28 B/sample and
every matmul feeds the MXU back to back (measured marginal rate ~160M
samples/s vs ~53M for the XLA-fused path on v5e).

TPU-specific interface decisions (all parity-tested):
  * Data crosses the kernel boundary TRANSPOSED: x_skel as (3, N) and raw
    as (4, N). A custom call materializes its operands, and an (N, 3) f32
    array on TPU tiles to T(8, 128) -- a 42x HBM blowup (4 GB at 8M
    samples); the transposed layout costs 8 sublanes (2.7x) instead. The
    kernel redistributes lanes<->sublanes with identity-matrix dot_generals
    (`_unpack_cols` / `_pack_cols`): Mosaic has no shape-cast for this
    relayout, but 128x128 MXU transposes are effectively free here.
  * BOTH fourier embeddings are computed in kernel (iota-built frequency
    columns; the hann window arrives as a (1, E) traced input). Embedding
    weight rows are permuted outside so the kernel can build embeddings
    freq-major without interleaving (`_nr_perm` / `_cnl_perm`).
  * The per-frame condition code is folded into the first-layer bias
    outside (`cc @ W0[:69] + b0`) -- input order is [cc, pos_embed]
    (mlp_offset.py:77); gradients flow through the fold.
  * Non-rigid skip layers concat [h, pos_embed]; canonical skip layers
    concat [pos_embed, h] (mlp_rgb_sigma.py:164-166). Both become split
    matmuls (W_h, W_e).
  * Compute dtype semantics match mlps._dense: operands cast to the
    compute dtype, f32 accumulation, f32 bias add + relu.

The backward pass is a second kernel (custom_vjp): per block it recomputes
the forward activations in VMEM, backprops the chain (embedding jacobians
included), and accumulates weight/bias gradients in VMEM-resident output
accumulators across the sequential TPU grid. Falls back to interpret mode
off-TPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST
LANES = 128


def _nr_perm(multires: int) -> np.ndarray:
    """Kernel nr-embed row -> reference hannw_fourier_embed row.

    Reference (embedders.hannw_fourier_embed): [w0 sin(x), w0 cos(x),
    w1 sin(2x), ...] interleaved, no identity. Kernel: [sin-block (3m),
    cos-block (3m)], freq-major dim-minor.
    """
    perm = np.zeros(6 * multires, np.int64)
    for i in range(multires):
        for d in range(3):
            perm[3 * i + d] = 6 * i + d
            perm[3 * multires + 3 * i + d] = 6 * i + 3 + d
    return perm


def _cnl_perm(multires: int) -> np.ndarray:
    """Kernel cnl-embed row -> reference fourier_embed row.

    Reference (embedders.fourier_embed): [x, sin(x), cos(x), sin(2x), ...]
    interleaved with leading identity. Kernel: [x, sin-block, cos-block].
    """
    perm = np.zeros(3 + 6 * multires, np.int64)
    perm[0:3] = [0, 1, 2]
    for i in range(multires):
        for d in range(3):
            perm[3 + 3 * i + d] = 3 + 6 * i + d
            perm[3 + 3 * multires + 3 * i + d] = 3 + 6 * i + 3 + d
    return perm


def hann_input(alpha, multires: int) -> jnp.ndarray:
    """Expanded (1, 6*multires) hann weights in kernel embed order."""
    from humannerf_tpu.models.embedders import hann_window_weights
    w3 = jnp.repeat(hann_window_weights(alpha, multires), 3)
    return jnp.concatenate([w3, w3]).reshape(1, -1)


class Plan:
    """Static layer plan shared by forward and backward kernels.

    Weight list layout (the flat `kw` tuple):
      NR:  [w0, b0] + per layer i=1..d-1: skip -> [w_h, w_e, b] else [w, b]
           + [w_out, b_out]
      CNL: same shape with its own depth/skip, + [w_out, b_out]
    """

    def __init__(self, *, nr_depth: int, nr_skips: tuple, nr_width: int,
                 nr_multires: int, cnl_depth: int, cnl_skips: tuple,
                 cnl_width: int, cnl_multires: int, skip_nr: bool,
                 compute_dtype):
        self.nr_depth = nr_depth
        self.nr_skips = set(nr_skips)
        self.nr_width = nr_width
        self.nr_multires = nr_multires
        self.nr_embed_dim = 6 * nr_multires
        self.cnl_depth = cnl_depth
        # reference convention: canonical layer li skips when (li-1) in skips
        self.cnl_skips = {s + 1 for s in cnl_skips}
        self.cnl_width = cnl_width
        self.cnl_multires = cnl_multires
        self.cnl_embed_dim = 3 + 6 * cnl_multires
        self.skip_nr = skip_nr
        self.compute_dtype = compute_dtype

    def key(self):
        return (self.nr_depth, tuple(sorted(self.nr_skips)), self.nr_width,
                self.nr_multires, self.cnl_depth,
                tuple(sorted(self.cnl_skips)), self.cnl_width,
                self.cnl_multires, self.skip_nr, str(self.compute_dtype))

    def n_tensors(self):
        n = 2 + 2   # cnl first + out
        for li in range(1, self.cnl_depth):
            n += 3 if li in self.cnl_skips else 2
        if not self.skip_nr:
            n += 2 + 2
            for i in range(1, self.nr_depth):
                n += 3 if i in self.nr_skips else 2
        return n


def make_kernel_weights(plan: Plan, nr_params, cnl_params, condition_code):
    """Original param pytrees -> flat kernel tensor tuple (differentiable).

    Weight matrices are cast to the compute dtype (bf16 on TPU) exactly
    once here; biases stay f32. Embedding-facing rows are permuted to the
    kernel's freq-major embed order.
    """
    dt = plan.compute_dtype
    kw = []
    if not plan.skip_nr:
        nperm = jnp.asarray(_nr_perm(plan.nr_multires))
        layers = nr_params["block_mlps"]
        w0 = layers[0]["w"]
        cc_dim = w0.shape[0] - plan.nr_embed_dim
        if condition_code is None:
            condition_code = jnp.zeros((cc_dim,), jnp.float32)
        b0 = layers[0]["b"] + condition_code.reshape(-1) @ w0[:cc_dim]
        kw += [w0[cc_dim:][nperm].astype(dt), b0]
        for i in range(1, plan.nr_depth):
            p = layers[i]
            if i in plan.nr_skips:    # input concat [h, pos_embed]
                kw += [p["w"][:plan.nr_width].astype(dt),
                       p["w"][plan.nr_width:][nperm].astype(dt), p["b"]]
            else:
                kw += [p["w"].astype(dt), p["b"]]
        kw += [nr_params["output"]["w"].astype(dt), nr_params["output"]["b"]]
    cperm = jnp.asarray(_cnl_perm(plan.cnl_multires))
    layers = cnl_params["pts_linears"]
    kw += [layers[0]["w"][cperm].astype(dt), layers[0]["b"]]
    E = plan.cnl_embed_dim
    for li in range(1, plan.cnl_depth):
        p = layers[li]
        if li in plan.cnl_skips:      # input concat [pos_embed, h]
            kw += [p["w"][E:].astype(dt), p["w"][:E][cperm].astype(dt),
                   p["b"]]
        else:
            kw += [p["w"].astype(dt), p["b"]]
    kw += [cnl_params["output"]["w"].astype(dt), cnl_params["output"]["b"]]
    return tuple(kw)


def _dot(x, w, dt):
    prec = _HI if dt == jnp.float32 else None
    return jnp.dot(x.astype(dt), w, precision=prec,
                   preferred_element_type=jnp.float32)


def _dot_dx(dy, w, dt):
    """dy (N, out) x w (in, out) -> (N, in), contracting out."""
    prec = _HI if dt == jnp.float32 else None
    return jax.lax.dot_general(
        dy.astype(dt), w, (((1,), (1,)), ((), ())), precision=prec,
        preferred_element_type=jnp.float32)


def _dot_dw(x, dy, dt):
    """x (N, in) x dy (N, out) -> (in, out), contracting N."""
    prec = _HI if dt == jnp.float32 else None
    return jax.lax.dot_general(
        x.astype(dt), dy.astype(dt), (((0,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)


def _scaled_coords(x, m):
    """x (B, 3) -> (B, 3m) freq-scaled coords + the (1, 3m) freq columns.

    Constants come from iota: pallas kernels cannot capture array consts.
    """
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * m), 1)
    fcol = jnp.exp2((cols // 3).astype(jnp.float32))
    return jnp.tile(x, (1, m)) * fcol, fcol


def _eye128():
    r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    return (r == c).astype(jnp.float32)


def _unpack_cols(xT):
    """(C, blk) lane-major -> (blk, C) sample-major via MXU transposes."""
    blk = xT.shape[1]
    eye = _eye128()
    pieces = []
    for q in range(blk // LANES):
        seg = xT[:, q * LANES:(q + 1) * LANES]          # (C, 128)
        pieces.append(jax.lax.dot_general(
            eye, seg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))         # (128, C)
    return jnp.concatenate(pieces, axis=0)


def _pack_cols(x):
    """(blk, C) sample-major -> (C, blk) lane-major via MXU transposes."""
    blk = x.shape[0]
    eye = _eye128()
    pieces = []
    for q in range(blk // LANES):
        seg = x[q * LANES:(q + 1) * LANES]               # (128, C)
        pieces.append(jax.lax.dot_general(
            seg, eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))         # (C, 128)
    return jnp.concatenate(pieces, axis=1)


def _freq_group_sum(ds, m):
    """(B, 3m) -> (B, 3): sum freq groups via a static selector matmul."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (3 * m, 3), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (3 * m, 3), 1)
    sel = (rows % 3 == cols).astype(jnp.float32)
    return jnp.dot(ds, sel, precision=_HI,
                   preferred_element_type=jnp.float32)


def _forward_pass(plan: Plan, x, hw, kw, keep_acts: bool):
    """Shared fwd math on an unpacked (B, 3) block.

    Returns (raw, acts); acts populated when keep_acts (backward rerun).
    Stored activations are kept in the compute dtype -- they only feed
    compute-dtype matmuls (dW, relu masks) in the backward, and the
    halved VMEM footprint admits a 1024-sample backward block.
    """
    dt = plan.compute_dtype
    it = iter(kw)
    acts = {"nr": [], "cnl": []}
    if plan.skip_nr:
        xyz = x
    else:
        s, fcol = _scaled_coords(x, plan.nr_multires)
        e = jnp.concatenate([jnp.sin(s), jnp.cos(s)], axis=-1) * hw
        if keep_acts:
            acts["nr_e"] = e.astype(dt)
            acts["nr_s"], acts["nr_fcol"] = s, fcol
        h = jax.nn.relu(_dot(e, next(it), dt) + next(it))
        if keep_acts:
            acts["nr"].append(h.astype(dt))
        for i in range(1, plan.nr_depth):
            if i in plan.nr_skips:
                w_h, w_e, b = next(it), next(it), next(it)
                h = jax.nn.relu(_dot(h, w_h, dt) + _dot(e, w_e, dt) + b)
            else:
                h = jax.nn.relu(_dot(h, next(it), dt) + next(it))
            if keep_acts:
                acts["nr"].append(h.astype(dt))
        trans = _dot(h, next(it), dt) + next(it)
        xyz = x + trans
    s2, fcol2 = _scaled_coords(xyz, plan.cnl_multires)
    embed = jnp.concatenate([xyz, jnp.sin(s2), jnp.cos(s2)], axis=-1)
    if keep_acts:
        acts["embed"] = embed.astype(dt)
        acts["s2"], acts["fcol2"] = s2, fcol2
    h = jax.nn.relu(_dot(embed, next(it), dt) + next(it))
    if keep_acts:
        acts["cnl"].append(h.astype(dt))
    for li in range(1, plan.cnl_depth):
        if li in plan.cnl_skips:
            w_h, w_e, b = next(it), next(it), next(it)
            h = jax.nn.relu(_dot(h, w_h, dt) + _dot(embed, w_e, dt) + b)
        else:
            h = jax.nn.relu(_dot(h, next(it), dt) + next(it))
        if keep_acts:
            acts["cnl"].append(h.astype(dt))
    raw = _dot(h, next(it), dt) + next(it)
    return raw, acts


def _fwd_kernel(plan: Plan, sched_ref, xp_ref, hw_ref, *rest):
    raw_ref = rest[-1]
    live = sched_ref[0, pl.program_id(0)]

    # Empty-space skip: fg==0 samples contribute exactly nothing downstream
    # (raw2outputs multiplies alpha by fg), so blocks whose fg is all zero
    # skip the matmul chain entirely. Their input/output DMAs are remapped
    # to shared blocks by _block_sched; the never-written real output
    # columns are masked with `where` by _fused_query_packed.
    @pl.when(live > 0)
    def _compute():
        kw = [r[:] for r in rest[:-1]]
        x = _unpack_cols(xp_ref[:])                     # (blk, 3)
        hw = hw_ref[:] if hw_ref is not None else None
        raw, _ = _forward_pass(plan, x, hw, kw, keep_acts=False)
        raw_ref[:] = _pack_cols(raw)                    # (4, blk)


def _bwd_kernel(plan: Plan, sched_ref, xp_ref, hw_ref, g_ref, *rest):
    """Recompute forward, backprop, accumulate dW in VMEM-resident outputs."""
    n_w = plan.n_tensors()
    w_refs = rest[:n_w]
    dx_ref = rest[n_w]
    dw_refs = rest[n_w + 1:]
    dt = plan.compute_dtype

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for r in dw_refs:
            r[:] = jnp.zeros_like(r)

    # fg==0 blocks carry exactly-zero cotangents (alpha = alpha*fg kills
    # both the rgb and sigma paths), so the recompute+backprop is skipped
    # and their dx / dW contributions are exact zeros. Dead steps' DMAs
    # are remapped to shared blocks (_block_sched); the unwritten real dx
    # columns are masked with `where` by _fused_query_bwd.
    live = sched_ref[0, pl.program_id(0)]

    @pl.when(live > 0)
    def _body():
        _bwd_block(plan, xp_ref, hw_ref, g_ref, w_refs, dx_ref, dw_refs, dt)


def _bwd_block(plan: Plan, xp_ref, hw_ref, g_ref, w_refs, dx_ref, dw_refs,
               dt):
    kw = [r[:] for r in w_refs]
    x = _unpack_cols(xp_ref[:])                         # (blk, 3)
    hw = hw_ref[:] if hw_ref is not None else None
    _, acts = _forward_pass(plan, x, hw, kw, keep_acts=True)
    g = _unpack_cols(g_ref[:])                          # (blk, 4)

    # walk the weight list backwards
    wit = len(kw)
    dit = len(dw_refs)

    def take_w(n):
        nonlocal wit
        wit -= n
        return kw[wit:wit + n]

    def acc_dw(vals):
        nonlocal dit
        dit -= len(vals)
        for r, v in zip(dw_refs[dit:dit + len(vals)], vals):
            r[:] += v

    # canonical output layer
    w_out, _b = take_w(2)
    acc_dw([_dot_dw(acts["cnl"][-1], g, dt), jnp.sum(g, axis=0)])
    dh = _dot_dx(g, w_out, dt)
    dembed = jnp.zeros(acts["embed"].shape, jnp.float32)
    for li in range(plan.cnl_depth - 1, 0, -1):
        dy = dh * (acts["cnl"][li].astype(jnp.float32) > 0)
        h_prev = acts["cnl"][li - 1]
        if li in plan.cnl_skips:
            w_h, w_e, _b = take_w(3)
            acc_dw([_dot_dw(h_prev, dy, dt), _dot_dw(acts["embed"], dy, dt),
                    jnp.sum(dy, axis=0)])
            dembed += _dot_dx(dy, w_e, dt)
            dh = _dot_dx(dy, w_h, dt)
        else:
            w, _b = take_w(2)
            acc_dw([_dot_dw(h_prev, dy, dt), jnp.sum(dy, axis=0)])
            dh = _dot_dx(dy, w, dt)
    dy0 = dh * (acts["cnl"][0].astype(jnp.float32) > 0)
    w0, _b = take_w(2)
    acc_dw([_dot_dw(acts["embed"], dy0, dt), jnp.sum(dy0, axis=0)])
    dembed += _dot_dx(dy0, w0, dt)

    # canonical embedding jacobian -> dxyz
    m2 = plan.cnl_multires
    ds2 = (dembed[:, 3:3 + 3 * m2] * jnp.cos(acts["s2"])
           - dembed[:, 3 + 3 * m2:] * jnp.sin(acts["s2"])) * acts["fcol2"]
    dxyz = dembed[:, :3] + _freq_group_sum(ds2, m2)

    if plan.skip_nr:
        dx_ref[:] = _pack_cols(dxyz)
        assert wit == 0 and dit == 0, (wit, dit)
        return

    # non-rigid output layer (dtrans == dxyz)
    w_out, _b = take_w(2)
    acc_dw([_dot_dw(acts["nr"][-1], dxyz, dt), jnp.sum(dxyz, axis=0)])
    dh = _dot_dx(dxyz, w_out, dt)
    e = acts["nr_e"]
    de = jnp.zeros(e.shape, jnp.float32)
    for i in range(plan.nr_depth - 1, 0, -1):
        dy = dh * (acts["nr"][i].astype(jnp.float32) > 0)
        h_prev = acts["nr"][i - 1]
        if i in plan.nr_skips:
            w_h, w_e, _b = take_w(3)
            acc_dw([_dot_dw(h_prev, dy, dt), _dot_dw(e, dy, dt),
                    jnp.sum(dy, axis=0)])
            de += _dot_dx(dy, w_e, dt)
            dh = _dot_dx(dy, w_h, dt)
        else:
            w, _b = take_w(2)
            acc_dw([_dot_dw(h_prev, dy, dt), jnp.sum(dy, axis=0)])
            dh = _dot_dx(dy, w, dt)
    dy0 = dh * (acts["nr"][0].astype(jnp.float32) > 0)
    w0, _b = take_w(2)
    acc_dw([_dot_dw(e, dy0, dt), jnp.sum(dy0, axis=0)])
    de += _dot_dx(dy0, w0, dt)

    # nr embedding jacobian: e = [sin(s), cos(s)] * hw
    m = plan.nr_multires
    de = de * hw
    ds = (de[:, :3 * m] * jnp.cos(acts["nr_s"])
          - de[:, 3 * m:] * jnp.sin(acts["nr_s"])) * acts["nr_fcol"]
    dx = dxyz + _freq_group_sum(ds, m)     # identity path + embed path
    dx_ref[:] = _pack_cols(dx)
    assert wit == 0 and dit == 0, (wit, dit)


def _t_spec(blk, ncol, row=None):
    """Transposed (ncol, N) arrays, blocked along the sample (lane) dim.

    Index maps take (i, sched_ref): scalar-prefetch operands are appended
    to every index map's arguments by PrefetchScalarGridSpec. When `row`
    is given, the block index is read from that row of the prefetched
    (3, nb) schedule instead of being the grid step itself -- dead steps
    remap to a shared block so their DMAs collapse (see _block_sched).
    """
    if row is None:
        return pl.BlockSpec((ncol, blk), lambda i, *_: (0, i),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((ncol, blk), lambda i, s: (0, s[row, i]),
                        memory_space=pltpu.VMEM)


def _block_sched(live):
    """(nb,) block liveness -> (3, nb) int32 schedule [live, in, out].

    Dead grid steps don't compute (pl.when in the kernels), but a naive
    per-step BlockSpec still pays their input fetch + output writeback
    DMAs, which caps the skip's saving at ~50%/block (measured). Instead
    dead steps remap their blocked INPUT index to block 0 and their
    OUTPUT index to the first dead step's slot: the live-first partition
    makes dead steps a contiguous tail, so Mosaic's block-revisit
    optimization reduces the whole tail to ~one DMA each way. Unvisited
    output blocks then hold uninitialized memory -- callers MUST mask
    dead columns with `where` (never multiply: 0*NaN = NaN).
    """
    nb = live.shape[0]
    idx = jnp.arange(nb, dtype=jnp.int32)
    dead = live == 0
    j0 = jnp.argmax(dead).astype(jnp.int32)   # first dead step (0 if none)
    in_idx = jnp.where(dead, 0, idx)
    out_idx = jnp.where(dead, j0, idx)
    return jnp.stack([live.astype(jnp.int32), in_idx, out_idx])


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, *_: (0,) * nd,
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit,
                   static_argnames=("plan_key", "blk", "interpret"))
def _fwd_call(xp, hw, kw, live, *, plan_key, blk, interpret):
    plan = _PLANS[plan_key]
    N = xp.shape[1]
    grid = (N // blk,)
    in_specs = [_t_spec(blk, 3, row=1)]
    args = [xp]
    if not plan.skip_nr:
        in_specs.append(_const_spec(hw.shape))
        args.append(hw)
    in_specs += [_const_spec(w.shape) for w in kw]
    args += list(kw)

    def kern(sched_ref, *refs):
        if plan.skip_nr:
            _fwd_kernel(plan, sched_ref, refs[0], None, *refs[1:])
        else:
            _fwd_kernel(plan, sched_ref, *refs)

    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=_t_spec(blk, 4, row=2)),
        out_shape=jax.ShapeDtypeStruct((4, N), jnp.float32),
        interpret=interpret,
    )(_block_sched(live), *args)


@functools.partial(jax.jit,
                   static_argnames=("plan_key", "blk", "interpret"))
def _bwd_call(xp, hw, kw, gp, live, *, plan_key, blk, interpret):
    plan = _PLANS[plan_key]
    N = xp.shape[1]
    grid = (N // blk,)
    in_specs = [_t_spec(blk, 3, row=1)]
    args = [xp]
    if not plan.skip_nr:
        in_specs.append(_const_spec(hw.shape))
        args.append(hw)
    in_specs.append(_t_spec(blk, 4, row=1))
    args.append(gp.astype(jnp.float32))
    in_specs += [_const_spec(w.shape) for w in kw]
    args += list(kw)

    out_specs = [_t_spec(blk, 3, row=2)]
    out_shape = [jax.ShapeDtypeStruct((3, N), jnp.float32)]
    # weight-grad accumulators: constant index map -> VMEM-resident across
    # the sequential grid, written back once at the end
    for w in kw:
        out_specs.append(_const_spec(w.shape))
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))

    def kern(live_ref, *refs):
        n_in = len(in_specs)
        ins, outs = refs[:n_in], refs[n_in:]
        if plan.skip_nr:
            _bwd_kernel(plan, live_ref, ins[0], None, ins[1], *ins[2:],
                        *outs)
        else:
            _bwd_kernel(plan, live_ref, ins[0], ins[1], ins[2], *ins[3:],
                        *outs)

    outs = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=tuple(out_specs)),
        out_shape=tuple(out_shape), interpret=interpret,
    )(_block_sched(live), *args)
    return outs[0], tuple(outs[1:])


# plan registry: custom_vjp primals can't carry static objects, so plans are
# registered by key and looked up inside
_PLANS: dict = {}


def register_plan(plan: Plan):
    _PLANS[plan.key()] = plan
    return plan.key()


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_query_packed(xp, hw, kw, live_f, live_b, plan_key, blk_fwd,
                        blk_bwd):
    """Transposed-boundary op: xp (3, N), hw (1, E) -> raw (4, N).

    live_f / live_b: (N/blk_fwd,) / (N/blk_bwd,) int32 block-liveness
    vectors (scalar-prefetched); 0-blocks skip compute exactly. Dead
    blocks are never written by the kernel (their DMAs are remapped away,
    _block_sched) -- mask their columns here with `where`.
    """
    interpret = jax.default_backend() != "tpu"
    raw = _fwd_call(xp, hw, kw, live_f, plan_key=plan_key, blk=blk_fwd,
                    interpret=interpret)
    alive = jnp.repeat(live_f > 0, blk_fwd)
    return jnp.where(alive[None, :], raw, 0.0)


def _fused_query_fwd(xp, hw, kw, live_f, live_b, plan_key, blk_fwd,
                     blk_bwd):
    out = _fused_query_packed(xp, hw, kw, live_f, live_b, plan_key,
                              blk_fwd, blk_bwd)
    return out, (xp, hw, kw, live_b)


def _fused_query_bwd(plan_key, blk_fwd, blk_bwd, res, gp):
    xp, hw, kw, live_b = res
    interpret = jax.default_backend() != "tpu"
    dxp, dkw = _bwd_call(xp, hw, kw, gp, live_b, plan_key=plan_key,
                         blk=blk_bwd, interpret=interpret)
    # dead blocks' dx columns were never written (remapped DMAs): mask
    alive = jnp.repeat(live_b > 0, blk_bwd)
    dxp = jnp.where(alive[None, :], dxp, 0.0)
    # weight grads back to the primal dtypes (weights enter in the compute
    # dtype, biases f32); hann window is an iteration schedule, not a param
    dkw_cast = tuple(dv.astype(w.dtype) for dv, w in zip(dkw, kw))
    dhw = jnp.zeros_like(hw) if hw is not None else None
    dlive = np.zeros((), jax.dtypes.float0)  # int primals: float0 tangents
    return (dxp, dhw, dkw_cast,
            np.broadcast_to(dlive, (xp.shape[1] // blk_fwd,)),
            np.broadcast_to(dlive, (xp.shape[1] // blk_bwd,)))


_fused_query_packed.defvjp(_fused_query_fwd, _fused_query_bwd)


# ---------------------------------------------------------------------------
# High-level entry used by models/network.py
# ---------------------------------------------------------------------------

def plan_from_cfg(cfg, compute_dtype, skip_nr: bool) -> Plan | None:
    """Build (and register) a Plan when the config is kernel-eligible,
    else None. Eligibility = the default model family: plain 'mlp'
    non-rigid net, single-head canonical MLP with no extra input branches.
    """
    c, nr = cfg.canonical_mlp, cfg.non_rigid_motion_mlp
    eligible = (
        cfg.non_rigid_motion_model == "mlp"
        and cfg.multihead.head_num == 1
        and not c.view_dir and c.pose_color == "wo"
        and not c.input_encoder.enable and not c.time_input
        and c.condition_code_dim == 0
        and cfg.rgb_history.last_num == 0
        and cfg.condition_code.type == "global"
        and c.mlp_depth_plus == 0 and nr.mlp_depth_plus == 0
        and c.last_linear_scale == 1 and nr.last_linear_scale == 1
        and c.i_embed != -1 and nr.i_embed != -1
        and not nr.time_input
    )
    if not eligible:
        return None
    plan = Plan(
        nr_depth=nr.mlp_depth, nr_skips=tuple(nr.skips),
        nr_width=nr.mlp_width, nr_multires=nr.multires,
        cnl_depth=c.mlp_depth, cnl_skips=(4,), cnl_width=c.mlp_width,
        cnl_multires=c.multires, skip_nr=skip_nr,
        compute_dtype=compute_dtype)
    register_plan(plan)
    return plan


@jax.custom_vjp
def _permute_groups(x3, perm, inv):
    """x3 (C, Ng, gsz) -> x3[:, perm]: permute sample GROUPS on the
    transposed layout.

    Two things make this cheap where the naive row permute was not:
    the operand stays in the compact lane-major tiling (a (N, 3) f32
    array tiles to T(8, 128) -- 42x padded; reshaping/gathering THAT
    costs ~40 ms at 8.4M samples), and the backward gathers by `inv`
    (perm's inverse) instead of XLA's scatter-add transpose -- exact
    for a bijection, and a gather is far cheaper than a scatter."""
    return x3[:, perm]


def _permute_groups_fwd(x3, perm, inv):
    return x3[:, perm], (perm, inv)


def _permute_groups_bwd(res, g):
    _, inv = res
    return g[:, inv], None, None


_permute_groups.defvjp(_permute_groups_fwd, _permute_groups_bwd)


@jax.custom_vjp
def permute_cols3(x, perm, inv):
    """x (C, R, S) -> x[:, perm]: permute along axis 1 of a dense-lane
    3-D layout (rows are S*4-byte contiguous runs, S the lane dim).

    This is the layout the per-ray sort uses: permuting the (N, 3)
    sample layout directly costs ~13 ms at 8.4M samples (its (8, 128)
    tiling pads 3 lanes to 128 -- 42x), while the same permute on
    (3, R, S) rows is ~1.8 ms. Backward gathers by the inverse."""
    return x[:, perm]


def _permute_cols3_fwd(x, perm, inv):
    return x[:, perm], (perm, inv)


def _permute_cols3_bwd(res, g):
    _, inv = res
    return g[:, inv], None, None


permute_cols3.defvjp(_permute_cols3_fwd, _permute_cols3_bwd)


@jax.custom_vjp
def permute_rows(x, perm, inv):
    """x (R, D) -> x[perm]: permute whole rows.

    Used for the per-ray sort feeding the z-major empty-space skip: rows
    are full rays (S*3 or S*4 contiguous floats, ~1.5 KB), so the gather
    is bandwidth-bound (~0.5 ms at 64K rays) rather than latency-bound.
    The backward gathers by the inverse permutation instead of XLA's
    scatter-add transpose -- exact for a bijection."""
    return x[perm]


def _permute_rows_fwd(x, perm, inv):
    return x[perm], (perm, inv)


def _permute_rows_bwd(res, g):
    _, inv = res
    return g[inv], None, None


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def ray_sort_order(fg_rs, skip_eps: float = 0.0):
    """(R, S) fg -> (order, inv): rays sorted by live-band center.

    Each ray's fg>eps samples form a contiguous z-band; after sorting
    rays by band center, a z-major block (many rays x one depth slot)
    is live only where the slot crosses the band of rays in its range,
    so dead blocks approach the per-sample ideal (measured: 68.5% dead
    vs 73.5% ideal at 64K random rays x 128 samples, vs 10.2% unsorted).
    Fully-dead rays sort to the end. Keys only order the kernel schedule;
    no gradient flows through them."""
    R, S = fg_rs.shape
    live = jax.lax.stop_gradient(fg_rs) > skip_eps
    any_live = live.any(axis=1)
    s0 = jnp.argmax(live, axis=1)
    s1 = S - jnp.argmax(live[:, ::-1], axis=1)
    key = jnp.where(any_live, (s0 + s1).astype(jnp.int32), 2 * S + 2)
    order = jnp.argsort(key).astype(jnp.int32)
    inv = jnp.zeros((R,), jnp.int32).at[order].set(
        jnp.arange(R, dtype=jnp.int32), unique_indices=True)
    return order, inv


def resolve_skip_reorder(value, train: bool) -> bool:
    """Resolve the tri-state cfg `pallas.skip_reorder` for one call site.

    "train" (the shipped default) enables the live-first group partition
    only inside training steps: there each non-skipped block pays the 3x
    fwd+bwd recompute, which is what amortizes the permute's row gathers
    (measured v5e: 103.2 -> 84.1 ms/step at group 8). Forward-only eval
    renders lose more to the permute than the skip saves (45.4 -> 36.6 M
    samp/s), so they stay unordered. Booleans / "true" / "false" force it
    on or off everywhere.
    """
    if isinstance(value, str):
        v = value.lower()
        if v == "train":
            return bool(train)
        return v in ("true", "1", "yes")
    return bool(value)


def resolve_blocks(plan: Plan, N: int, blk_fwd: int, blk_bwd: int):
    """(blk, blk_b, pad): the fwd/bwd block sizes the kernel will run at
    for N samples, and the padding to a fwd-block multiple. Shared by
    query_points_fused and callers of the transposed entry (which must
    compute per-block liveness at exactly these granularities)."""
    blk = blk_fwd if N >= blk_fwd else max(LANES, -(-N // LANES) * LANES)
    pad = (-N) % blk
    blk_b = min(blk_bwd, blk)
    if plan.compute_dtype == jnp.float32:
        # f32 activation storage doubles the backward VMEM footprint
        # (measured scoped vmem: 24 MB at blk 512, 17.8 MB at 256 -- the
        # 16 MB limit needs a 128 block)
        blk_b = min(blk_b, 128)
    while (N + pad) % blk_b and blk_b > LANES:
        blk_b //= 2               # bwd grid must tile the padded N exactly
    if (N + pad) % blk_b:
        blk_b = LANES             # N+pad is always a multiple of LANES
    return blk, blk_b, pad


def query_points_fused_t(plan: Plan, params, xp, hann_alpha,
                         condition_code, live_f, live_b,
                         blk_fwd: int, blk_bwd: int):
    """Transposed-boundary fused query: xp (3, N) f32 -> rawp (4, N) f32.

    The fast path for callers that already hold samples in the kernel's
    lane-major layout (network.py's z-major empty-space skip): no (N, 3)
    round-trip, no padding. Caller contract: N is a multiple of both
    blocks as returned by resolve_blocks (pad == 0), and live_f / live_b
    are (N/blk,) int32 per-block liveness at exactly those granularities
    (all-ones to disable the skip). Dead blocks' output columns are
    masked to 0 (forward) and 0 cotangent (backward)."""
    kw = make_kernel_weights(
        plan, params.get("non_rigid_mlp"), params["cnl_mlp"],
        condition_code)
    hw = None if plan.skip_nr else hann_input(hann_alpha, plan.nr_multires)
    return _fused_query_packed(xp, hw, kw, live_f, live_b, plan.key(),
                               blk_fwd, blk_bwd)


def query_points_fused(plan: Plan, params, x_skel, hann_alpha,
                       condition_code, blk_fwd: int = 2048,
                       blk_bwd: int = 512, fg=None, skip_eps: float = 0.0,
                       reorder: bool = False, group: int = 8):
    """Full fused query -> raw (N, 4).

    x_skel (N, 3); hann_alpha: traced scalar (ignored when plan.skip_nr).
    Pads N to a block multiple internally.

    fg: optional (N,) foreground likelihood. Blocks where fg <= skip_eps
    everywhere are skipped EXACTLY (raw := 0 there): the compositor
    multiplies alpha by fg, so fg==0 samples contribute nothing to either
    the output or the cotangents. Padding rows count as empty.

    reorder: stable-partition samples (live first) before the kernel and
    invert afterwards, so dead blocks concentrate even when emptiness is
    not block-coherent (a ray's fg>0 samples cluster in a z-band, so raw
    sample order rarely yields fully-dead blocks). Exact: a bijective
    permutation, gradients flow through the gathers. Called inside any
    shard_map region, so the partition is per-device and load stays
    balanced.

    group: partition granularity in samples (power of two <= 128). TPU
    1-D row gathers are latency-bound per ROW, so permuting GROUPS of
    `group` consecutive samples (rows of group*3 floats) costs 1/group
    the gathers of a per-sample partition while a ray's contiguous live
    z-band still leaves most out-of-band groups fully dead. group=1 is
    the per-sample partition (maximum skip, measured net-negative at
    render shapes: ~470 ms of gathers at 8.4M samples). The custom-vjp
    permute keeps the backward a gather (by the inverse permutation)
    rather than XLA's scatter-add transpose.
    """
    if blk_fwd % LANES or blk_bwd % LANES:
        raise ValueError(
            f"pallas.mlp_block / mlp_block_bwd must be multiples of "
            f"{LANES}; got {blk_fwd}/{blk_bwd}")
    kw = make_kernel_weights(
        plan, params.get("non_rigid_mlp"), params["cnl_mlp"],
        condition_code)
    hw = None if plan.skip_nr else hann_input(hann_alpha, plan.nr_multires)
    N = x_skel.shape[0]
    blk, blk_b, pad = resolve_blocks(plan, N, blk_fwd, blk_bwd)
    if pad:
        x_skel = jnp.concatenate(
            [x_skel, jnp.zeros((pad, 3), x_skel.dtype)], axis=0)
    Np = N + pad
    dst = None
    if fg is not None:
        fgf = jax.lax.stop_gradient(fg).reshape(-1).astype(jnp.float32)
        if pad:
            fgf = jnp.concatenate([fgf, jnp.zeros((pad,), jnp.float32)])
        if reorder:
            gsz = int(group)
            if gsz < 1 or (gsz & (gsz - 1)) or gsz > LANES:
                raise ValueError(
                    f"group must be a power of two in [1, {LANES}]; "
                    f"got {group}")
            gsz = min(gsz, blk_b)     # liveness reshapes need gsz | blk_b
            # stable partition at GROUP granularity: live groups first.
            # dst[g] = slot of group g; perm = its inverse (slot -> group).
            # Two cumsums + one unique-index scatter on Ng = Np/gsz ints.
            Ng = Np // gsz
            alive = fgf.reshape(Ng, gsz).max(axis=1) > skip_eps
            pos_live = jnp.cumsum(alive.astype(jnp.int32)) - 1
            n_live = pos_live[-1] + 1
            pos_dead = n_live + jnp.cumsum(
                (~alive).astype(jnp.int32)) - 1
            dst = jnp.where(alive, pos_live, pos_dead)
            perm = jnp.zeros((Ng,), jnp.int32).at[dst].set(
                jnp.arange(Ng, dtype=jnp.int32), unique_indices=True)
            # block liveness from the PERMUTED group-liveness vector --
            # never from a permuted per-sample fg array (that permute is
            # the expensive thing this path exists to avoid)
            galive = alive[perm].astype(jnp.int32)
            live_f = galive.reshape(Np // blk, blk // gsz).max(axis=1)
            live_b = galive.reshape(Np // blk_b, blk_b // gsz).max(axis=1)
        else:
            live_f = (fgf.reshape(Np // blk, blk).max(axis=1)
                      > skip_eps).astype(jnp.int32)
            live_b = (fgf.reshape(Np // blk_b, blk_b).max(axis=1)
                      > skip_eps).astype(jnp.int32)
    else:
        live_f = jnp.ones((Np // blk,), jnp.int32)
        live_b = jnp.ones((Np // blk_b,), jnp.int32)
    xp = x_skel.astype(jnp.float32).T                  # (3, Np) compact
    if dst is not None:
        # permute on the transposed compact layout (axis-1 group gather);
        # touching the (Np, 3) row layout instead costs ~40 ms at 8.4M
        # samples: that tiling is 42x padded on TPU
        xp = _permute_groups(xp.reshape(3, Ng, gsz), perm, dst
                             ).reshape(3, Np)
    rawp = _fused_query_packed(xp, hw, kw, live_f, live_b, plan.key(),
                               blk, blk_b)
    if dst is not None:                                # undo the partition
        rawp = _permute_groups(rawp.reshape(4, Ng, gsz), dst, perm
                               ).reshape(4, Np)
    raw = rawp.T                                       # (Np, 4)
    return raw[:N] if pad else raw
