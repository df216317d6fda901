"""Pallas TPU kernel: fully-fused DSM training epochs.

The DSM train step at the reference workload (512x3 MLP, batch 1000;
reference models/diffusion.py:74-105's hot loop) runs at ~26% of MXU peak
under XLA: per optimizer step the weights (2.2 MB) and adam moments (4.4 MB)
round-trip HBM across ~15 small fused kernels, and per-kernel overhead
dominates 1000-row matmuls (BENCHMARKS.md "training roofline").  This kernel
runs ENTIRE EPOCHS on-chip:

  * params + adam moments live in VMEM across every optimizer step of the
    call — grid iterations on a TPU core run sequentially, so outputs with a
    constant index_map act as loop-carried state (initialized from the
    inputs at the first grid step);
  * the per-step diffused batches stream through VMEM blocks (Mosaic
    double-buffers the HBM DMAs behind the matmuls);
  * forward + hand-written backward (transposed matmuls over saved
    activations, as ops/dps_kernel.py) + the adam update + the
    skip-nonfinite guard fuse into ONE program per optimizer step.

MEASURED OUTCOME (round 4, v5e via tunnel; BENCHMARKS.md "train-step
decomposition"): the fused kernel runs AT the XLA path's rate — 181 vs 183
epochs/s at the reference workload — which REFUTES the HBM hypothesis.  The
decomposition shows where the 61 us/step actually go: the serial
fwd+bwd+update matmul chain alone measures 24.3 us/step (66% of bf16 peak;
the dependency-chain floor), tanh and a fused adam add ~2.5 us, data/
diffusion prep ~8-11 us, the isfinite guard 4.7 us (measured via
skip_nonfinite=False: 195 vs 181 epochs/s), and the rest is
params-proportional VPU state work (adam on 2.4 MB of f32 moments, per-use
f32->bf16 weight casts) that cannot overlap the MXU inside a sequential
optimizer step.  XLA's epoch scan already runs at this bound; eliminating
the HBM round-trips is worth <2%.  The kernel therefore ships as (a) the
measurement instrument behind that bound, and (b) a parity-tested
alternative epoch engine; the measured levers for grid-scale throughput
remain ensemble stacking (2.0x at K=9, dmip_tpu/ensemble.py) and batch
scaling (41.6% MFU at 16k, bench.py --train).

The wrapper (:func:`make_fused_dsm_epoch_fn`) precomputes the diffusion
randomness (t, eps -> net input h0 and the DSM scale std/g) with EXACTLY the
same key schedule as ``train.make_epoch_fn`` + the DSM branch of
``DiffusionModel.make_loss_fn`` (same splits, same draws), so the fused path
is a drop-in for the XLA epoch fn: same batches, same noise, same
adam/bias-correction/skip-nonfinite semantics.  Parameter-level parity is
tested in interpret mode (tests/test_dsm_train_kernel.py).

Scope (asserted by the wrapper): MLP-tuple params, DSM loss, plain
``optax.adam`` with a constant learning rate, per-optimizer-batch rows
<= ~4k (the reference uses 1000; VMEM holds the f32 activations).
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _mm(lhs: Array, rhs: Array, compute_dtype) -> Array:
    """(B, K) @ (K, N) -> (B, N), f32 accumulation."""
    return jax.lax.dot_general(
        lhs.astype(compute_dtype), rhs.astype(compute_dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm_at_b(lhs: Array, rhs: Array, compute_dtype) -> Array:
    """lhs^T @ rhs with lhs (B, M), rhs (B, N) -> (M, N): contract dim 0."""
    return jax.lax.dot_general(
        lhs.astype(compute_dtype), rhs.astype(compute_dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm_a_bt(lhs: Array, rhs: Array, compute_dtype) -> Array:
    """lhs @ rhs^T with lhs (B, N), rhs (M, N) -> (B, M): contract dim 1."""
    return jax.lax.dot_general(
        lhs.astype(compute_dtype), rhs.astype(compute_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dsm_train_kernel(
    nact_ref,      # SMEM (1,) i32: active epochs this call
    count0_ref,    # SMEM (1,) i32: adam step count on entry
    h0_ref,        # VMEM (B, in) f32 block: net input [z_t, cond, t]
    eps_ref,       # VMEM (B, out) f32 block: DSM noise target
    s1_ref,        # VMEM (B, out) f32 block: std/g (0 on padded rows)
    *wmv_refs,     # per layer: W, mW, vW, b, mb, vb (inputs), then the same
                   # 6 per layer as outputs, then loss_ref, state_ref, and
                   # the two SMEM scratch refs (count, loss accumulator)
    n_layers: int,
    n_batches: int,
    inv_b: float,
    lr: float,
    b1: float,
    b2: float,
    adam_eps: float,
    compute_dtype,
    skip_nonfinite,  # True ('grads'), 'loss', or False
):
    L = n_layers
    in_refs = wmv_refs[: 6 * L]
    out_refs = wmv_refs[6 * L : 12 * L]
    loss_ref = wmv_refs[12 * L]       # (8, 128) f32 block, one per epoch
    state_ref = wmv_refs[12 * L + 1]  # (8, 128) f32, final adam count
    count_smem = wmv_refs[12 * L + 2]  # SMEM scratch (1,) f32
    loss_smem = wmv_refs[12 * L + 3]   # SMEM scratch (1,) f32

    e = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((e == 0) & (i == 0))
    def _seed_state():
        # Outputs become the loop-carried params/adam state: copy once.
        for k in range(12 * L // 2):
            out_refs[k][:] = in_refs[k][:]
        count_smem[0] = count0_ref[0].astype(jnp.float32)

    @pl.when(i == 0)
    def _reset_loss():
        loss_smem[0] = 0.0

    # ---- forward ----------------------------------------------------------
    h0 = h0_ref[:]    # (B, in) f32
    eps = eps_ref[:]  # (B, out)
    s1 = s1_ref[:]    # (B, out)

    ws = [out_refs[6 * k][:] for k in range(L)]
    bs = [out_refs[6 * k + 3][:] for k in range(L)]

    acts = []  # tanh outputs, f32
    h = h0
    for k in range(L - 1):
        z = _mm(h, ws[k], compute_dtype) + bs[k]
        h = jnp.tanh(z)
        acts.append(h)
    out = _mm(h, ws[L - 1], compute_dtype) + bs[L - 1]  # (B, out) f32

    r = out * s1 + eps
    batch_loss = 0.5 * jnp.sum(r * r) * inv_b
    loss_smem[0] = loss_smem[0] + batch_loss

    # ---- backward (transposed matmuls over saved activations) -------------
    grads = [None] * (2 * L)  # [dW1, db1, dW2, db2, ...]
    dz = r * (s1 * inv_b)     # dL/d(out)
    for k in range(L - 1, -1, -1):
        a_prev = acts[k - 1] if k > 0 else h0
        grads[2 * k] = _mm_at_b(a_prev, dz, compute_dtype)       # (fan_in, fan_out)
        grads[2 * k + 1] = jnp.sum(dz, axis=0, keepdims=True)    # (1, fan_out)
        if k > 0:
            da = _mm_a_bt(dz, ws[k], compute_dtype)              # (B, fan_in)
            dz = da * (1.0 - a_prev * a_prev)

    # ---- skip-nonfinite guard + epoch masking ------------------------------
    # 'grads' (exact XLA-path semantics): every gradient checked, measured at
    # 4.7 us/step. 'loss': one scalar check on the batch loss — catches the
    # realistic failures (non-finite data / diverged params make the loss
    # non-finite) at ~zero cost, but misses the exotic finite-loss/
    # non-finite-grad case (e.g. an inf input cell that tanh saturates).
    do_update = e < nact_ref[0]
    if skip_nonfinite == "loss":
        do_update = jnp.logical_and(do_update, jnp.isfinite(batch_loss))
    elif skip_nonfinite:
        fin = jnp.bool_(True)
        for g in grads:
            fin = jnp.logical_and(fin, jnp.all(jnp.isfinite(g)))
        do_update = jnp.logical_and(do_update, fin)

    # ---- adam (optax.scale_by_adam semantics, constant lr) ----------------
    count = count_smem[0]
    cnt_new = count + 1.0
    # b ** n as exp(n log b): Mosaic-safe scalar transcendental
    bc1 = 1.0 - jnp.exp(cnt_new * math.log(b1))
    bc2 = 1.0 - jnp.exp(cnt_new * math.log(b2))
    for k in range(L):
        for j, g in ((0, grads[2 * k]), (1, grads[2 * k + 1])):
            p_ref = out_refs[6 * k + 3 * j]
            m_ref = out_refs[6 * k + 3 * j + 1]
            v_ref = out_refs[6 * k + 3 * j + 2]
            m_new = b1 * m_ref[:] + (1.0 - b1) * g
            v_new = b2 * v_ref[:] + (1.0 - b2) * (g * g)
            upd = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + adam_eps)
            p_ref[:] = jnp.where(do_update, p_ref[:] - lr * upd, p_ref[:])
            m_ref[:] = jnp.where(do_update, m_new, m_ref[:])
            v_ref[:] = jnp.where(do_update, v_new, v_ref[:])
    count_smem[0] = jnp.where(do_update, cnt_new, count)

    # ---- per-epoch loss + final state rows ---------------------------------
    # (8, 128) blocks with the scalar at [0, 0]: Mosaic requires >=8 sublanes
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    at00 = (sub == 0) & (lane == 0)

    @pl.when(i == n_batches - 1)
    def _write_loss():
        loss_ref[:] = jnp.where(at00, loss_smem[0] / n_batches, 0.0)
        state_ref[:] = jnp.where(at00, count_smem[0], 0.0)


def fused_dsm_train_epochs(
    params,
    mu,
    nu,
    count: Array,
    h0: Array,
    eps: Array,
    s1: Array,
    n_epochs: int,
    n_batches: int,
    batch_real: int,
    lr: float,
    n_active: Array,
    b1: float = 0.9,
    b2: float = 0.999,
    adam_eps: float = 1e-8,
    compute_dtype=jnp.bfloat16,
    skip_nonfinite=True,  # True ('grads' semantics), 'loss', or False
    interpret: bool = False,
):
    """Run n_epochs x n_batches fused DSM optimizer steps on-chip.

    params/mu/nu: MLP (W, b) tuples (adam first/second moments for mu/nu).
    h0:  (n_epochs * n_batches * B, in)  f32 net inputs [z_t, cond, t]
    eps: (n_epochs * n_batches * B, out) f32 DSM noise targets
    s1:  (..., out) f32 per-row std/g scale (zero rows = padding)
    count: scalar int32 adam step count on entry.
    n_active: scalar int32 — epochs >= n_active compute but don't update
    (train.make_epoch_fn's masked-epoch semantics).

    Returns (params, mu, nu, new_count, per-epoch losses (n_epochs,)).
    """
    L = len(params)
    rows = h0.shape[0]
    assert rows % (n_epochs * n_batches) == 0
    bp = rows // (n_epochs * n_batches)
    assert bp % 8 == 0, f"padded batch {bp} must be a multiple of 8"
    out_dim = eps.shape[1]
    nb = n_batches

    wmv_args = []
    for k in range(L):
        w, b = params[k]
        mw, mb_ = mu[k]
        vw, vb = nu[k]
        wmv_args += [
            w.astype(jnp.float32),
            mw.astype(jnp.float32),
            vw.astype(jnp.float32),
            b.reshape(1, -1).astype(jnp.float32),
            mb_.reshape(1, -1).astype(jnp.float32),
            vb.reshape(1, -1).astype(jnp.float32),
        ]
    resident = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    wmv_in_specs = [resident() for _ in wmv_args]
    wmv_out_specs = [
        pl.BlockSpec(a.shape, lambda e, i: (0, 0), memory_space=pltpu.VMEM)
        for a in wmv_args
    ]
    wmv_out_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in wmv_args]

    kernel = functools.partial(
        _dsm_train_kernel,
        n_layers=L,
        n_batches=nb,
        inv_b=1.0 / batch_real,
        lr=float(lr),
        b1=b1,
        b2=b2,
        adam_eps=adam_eps,
        compute_dtype=compute_dtype,
        skip_nonfinite=skip_nonfinite,
    )

    outs = pl.pallas_call(
        kernel,
        grid=(n_epochs, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_active
            pl.BlockSpec(memory_space=pltpu.SMEM),  # count0
            pl.BlockSpec((bp, h0.shape[1]), lambda e, i: (e * nb + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, out_dim), lambda e, i: (e * nb + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, out_dim), lambda e, i: (e * nb + i, 0),
                         memory_space=pltpu.VMEM),
            *wmv_in_specs,
        ],
        out_specs=[
            *wmv_out_specs,
            pl.BlockSpec((8, 128), lambda e, i: (e, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda e, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            *wmv_out_shapes,
            jax.ShapeDtypeStruct((n_epochs * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SMEM((1,), jnp.float32),
        ],
        # plain interpret=True falls into the generic interpreter, which
        # hangs on this image; the TPU-semantics interpreter is the one the
        # test suite uses (tests/test_dps_kernel.py)
        interpret=pltpu.InterpretParams() if interpret is True else interpret,
        # the resident params/adam state + f32 activations exceed the 16 MB
        # default scoped-vmem budget at 512x3/batch-1000; v5e has 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # every grid step reads the params the previous step wrote:
            # the grid is a sequential loop, not a parallel tiling
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(
        jnp.asarray(n_active, jnp.int32).reshape(1),
        jnp.asarray(count, jnp.int32).reshape(1),
        h0.astype(jnp.float32),
        eps.astype(jnp.float32),
        s1.astype(jnp.float32),
        *wmv_args,
    )

    new_params, new_mu, new_nu = [], [], []
    for k in range(L):
        w, mw, vw, b, mb_, vb = outs[6 * k : 6 * k + 6]
        bshape = params[k][1].shape
        new_params.append((w, b.reshape(bshape)))
        new_mu.append((mw, mb_.reshape(bshape)))
        new_nu.append((vw, vb.reshape(bshape)))
    losses = outs[6 * L][0::8, 0]
    new_count = outs[6 * L + 1][0, 0].astype(jnp.int32)
    return (
        tuple(new_params),
        tuple(new_mu),
        tuple(new_nu),
        new_count,
        losses,
    )


def make_fused_dsm_epoch_fn(
    model,
    lr: float,
    batch_fn: Callable[..., Tuple[Array, Array]],
    epochs_per_call: int = 1,
    compute_dtype=jnp.bfloat16,
    skip_nonfinite=True,  # True ('grads' semantics), 'loss', or False
    interpret="auto",
    donate: bool = True,
):
    """Drop-in fused replacement for ``train.make_epoch_fn`` (DSM + adam).

    ``interpret="auto"`` (default) runs the kernel natively on TPU and in
    the TPU-semantics interpreter on CPU — so the same config works under
    the test suite's virtual-CPU platform and on device.

    Returns epochs(params, opt_state, key, epoch0, n_active) with the same
    signature/semantics as the XLA path: the key schedule (per-epoch
    fold_in, per-batch splits, the loss's kt/keps draws) is replicated
    exactly, so the fused path consumes the SAME batches and noise as
    ``make_epoch_fn(model.make_loss_fn(DSM), optax.adam(lr), batch_fn)``
    would, and updates match to matmul precision.

    ``opt_state`` must be a plain ``optax.adam(lr)`` state (constant lr).

    One deliberate divergence: for epochs >= n_active the XLA masked_epoch
    still trains batch-to-batch INSIDE the discarded epoch, so its reported
    (never-consumed) losses differ; the fused kernel freezes per step.
    Final params/opt_state and losses[:n_active] are identical either way
    (train.fit stops reading at num_epochs).
    """
    from ..sde import sample_t

    if interpret == "auto":
        interpret = jax.devices()[0].platform == "cpu"
    base = model.sde.base

    def prep_epoch(ekey):
        """One epoch's (h0, eps, s1), (nb, B, .) — replicates the XLA schedule."""
        kdata, kscan = jax.random.split(ekey)
        xb, yb = batch_fn(kdata)  # (nb, B, d)
        nb = xb.shape[0]
        keys = jax.random.split(kscan, nb)

        def per_batch(k, x, y):
            z0, cond_y = model.diffusion_state(x, y)
            kt, keps, _ = jax.random.split(k, 3)
            t = sample_t(model.sde, kt, z0.shape[0])
            ep = jax.random.normal(keps, z0.shape, z0.dtype)
            z_t = base.diffuse(t, z0, ep)
            scale = base.std(t) / base.g(t)  # (B, 1)
            cond = cond_y if z0.shape[-1] == x.shape[-1] else None
            parts = [z_t]
            if cond is not None and cond.size > 0:
                parts.append(cond)
            parts.append(t)
            h0 = jnp.concatenate(parts, axis=-1)
            s1 = jnp.broadcast_to(scale, ep.shape)
            return h0, ep, s1

        return jax.vmap(per_batch)(keys, xb, yb)

    def epochs(params, opt_state, key, epoch0, n_active=epochs_per_call):
        inner = opt_state[0]
        mu, nu, count = inner.mu, inner.nu, inner.count

        js = jnp.arange(epochs_per_call)
        ekeys = jax.vmap(lambda j: jax.random.fold_in(key, epoch0 + j))(js)
        h0, ep, s1 = jax.vmap(prep_epoch)(ekeys)  # (E, nb, B, .)
        nb, bsz = h0.shape[1], h0.shape[2]
        in_dim = h0.shape[-1]
        out_dim = ep.shape[-1]
        pad = (-bsz) % 8
        if pad:
            zpad = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, pad), (0, 0)))
            h0, ep, s1 = zpad(h0), zpad(ep), zpad(s1)
        bp = bsz + pad
        h0 = h0.reshape(epochs_per_call * nb * bp, in_dim)
        ep = ep.reshape(epochs_per_call * nb * bp, out_dim)
        s1 = s1.reshape(epochs_per_call * nb * bp, out_dim)

        new_params, new_mu, new_nu, new_count, losses = fused_dsm_train_epochs(
            params, mu, nu, count, h0, ep, s1,
            n_epochs=epochs_per_call, n_batches=nb, batch_real=bsz,
            lr=lr, n_active=n_active,
            compute_dtype=compute_dtype, skip_nonfinite=skip_nonfinite,
            interpret=interpret,
        )
        new_inner = inner._replace(count=new_count, mu=new_mu, nu=new_nu)
        new_opt_state = (new_inner,) + tuple(opt_state[1:])
        return new_params, new_opt_state, losses, {}

    return jax.jit(
        epochs,
        static_argnums=(),
        donate_argnums=(0, 1) if donate else (),
    )
