"""Microbenchmarks behind BENCHMARKS.md's round-4 train-step decomposition.

Reproduces every number in the "train-step decomposition" table for the
DSM/batch-1000 reference workload (512x3 CDE, 90 batches/epoch — the hot
loop of /root/reference/models/diffusion.py:74-105):

  * the serial fwd+bwd+update matmul chain alone (the dependency-chain
    floor: ~24 us/step, ~66% of v5e bf16 peak),
  * the chain + tanh (f32 and bf16) + a fused adam update,
  * the data/diffusion prep pipeline alone (shuffle, fresh noise,
    debiased t, eps, diffuse),
  * the fused Pallas kernel (ops/dsm_train_kernel.py) with and without
    its in-kernel isfinite guard, vs the XLA epoch scan.

Run on the TPU host:  python benchmarks/train_step_decomposition.py
(~4 min; each section prints one labeled line).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

B, H, NB, EPC = 1000, 512, 90, 20
N = EPC * NB


def _mk(key, shape, dtype=jnp.bfloat16):
    return jax.random.normal(key, shape, dtype) * 0.01


def _mmf(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_at(a, b):
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def _mm_bt(a, b):
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def chain_benchmark(act_dtype=None, adam=False):
    """us/step for the serial fwd+bwd+update matmul chain, optionally with
    tanh activations (in act_dtype) and a fused adam update."""
    key = jax.random.PRNGKey(0)
    x = _mk(key, (B, 7))

    def act(z):
        if act_dtype is None:
            return z.astype(jnp.bfloat16), None
        a = jnp.tanh(z.astype(act_dtype))
        return a.astype(jnp.bfloat16), a

    def step(carry, _):
        ws, ms, vs = carry
        w1, w2, w3, w4 = ws
        h1, a1 = act(_mmf(x, w1))
        h2, a2 = act(_mmf(h1, w2))
        h3, a3 = act(_mmf(h2, w3))
        out = _mmf(h3, w4).astype(jnp.bfloat16)
        dz = out
        dw4 = _mm_at(h3, dz)
        da3 = _mm_bt(dz, w4)
        if act_dtype is not None:
            da3 = (da3.astype(act_dtype) * (1 - a3 * a3)).astype(jnp.bfloat16)
        dw3 = _mm_at(h2, da3)
        da2 = _mm_bt(da3, w3)
        if act_dtype is not None:
            da2 = (da2.astype(act_dtype) * (1 - a2 * a2)).astype(jnp.bfloat16)
        dw2 = _mm_at(h1, da2)
        da1 = _mm_bt(da2, w2)
        if act_dtype is not None:
            da1 = (da1.astype(act_dtype) * (1 - a1 * a1)).astype(jnp.bfloat16)
        dw1 = _mm_at(x, da1)
        gs = (dw1, dw2, dw3, dw4)
        if adam:
            nms = tuple(0.9 * m + 0.1 * g.astype(jnp.float32)
                        for m, g in zip(ms, gs))
            nvs = tuple(0.999 * v + 0.001 * jnp.square(g.astype(jnp.float32))
                        for v, g in zip(vs, gs))
            nws = tuple(
                (w.astype(jnp.float32) - 1e-6 * m / (jnp.sqrt(v) + 1e-8)
                 ).astype(jnp.bfloat16)
                for w, m, v in zip(ws, nms, nvs))
            return (nws, nms, nvs), out[0, 0]
        nws = tuple((w.astype(jnp.float32) - 1e-6 * g).astype(jnp.bfloat16)
                    for w, g in zip(ws, gs))
        return (nws, ms, vs), out[0, 0]

    @jax.jit
    def run(c):
        c, outs = jax.lax.scan(step, c, None, length=N)
        return c, outs[-1]

    ws = (_mk(key, (7, H)), _mk(key, (H, H)), _mk(key, (H, H)), _mk(key, (H, 2)))
    ms = tuple(jnp.zeros(w.shape, jnp.float32) for w in ws)
    c = (ws, ms, ms)
    out = run(c)
    jax.block_until_ready(out)
    out = run(out[0])
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(6):
        out = run(out[0])
    jax.block_until_ready(out)
    us = (time.time() - t0) / (6 * N) * 1e6
    flops = 2 * B * (7 * H + H * H + H * H + H * 2) * 3
    return us, flops / (us * 1e-6) / 1e12


def prep_benchmark():
    """ms/epoch for the data + diffusion prep pipeline alone."""
    from dmip_tpu import data
    from dmip_tpu.problems import LinearForwardProblem
    from dmip_tpu.sde import sample_t
    from dmip_tpu.train import get_model_from_args

    prob = LinearForwardProblem()
    key = jax.random.PRNGKey(0)
    xs, ys = data.generate_dataset_linear(key, prob.xdim, prob.forward, NB * B)
    model, _ = get_model_from_args(
        {"model": "CDE", "loss_fn": "DSM", "hidden_layers": [H, H, H]},
        {"xdim": 2, "ydim": 2})
    base = model.sde.base

    def prep_epoch(ekey):
        kdata, kscan = jax.random.split(ekey)
        xb, yb = data.linear_epoch_batches(kdata, xs, ys, prob.noise_std, B)
        keys = jax.random.split(kscan, xb.shape[0])

        def per_batch(k, x, y):
            z0, _ = model.diffusion_state(x, y)
            kt, keps, _ = jax.random.split(k, 3)
            t = sample_t(model.sde, kt, z0.shape[0])
            ep = jax.random.normal(keps, z0.shape, z0.dtype)
            return base.diffuse(t, z0, ep), ep, t

        return jax.vmap(per_batch)(keys, xb, yb)

    @jax.jit
    def prep_all(key):
        js = jnp.arange(EPC)
        ekeys = jax.vmap(lambda j: jax.random.fold_in(key, j))(js)
        return jax.vmap(prep_epoch)(ekeys)

    out = prep_all(key)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(6):
        out = prep_all(key)
    jax.block_until_ready(out)
    return (time.time() - t0) / (6 * EPC) * 1e3


def fused_vs_xla():
    """epochs/s for the fused kernel (guard on/off) vs the XLA epoch scan."""
    import optax

    from dmip_tpu import data, train
    from dmip_tpu.ops.dsm_train_kernel import make_fused_dsm_epoch_fn
    from dmip_tpu.problems import LinearForwardProblem
    from dmip_tpu.train import get_model_from_args

    prob = LinearForwardProblem()
    key = jax.random.PRNGKey(0)
    xs, ys = data.generate_dataset_linear(key, prob.xdim, prob.forward, NB * B)
    model, cfg = get_model_from_args(
        {"model": "CDE", "loss_fn": "DSM", "hidden_layers": [H, H, H]},
        {"xdim": 2, "ydim": 2})
    batch_fn = lambda k: data.linear_epoch_batches(k, xs, ys, prob.noise_std, B)
    lr = 1e-4
    opt = optax.adam(lr)
    params = model.init(key)
    opt_state = opt.init(params)

    def timeit(fn, n=6):
        out = fn(params, opt_state, key, 0)
        jax.block_until_ready(out)
        out = fn(out[0], out[1], key, 0)
        jax.block_until_ready(out)
        t0 = time.time()
        p, o = out[0], out[1]
        for c in range(n):
            p, o, losses, _ = fn(p, o, key, (c + 1) * EPC)
        jax.block_until_ready(losses)
        return n * EPC / (time.time() - t0)

    xla_fn = train.make_epoch_fn(model.make_loss_fn(cfg), opt, batch_fn,
                                 epochs_per_call=EPC, donate=False)
    rows = [("xla epoch scan", timeit(xla_fn))]
    for guard in (True, "loss", False):
        fn = make_fused_dsm_epoch_fn(model, lr, batch_fn,
                                     epochs_per_call=EPC, donate=False,
                                     skip_nonfinite=guard)
        rows.append((f"fused kernel, guard={guard}", timeit(fn)))
    return rows


if __name__ == "__main__":
    us, tf = chain_benchmark(None)
    print(f"matmul chain only:        {us:6.1f} us/step  ({tf:.1f} TFLOP/s, "
          f"{100 * tf / 197:.1f}% of v5e bf16 peak)", flush=True)
    for name, dt in (("f32 tanh", jnp.float32), ("bf16 tanh", jnp.bfloat16)):
        us, _ = chain_benchmark(dt)
        print(f"chain + {name}:         {us:6.1f} us/step", flush=True)
        us, _ = chain_benchmark(dt, adam=True)
        print(f"chain + {name} + adam:  {us:6.1f} us/step", flush=True)
    print(f"prep pipeline alone:      {prep_benchmark():6.3f} ms/epoch", flush=True)
    for name, eps in fused_vs_xla():
        print(f"{name}: {eps:6.1f} epochs/s ({1e6 / (eps * NB):.1f} us/step)",
              flush=True)
