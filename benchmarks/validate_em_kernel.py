import sys, time
import jax
import jax.numpy as jnp
import numpy as np
from dmip_tpu.ops.em_kernel import fused_em_sampler
from dmip_tpu.samplers import euler_maruyama
from dmip_tpu.sde import ReverseSDE
from dmip_tpu.nets import mlp_init, score_mlp_apply
from dmip_tpu.problems import LinearForwardProblem

mode = sys.argv[1] if len(sys.argv) > 1 else "stats"
print("devices:", jax.devices(), flush=True)

if mode == "stats":
    # contractive analytic construction: perfect score of diffused N(0,I) -> -x
    # using a tiny net won't give that; instead statistical comparison of
    # pallas vs XLA with the SAME trained-ish stable construction:
    H = 64
    W1 = np.zeros((5, H), np.float32); W1[0,0] = W1[1,1] = 0.01
    W2 = np.zeros((H, H), np.float32); W2[0,0] = W2[1,1] = 1.0
    W3 = np.zeros((H, 2), np.float32); W3[0,0] = W3[1,1] = -300.0
    params = ((jnp.asarray(W1), jnp.zeros(H)),
              (jnp.asarray(W2), jnp.zeros(H)),
              (jnp.asarray(W3), jnp.zeros(2)))
    apply_a = lambda z, c, s: score_mlp_apply(params, z, c, s)
    sde = ReverseSDE()
    key = jax.random.PRNGKey(1)
    y = jnp.array([0.8, -0.3])
    N = 32768
    t0=time.time()
    x_ref = jax.jit(lambda k: euler_maruyama(sde, apply_a, k, y, N, 2, 100))(key)
    jax.block_until_ready(x_ref); print("xla compile+run:", time.time()-t0, flush=True)
    k0, _ = jax.random.split(key)
    x0 = jax.random.normal(k0, (N, 2))
    t0=time.time()
    f = jax.jit(lambda x0: fused_em_sampler(params, x0, y, num_steps=100, seed=7,
                block_rows=1024, compute_dtype=jnp.float32))
    x_pal = f(x0); jax.block_until_ready(x_pal)
    print("pallas compile+run:", time.time()-t0, flush=True)
    mr, mp = np.mean(np.asarray(x_ref),0), np.mean(np.asarray(x_pal),0)
    cr, cp = np.cov(np.asarray(x_ref).T), np.cov(np.asarray(x_pal).T)
    print("ref:", mr, cr.ravel())
    print("pal:", mp, cp.ravel())
    assert np.abs(mr-mp).max() < 0.05, "mean mismatch"
    assert np.abs(cr-cp).max() < 0.05, "cov mismatch"
    print("OK stats", flush=True)
elif mode == "speed":
    params = mlp_init(jax.random.PRNGKey(0), 5, 2, (512, 512, 512))
    y = jnp.array([0.8, -0.3])
    N, S = 307200, 200
    x0 = jax.random.normal(jax.random.PRNGKey(2), (N, 2))
    dt = jnp.bfloat16 if len(sys.argv) > 2 and sys.argv[2] == "bf16" else jnp.float32
    f = jax.jit(lambda x0, seed: fused_em_sampler(params, x0, y, num_steps=S,
                seed=seed, block_rows=1024, compute_dtype=dt))
    t0=time.time(); jax.block_until_ready(f(x0, 1)); print("compile+run:", time.time()-t0, flush=True)
    t0=time.time()
    for r in range(3): out = f(x0, r)
    jax.block_until_ready(out)
    dt_s = (time.time()-t0)/3
    print(f"per-call: {dt_s:.3f}s -> {N*S/dt_s/1e6:.1f}M sample-steps/s", flush=True)
    print("out finite:", bool(np.all(np.isfinite(np.asarray(out)))), "std:", np.asarray(out).std())
