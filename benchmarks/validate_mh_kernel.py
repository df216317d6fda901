import time, jax, jax.numpy as jnp, numpy as np
from dmip_tpu import data, mcmc
from dmip_tpu.problems import scatterometry as scat
from dmip_tpu.ops import fused_mh_scatterometry

fwd, p = scat.load_forward_model()
weights = scat.load_surrogate_weights()
key = jax.random.PRNGKey(13)
kd, km = jax.random.split(key)
_, y_test = data.generate_dataset_scatterometry(kd, fwd, p["a"], p["b"], size=2)
y = y_test[0]
N, S = 5000, 300

@jax.jit
def run_xla(k):
    k0, kmm = jax.random.split(k)
    x0 = jax.random.uniform(k0, (N,3))*2-1
    ys = jnp.broadcast_to(y, (N,23))
    energy = lambda x: scat.get_log_posterior(x, fwd, p["a"], p["b"], ys, p["lambd_bd"])
    return mcmc.anneal_to_energy(kmm, x0, energy, S, noise_std=0.5)[0]

t0=time.time(); x_xla = run_xla(km); jax.block_until_ready(x_xla)
print("xla compile+run:", time.time()-t0, flush=True)

x0 = jax.random.uniform(jax.random.PRNGKey(5), (N,3))*2-1
x_pal = fused_mh_scatterometry(weights, x0, y, S, noise_std=0.5,
        a=p["a"], b=p["b"], lambd_bd=p["lambd_bd"], seed=11)
xa, xp = np.asarray(x_xla), np.asarray(x_pal)
print("xla mean/std:", xa.mean(0), xa.std(0))
print("pal mean/std:", xp.mean(0), xp.std(0))
dm = np.abs(xa.mean(0)-xp.mean(0)).max(); ds = np.abs(xa.std(0)-xp.std(0)).max()
print("dmean:", dm, "dstd:", ds)
assert dm < 0.03 and ds < 0.03
print("OK")
