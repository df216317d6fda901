"""Ground-truth MCMC sample generation for scatterometry.

TPU-native equivalent of reference ``generate_scatterometry_ground_truth.py``:
for each of the n_samples_y test conditions, run METR_STEPS Metropolis steps
over n_samples_x parallel chains annealing to the scatterometry posterior
energy, n_repeats times, and save each repeat as gt_dir/<i>/<j>.npy.

Where the reference fans the repeats over 4 joblib worker processes
(reference :62), here one jitted kernel advances ALL repeats' chains at once
(n_repeats x n_samples_x chains in a single batch on device), and the Python
loop only walks conditions.  On a multi-chip mesh the chain axis shards over
devices (pass --devices to use the full slice).

Usage: python mains/generate_scatterometry_ground_truth.py \
          [--config configs/config_scatterometry.yml] [--gt_dir data/gt...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dmip_tpu import data, mcmc
from dmip_tpu.problems import scatterometry as scat
from dmip_tpu.utils import load_config


def make_gt_kernel(forward_model, fparams, n_chains, metr_steps, noise_std,
                   backend: str = "auto", mesh=None):
    """Jitted: one (condition, repeat)'s chains.

    backend='pallas' (default on TPU) uses the fused on-chip MH kernel
    (dmip_tpu.ops.mh_kernel): ~0.25s per 30k-chain x 1000-step run and
    seconds-scale compile.  backend='xla' is the generic scan path (used on
    CPU and for arbitrary energies).

    ``mesh``: an optional 1-D device mesh; chains are independent, so with a
    mesh each device runs n_chains/mesh.size chains under ``shard_map``
    (per-device keys folded from the call key by axis index) — the TPU-native
    replacement for the reference's 4-process joblib fan-out
    (generate_scatterometry_ground_truth.py:59-62).
    """
    a, b, lambd_bd = fparams["a"], fparams["b"], fparams["lambd_bd"]
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    n_shards = 1 if mesh is None else mesh.size
    if n_chains % n_shards:
        raise ValueError(
            f"n_chains={n_chains} must divide over {n_shards} devices"
        )
    n_local = n_chains // n_shards

    if backend == "pallas":
        from dmip_tpu.ops import fused_mh_scatterometry

        weights = scat.load_surrogate_weights()

        def single(key, y):
            k0, ks = jax.random.split(key)
            x0 = jax.random.uniform(k0, (n_local, 3)) * 2.0 - 1.0
            seed = jax.random.randint(ks, (1,), 0, jnp.iinfo(jnp.int32).max)
            return fused_mh_scatterometry(
                weights, x0, y, metr_steps, noise_std=noise_std,
                a=a, b=b, lambd_bd=lambd_bd, seed=seed,
            )
    else:
        def single(key, y):
            k0, km = jax.random.split(key)
            x0 = jax.random.uniform(k0, (n_local, 3)) * 2.0 - 1.0
            ys = jnp.broadcast_to(y, (n_local, y.shape[-1]))
            energy = lambda x: scat.get_log_posterior(
                x, forward_model, a, b, ys, lambd_bd
            )
            x, _ = mcmc.anneal_to_energy(
                km, x0, energy, metr_steps, noise_std=noise_std
            )
            return x

    if mesh is None:
        return jax.jit(single)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def body(key, y):
        k = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return single(k, y)

    return jax.jit(
        shard_map(body, mesh=mesh, in_specs=(P(), P()), out_specs=P(axis))
    )


def run(config: dict, gt_dir: str, plot: bool = True, devices: int = 1,
        mcmc_seed: int = None) -> None:
    forward_model, fparams = scat.load_forward_model()
    key = jax.random.PRNGKey(int(config.get("RANDOM_STATE", 13)))
    k_data, k_mcmc = jax.random.split(key)
    if mcmc_seed is not None:
        # FRESH-SEED ground truth: same y_test conditions (k_data untouched),
        # independent MCMC chains — for held-out validation that any
        # knob selected against the default GT is not fit to its noise.
        k_mcmc = jax.random.PRNGKey(int(mcmc_seed))
    _, y_test = data.generate_dataset_scatterometry(
        k_data, forward_model, fparams["a"], fparams["b"],
        size=int(config["n_samples_y"]),
    )

    mesh = None
    if devices != 1:
        from dmip_tpu.parallel.mesh import get_mesh

        n_dev = len(jax.devices()) if devices in (0, -1) else devices
        if n_dev > 1:
            mesh = get_mesh(n_dev)

    n_repeats = int(config.get("n_repeats", 10))
    n_x = int(config["n_samples_x"])
    kernel = make_gt_kernel(
        forward_model, fparams,
        n_chains=n_x,
        metr_steps=int(config["METR_STEPS"]),
        noise_std=float(config["NOISE_STD_MCMC"]),
        mesh=mesh,
    )

    for i in range(y_test.shape[0]):
        out_dir = os.path.join(gt_dir, str(i))
        os.makedirs(out_dir, exist_ok=True)
        x = None
        for j in range(n_repeats):
            k_mcmc, k = jax.random.split(k_mcmc)
            x = np.asarray(kernel(k, y_test[i]))
            np.save(os.path.join(out_dir, f"{j}.npy"), x)
        if plot and i in config.get("plot_ys", config.get("plot_y", ())):
            from dmip_tpu.utils.plotting import plot_density

            plot_density(
                x, nbins=75, limits=(-1.2, 1.2), xticks=[-1, 0, 1],
                size=(12, 12), labelsize=30,
                fname=os.path.join(out_dir, f"posterior-mcmc-{i}.svg"),
            )
        print(f"gt {i + 1}/{y_test.shape[0]} done", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/config_scatterometry.yml")
    p.add_argument("--gt_dir", default="data/gt_samples_scatterometry")
    p.add_argument(
        "--devices", type=int, default=1,
        help="shard chains over this many devices (-1 = all visible)",
    )
    p.add_argument(
        "--mcmc_seed", type=int, default=None,
        help="fresh-seed GT: same conditions, independent chains",
    )
    args = p.parse_args()
    run(load_config(args.config), args.gt_dir, devices=args.devices,
        mcmc_seed=args.mcmc_seed)
