"""Where does PINNLoss2's NLPD=9339 come from?  Quantile evidence.

Round-3 measured the data-term-free PINNLoss2 variant end-to-end on the
linear problem (configs/config_linear_pinn2.yml): KL 0.920, score-MSE 6e-4 —
a near-perfect POINTWISE score fit — yet NLPD 9339.  A four-digit NLPD with
a good score fit means catastrophic TAIL mass: NLL_model averages
-log p_true(x) over model samples, so a handful of far-out samples with
astronomically negative log-density dominate the mean.  This tool makes that
quantitative: per condition it reports the Mahalanobis-distance quantiles of
the model samples under the analytic posterior, the fraction beyond 6 sigma,
and how much of the NLL gap the worst 0.1% of samples carries — for the raw
PINN2 sampler AND its exact-energy refined companion (the rescue row).

Why PINN2 leaks tails while PINNLoss doesn't: without the DSM data term the
loss constrains the score only ON the sampled diffusion paths of the data;
the reverse SDE started from N(0,1) visits regions (early, high-noise steps)
where the learned score is unconstrained, and integration errors there are
never pulled back.  The IC term anchors t=0 scores pointwise (hence the 6e-4
MSE on POSTERIOR samples) but off-distribution excursions at t>0 land
samples outside the posterior's support before t reaches 0.

Usage: python tools/pinn2_diagnosis.py [--ckpt trained_models/linearModel_pinn2/checkpoint]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dmip_tpu import checkpoints, data, train
from dmip_tpu.models.refined import from_config
from dmip_tpu.problems import LinearForwardProblem
from dmip_tpu.utils import load_config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/config_linear_pinn2.yml")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--n_ys", type=int, default=10)
    p.add_argument("--n_samples", type=int, default=30000)
    p.add_argument("--refine", default=None,
                   help="override the config's refine spec — e.g. "
                        "'mala,60,0.05': the random-walk MH rescue fails "
                        "(travel radius ~sqrt(steps)*std << the 15-1400 "
                        "sigma excursions) but MALA's gradient drift "
                        "contracts off-support mass geometrically")
    args = p.parse_args()

    config = load_config(args.config)
    prob = LinearForwardProblem()
    key = jax.random.PRNGKey(int(config.get("random_state", 7)))
    k_data, k_split, k_init, _k_train, k_eval = jax.random.split(key, 5)
    xs, ys = data.generate_dataset_linear(
        k_data, prob.xdim, prob.forward, int(config["dataset_size"])
    )
    _, _, _, y_test = data.train_test_split(
        k_split, xs, ys, float(config["train_size"])
    )

    model, _ = train.get_model_from_args(
        config, {"xdim": prob.xdim, "ydim": prob.ydim}
    )
    ckpt = args.ckpt or os.path.join(config["train_dir"], "checkpoint")
    params = checkpoints.load_checkpoint(ckpt, model.init(k_init), None)["params"]
    print(f"resolved checkpoint: {ckpt}", flush=True)

    energy = lambda x, yy: prob.log_posterior(x, yy)[:, 0]
    spec = args.refine or str(config.get("refine", "mh,20,0.2"))
    refined, tag = from_config(model, energy, spec)

    def make_stats(m):
        def stats(k, y):
            x = m.sample(params, k, y, args.n_samples, 200)
            mean, cov = prob.posterior_moments(y)
            cov_inv = jnp.linalg.inv(cov)
            d2 = jnp.einsum("bi,ij,bj->b", x - mean, cov_inv, x - mean)
            maha = jnp.sqrt(d2)
            nll = -prob.posterior_log_prob(x, y)
            q = jnp.quantile(maha, jnp.array([0.5, 0.9, 0.99, 0.999, 1.0]))
            frac6 = jnp.mean(maha > 6.0)
            # NLL with the worst 0.1% of samples removed
            cut = jnp.quantile(nll, 0.999)
            nll_trim = jnp.mean(jnp.where(nll <= cut, nll, 0.0)) / jnp.mean(
                (nll <= cut).astype(jnp.float32)
            )
            return q, frac6, jnp.mean(nll), nll_trim

        return jax.jit(stats)

    # true-posterior reference: max Mahalanobis at 30k Gaussian draws is
    # ~4.5 and NLL ~= the posterior's differential entropy (~1.3 here)
    for name, m in (("pinn2-raw", model), (f"pinn2+{tag}", refined)):
        stats = make_stats(m)
        qs, f6, nlls, nllt = [], [], [], []
        for i in range(args.n_ys):
            q, frac6, nll, nll_trim = stats(
                jax.random.fold_in(k_eval, i), y_test[i]
            )
            qs.append(np.asarray(q))
            f6.append(float(frac6))
            nlls.append(float(nll))
            nllt.append(float(nll_trim))
        qs = np.mean(np.stack(qs), axis=0)
        print(
            f"[{name}] Mahalanobis quantiles (50/90/99/99.9/max): "
            f"{np.round(qs, 2)} | frac>6sigma {np.mean(f6):.2e} | "
            f"NLL {np.mean(nlls):.1f} -> trimmed(0.1%) {np.mean(nllt):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
