"""Linear-Gaussian toy inverse problem with fully analytic posterior.

Re-specifies reference ``linear_problem.py``: 2D->2D affine forward
f(x) = A x + b with A = [[1, .5], [0, 1]], b = (0.3, 0.5), Gaussian noise
Sigma = 0.3 I, standard-normal prior.  The analytic posterior and posterior
score serve as the PINN initial condition and the end-to-end evaluation
oracle (SURVEY.md §4).

Extension beyond the reference: :meth:`diffused_posterior_score` gives the
analytic score of the VP-diffused posterior marginal at any time t (the
posterior is Gaussian, so the diffused marginal N(alpha m, alpha^2 C +
sigma^2 I) is closed-form) — used as a ground-truth oracle for the ScoreFPE
machinery tests.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LinearForwardProblem:
    """Analytic linear-Gaussian problem (reference linear_problem.py:5-65)."""

    xdim: int = dataclasses.field(default=2, metadata=dict(static=True))
    ydim: int = dataclasses.field(default=2, metadata=dict(static=True))
    scale: float = dataclasses.field(default=0.3, metadata=dict(static=True))
    epsilon: float = dataclasses.field(default=1e-6, metadata=dict(static=True))

    @property
    def A(self) -> Array:
        return jnp.array([[1.0, 0.5], [0.0, 1.0]])

    @property
    def b(self) -> Array:
        return jnp.array([0.3, 0.5])

    @property
    def Sigma(self) -> Array:
        return self.scale * jnp.eye(self.ydim)

    @property
    def noise_std(self) -> float:
        """Observation noise STANDARD DEVIATION consistent with Sigma.

        DOCUMENTED DIVERGENCE (reference bug, SURVEY.md §2.3.11): the
        reference's data loader adds ``scale * randn`` = std 0.3
        (datasets.py:47, main_diffusion_linear.py:26) while every analytic
        formula treats Sigma = scale * I = 0.3 I as the noise COVARIANCE
        (std sqrt(0.3) ~= 0.548; linear_problem.py:18).  Training on the
        mismatched noise makes every learned model over-concentrated versus
        the analytic posterior (measured: KL 1.37 vs 0.02 for an otherwise
        identical CDE+DSM run).  All drivers here train with this consistent
        std.
        """
        import math

        return math.sqrt(self.scale)

    @property
    def Sigma_inv(self) -> Array:
        return (1.0 / self.scale) * jnp.eye(self.ydim)

    @property
    def Lam(self) -> Array:
        return jnp.eye(self.xdim)

    @property
    def mu(self) -> Array:
        return jnp.zeros(self.xdim)

    @property
    def Sigma_y_inv(self) -> Array:
        # inv(Sigma + A Lam A^T + eps I)  (reference linear_problem.py:20)
        m = self.Sigma + self.A @ self.Lam @ self.A.T + self.epsilon * jnp.eye(
            self.ydim
        )
        return jnp.linalg.inv(m)

    # -- forward model -----------------------------------------------------
    def __call__(self, x: Array) -> Array:
        return self.forward(x)

    def forward(self, x: Array) -> Array:
        """f(x) = x A^T + b, batched (reference linear_problem.py:27-29)."""
        return x @ self.A.T + self.b

    # -- analytic distributions -------------------------------------------
    def posterior_moments(self, y: Array):
        """Posterior N(mean, cov) of x | y (reference linear_problem.py:41-46)."""
        y_res = y - (self.A @ self.mu + self.b)
        mean = self.Lam @ self.A.T @ self.Sigma_y_inv @ y_res
        cov = self.Lam - self.Lam @ self.A.T @ self.Sigma_y_inv @ self.A @ self.Lam
        return mean, cov

    def sample_posterior(self, key: Array, y: Array, n: int) -> Array:
        mean, cov = self.posterior_moments(y)
        return jax.random.multivariate_normal(key, mean, cov, (n,))

    def posterior_log_prob(self, x: Array, y: Array) -> Array:
        """True normalized log N(x; mean, cov), batched over x."""
        mean, cov = self.posterior_moments(y)
        return jax.scipy.stats.multivariate_normal.logpdf(x, mean, cov)

    def log_posterior(self, xs: Array, ys: Array, epsilon: float = 1e-6) -> Array:
        """Quadratic-form energy + 1/2 (x-m)^T C^-1 (x-m) of the posterior.

        Like the reference (linear_problem.py:48-58) this returns an
        (unnormalized) NEGATIVE log posterior, shape (batch, 1), with
        cov = Lam - A^T Sigma_y_inv A (the true posterior covariance since
        Lam = I).  DOCUMENTED DIVERGENCE: the reference computes the mean as
        ``y_res @ (A.T @ Sigma_y_inv)`` which transposes to Sigma_y_inv A
        y_res — inconsistent with its own ``get_posterior`` mean
        A^T Sigma_y_inv y_res (linear_problem.py:43 vs :50).  We use the
        correct posterior mean so this energy matches the analytic posterior
        used everywhere else.
        """
        y_res = ys - (self.A @ self.mu + self.b)
        mean = y_res @ (self.Sigma_y_inv @ self.A)
        x_res = xs - mean
        cov = self.Lam - self.A.T @ self.Sigma_y_inv @ self.A
        cov_inv = jnp.linalg.inv(cov + epsilon * jnp.eye(self.xdim))
        q = 0.5 * jnp.einsum("bi,ij,bj->b", x_res, cov_inv, x_res)
        return q[:, None]

    def score_posterior(self, x: Array, y: Array) -> Array:
        """Analytic grad_x log p(x|y) = -x + A^T Sigma^-1 (y - Ax - b).

        Reference linear_problem.py:61-65; used as the PINN initial condition
        and the score-MSE evaluation truth.
        """
        y_res = y - (x @ self.A.T + self.b)
        return -x + (y_res @ self.Sigma_inv.T) @ self.A

    # -- diffusion-time oracles (new; test + analysis support) -------------
    def joint_moments(self) -> Tuple[Array, Array]:
        """Mean/covariance of the JOINT z = (x, y): x ~ N(0, I),
        y = Ax + b + eps.  m_z = (0, b); C_z = [[I, A^T], [A, A A^T + Sigma]]."""
        mz = jnp.concatenate([jnp.zeros(self.xdim), self.b])
        top = jnp.concatenate([jnp.eye(self.xdim), self.A.T], axis=1)
        bot = jnp.concatenate([self.A, self.A @ self.A.T + self.Sigma], axis=1)
        return mz, jnp.concatenate([top, bot], axis=0)

    def diffused_joint_score(self, sde, z: Array, t: Array) -> Array:
        """Analytic score of the VP-diffused JOINT marginal at time t — the
        exact function CDiffE's net learns (CDiffE analysis oracle).

        p_t(z_t) = N(alpha m_z, alpha^2 C_z + sigma^2 I).
        """
        mz, Cz = self.joint_moments()
        alpha = sde.mean_weight(t)  # (n, 1)
        var = sde.var(t)
        d = self.xdim + self.ydim
        cov_t = (alpha**2)[..., None] * Cz[None] \
            + var[..., None] * jnp.eye(d)[None]  # (n, d, d)
        res = z - alpha * mz
        return -jnp.linalg.solve(cov_t, res[..., None])[..., 0]

    def diffused_posterior_score(self, sde, x: Array, y: Array, t: Array) -> Array:
        """Analytic score of the VP-diffused posterior marginal at time t.

        p_t(x_t | y) = N(alpha(t) m, alpha(t)^2 C + sigma(t)^2 I); score =
        -(alpha^2 C + sigma^2 I)^{-1} (x_t - alpha m).
        """
        mean, cov = self.posterior_moments(y)
        alpha = sde.mean_weight(t)
        var = sde.var(t)
        cov_t = alpha**2 * cov + var * jnp.eye(self.xdim)
        return -(x - alpha * mean) @ jnp.linalg.inv(cov_t).T
