"""Multi-device tests on the 8-device virtual CPU mesh.

Data-parallel training step equivalence (sharded == single-device), sharded
sampling, and the driver-facing __graft_entry__ contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dmip_tpu import data, train
from dmip_tpu.models import CDE, LossConfig
from dmip_tpu.parallel.mesh import batch_sharding, get_mesh, replicate
from dmip_tpu.problems import LinearForwardProblem


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return get_mesh(8)


def test_mesh_helpers(mesh):
    x = jnp.arange(32.0).reshape(16, 2)
    sh = batch_sharding(mesh)
    xs = jax.device_put(x, sh)
    assert len(xs.sharding.device_set) == 8
    r = jax.device_put(x, replicate(mesh))
    assert r.sharding.is_fully_replicated


def test_data_parallel_step_matches_single_device(mesh, key):
    """The same train step on sharded vs replicated data must agree — XLA's
    inserted psum is exact for this reduction."""
    prob = LinearForwardProblem()
    xs, ys = data.generate_dataset_linear(key, 2, prob.forward, 256)
    model = CDE(2, 2, (16, 16))
    loss_fn = model.make_loss_fn(
        LossConfig(name="PINNLoss", lam=0.1),
        initial_condition=prob.score_posterior,
    )
    opt = optax.adam(1e-3)
    step = train.make_train_step(loss_fn, opt)
    params = model.init(key)
    opt_state = opt.init(params)

    # single device
    p1, s1, loss1, _ = jax.jit(step)(params, opt_state, key, xs, ys)

    # sharded
    data_sh = batch_sharding(mesh)
    repl = replicate(mesh)
    jstep = jax.jit(
        step,
        in_shardings=(repl, repl, repl, data_sh, data_sh),
        out_shardings=(repl, repl, None, None),
    )
    p8, s8, loss8, _ = jstep(
        jax.device_put(params, repl), jax.device_put(opt_state, repl),
        jax.device_put(key, repl),
        jax.device_put(xs, data_sh), jax.device_put(ys, data_sh),
    )
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_sharded_sampling_over_conditions(mesh, key):
    from functools import partial

    from dmip_tpu.samplers import batched_sampler, euler_maruyama

    model = CDE(2, 2, (16, 16))
    params = model.init(key)
    drift = lambda z, c, s: model.apply_a(params, z, c, s)
    sampler = batched_sampler(
        partial(euler_maruyama, model.sde, drift,
                num_samples=32, xdim=2, num_steps=5)
    )
    data_sh = batch_sharding(mesh)
    n_y = 16
    keys = jax.device_put(jax.random.split(key, n_y), data_sh)
    ys = jax.device_put(jnp.ones((n_y, 2)), data_sh)
    out = jax.jit(sampler, in_shardings=(data_sh, data_sh))(keys, ys)
    assert out.shape == (n_y, 32, 2)
    assert len(out.sharding.device_set) == 8
    assert np.all(np.isfinite(np.asarray(out)))


def test_graft_entry_contract():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 2)
    g.dryrun_multichip(8)


def test_eval_many_linear_sharded(mesh, key):
    """Condition-sharded evaluation matches the per-y path."""
    from dmip_tpu.evaluate import make_eval_many_linear, make_eval_y_linear

    prob = LinearForwardProblem()
    model = CDE(2, 2, (16, 16))
    params = model.init(key)
    ys = prob.forward(jax.random.normal(key, (8, 2)))
    keys = jax.random.split(jax.random.fold_in(key, 1), 8)

    eval_many = make_eval_many_linear(
        model, prob, n_samples_x=512, n_repeats=2, num_steps=10,
        nbins=20, mesh=mesh,
    )
    data_sh = batch_sharding(mesh)
    repl = replicate(mesh)
    out = eval_many(
        jax.device_put(params, repl),
        jax.device_put(keys, data_sh),
        jax.device_put(ys, data_sh),
    )
    assert out["kl"].shape == (8,)
    assert np.all(np.isfinite(np.asarray(out["kl"])))

    eval_y = make_eval_y_linear(model, prob, 512, 2, 10, 20)
    single = eval_y(params, keys[3], ys[3])
    np.testing.assert_allclose(float(out["kl"][3]), float(single["kl"]),
                               rtol=1e-4)
    np.testing.assert_allclose(
        float(out["mse_score"][3]), float(single["mse_score"]), rtol=1e-4)


def test_dryrun_multichip_from_initialized_1device_parent():
    """Reproduce the DRIVER environment (round-1 MULTICHIP failure): a parent
    process whose JAX backend is already initialized with ONE device calls
    dryrun_multichip(8).  The entry must detect the shortfall and re-exec a
    fresh subprocess onto an 8-device virtual CPU platform (it cannot fix the
    parent: --xla_force_host_platform_device_count is read at backend init).

    The parent here deliberately does NOT get conftest's device-count flag,
    so jax.devices() is initialized at 1 before dryrun_multichip runs —
    exactly the driver's TPU-tunnel state.
    """
    import os
    import re
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", ""),
    ).strip()
    env.pop("_DMIP_MULTICHIP_CHILD", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = [repo] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    env["PYTHONPATH"] = os.pathsep.join(dict.fromkeys(pypath))
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "n = len(jax.devices())\n"  # initializes the backend at 1 device
            "assert n == 1, f'expected 1-device parent, got {n}'\n"
            "import __graft_entry__ as g\n"
            "g.dryrun_multichip(8)\n",
        ],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "dryrun_multichip(8) OK" in proc.stdout


def test_fit_data_parallel_matches_single_device(mesh, key):
    """The PRODUCT training path (make_epoch_fn + fit) with mesh= gives the
    same parameters as the single-device path — the VERDICT r2 ask: DP
    reachable from the drivers, not just from a hand-built step."""
    prob = LinearForwardProblem()
    xs, ys = data.generate_dataset_linear(key, 2, prob.forward, 512)
    model = CDE(2, 2, (16, 16))
    loss_fn = model.make_loss_fn(LossConfig(name="DSM"))
    opt = optax.adam(1e-3)
    params0 = model.init(key)

    def fit_with(mesh_arg):
        epoch_fn = train.make_epoch_fn(
            loss_fn, opt,
            lambda k: data.linear_epoch_batches(k, xs, ys, prob.noise_std, 64),
            epochs_per_call=3, donate=False, mesh=mesh_arg,
        )
        p, _, _ = train.fit(
            epoch_fn, params0, opt, key, num_epochs=7, epochs_per_call=3,
            log_every=0,
        )
        return p

    p_single = fit_with(None)
    p_dp = fit_with(mesh)
    for a, b in zip(jax.tree_util.tree_leaves(p_single),
                    jax.tree_util.tree_leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)
    assert len(jax.tree_util.tree_leaves(p_dp)[0].sharding.device_set) == 8


def test_resolve_mesh():
    assert train.resolve_mesh(None) is None
    m = get_mesh(8)
    assert train.resolve_mesh(m) is m
    assert train.resolve_mesh("auto") is not None  # 8 virtual devices
    assert train.resolve_mesh(get_mesh(1)) is None


def test_init_multihost_no_coordinator(monkeypatch):
    """Without a coordinator env, init_multihost is a safe single-host no-op."""
    from dmip_tpu.parallel import mesh as pmesh

    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    assert pmesh.init_multihost() is False
    assert called == []
    # allow_multihost on a single host degrades to the plain local mesh
    m = pmesh.get_mesh(8, allow_multihost=True)
    assert m.size == 8


def test_init_multihost_env_flag_path(monkeypatch):
    """With a coordinator configured, jax.distributed.initialize is invoked
    with the env-resolved process topology (flag-path test; no real DCN)."""
    from dmip_tpu.parallel import mesh as pmesh

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
    assert pmesh.init_multihost() is True
    assert called == [dict(coordinator_address="10.0.0.1:1234",
                           num_processes=4, process_id=2)]
    # explicit arguments win over env
    called.clear()
    assert pmesh.init_multihost("other:1", 2, 0) is True
    assert called[0]["coordinator_address"] == "other:1"
    assert called[0]["num_processes"] == 2


def test_init_multihost_idempotent(monkeypatch):
    """A second call after successful init must not re-initialize."""
    from dmip_tpu.parallel import mesh as pmesh

    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
    assert pmesh.init_multihost("x:1") is True
    assert called == []
