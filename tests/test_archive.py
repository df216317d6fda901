"""tools/archive_checkpoint.py: params-only archive round-trips exactly."""

import json
import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dmip_tpu import checkpoints
from tools import archive_checkpoint


def test_archive_restore_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(archive_checkpoint, "ARCHIVE", str(tmp_path / "arch"))
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    src = tmp_path / "ckpt"
    checkpoints.save_checkpoint(
        str(src), params, opt_state={"m": jnp.zeros((3,))}, step=42,
        extra={"trial": "demo"},
    )
    out = archive_checkpoint.archive(str(src), "demo", note="unit test")
    # opt state must NOT be archived; provenance must be recorded.
    assert not os.path.exists(os.path.join(out, "opt_state.npz"))
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["step"] == 42
    assert manifest["note"] == "unit test"
    assert "has_opt_state" not in manifest

    dest = tmp_path / "restored"
    archive_checkpoint.restore("demo", str(dest))
    loaded = checkpoints.load_checkpoint(str(dest), params_like=params)
    np.testing.assert_array_equal(loaded["params"]["w"], params["w"])
    np.testing.assert_array_equal(loaded["params"]["b"], params["b"])
    assert loaded["step"] == 42
