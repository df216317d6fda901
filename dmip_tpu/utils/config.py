"""Config loading + experiment-directory management.

Reference parity: flat YAML per experiment loaded with yaml.safe_load
(main_diffusion_linear.py:142-143), ``product_dict`` Cartesian expansion for
grid search (utils.py:15-19), and ``set_directories`` (utils.py:50-65).
Key names match the reference's configs (config/*.yml) so existing configs
port over unchanged.
"""

from __future__ import annotations

import itertools
import os
import shutil
from typing import Any, Dict, Iterator

import yaml


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def product_dict(**kwargs) -> Iterator[Dict[str, Any]]:
    """Cartesian product of a dict of lists (reference utils.py:15-19)."""
    keys = kwargs.keys()
    for instance in itertools.product(*kwargs.values()):
        yield dict(zip(keys, instance))


def set_directories(train_dir: str, out_dir: str, resume_training: bool = False) -> str:
    """Wipe+recreate out/log dirs unless resuming (reference utils.py:50-65)."""
    if os.path.exists(out_dir) and not resume_training:
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    log_dir = os.path.join(train_dir, "logs")
    if os.path.exists(log_dir) and not resume_training:
        shutil.rmtree(log_dir)
    os.makedirs(log_dir, exist_ok=True)
    return log_dir


def check_wd(required_dir_name: str) -> None:
    """Working-directory guard (reference utils.py:67-75)."""
    current_path = os.getcwd()
    if not current_path.endswith(required_dir_name):
        raise ValueError(
            f"The script must be executed from the '{required_dir_name}' directory "
            f"of the project, current path is '{current_path}'."
        )
