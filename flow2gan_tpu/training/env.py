"""Run provenance recorded into every checkpoint
(reference /root/reference/flow2gan/env.py:98-109)."""

from __future__ import annotations

import os
import socket
import subprocess
from typing import Dict


def _git(args, cwd=None) -> str:
    try:
        return (
            subprocess.check_output(
                ["git"] + args, cwd=cwd, stderr=subprocess.DEVNULL
            )
            .decode()
            .strip()
        )
    except Exception:
        return ""


def get_env_info() -> Dict[str, str]:
    import jax

    try:
        import flax

        flax_version = flax.__version__
    except Exception:
        flax_version = ""
    repo_dir = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    sha = _git(["rev-parse", "HEAD"], cwd=repo_dir)
    dirty = bool(_git(["status", "--porcelain"], cwd=repo_dir))
    return {
        "jax-version": jax.__version__,
        "flax-version": flax_version,
        "backend": jax.default_backend(),
        "num-devices": str(jax.device_count()),
        "git-sha1": sha + ("-dirty" if dirty else ""),
        "hostname": socket.gethostname(),
        "python-version": os.sys.version.split()[0],
    }
