"""Worker-environment plumbing.

Ray workers inherit only the driver's CWD on sys.path, so UDFs that
reference ``engine`` fail to unpickle when the driver was started outside
the repo. Every engine stage therefore passes ``**remote_args()`` to
map_batches / map_groups / @ray.remote: a PYTHONPATH runtime_env that makes
the package importable in every worker regardless of driver CWD.
"""

from __future__ import annotations

import os

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def remote_args() -> dict:
    return {"runtime_env": {"env_vars": {"PYTHONPATH": REPO_DIR}}}
