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


class Opaque:
    """Wrapper making a constructor argument opaque to Ray Data's
    schema-deduplication hashing: a bare dict in ``fn_constructor_args``
    lands in a `set()` inside ray.data's unify-schema path and spams
    'Failed to hash the schemas (for deduplication): unhashable type:
    dict' per actor. Wrapping in a (identity-hashed) object silences it;
    stages unwrap via ``.obj`` in __init__."""

    __slots__ = ("obj",)

    def __init__(self, obj):
        self.obj = obj


def read_parquet_clean(paths, columns=None, **kwargs):
    """ray.data.read_parquet with the pandas metadata STRIPPED from the
    schema. Pandas-written parquet carries b'pandas' schema metadata that
    makes pa.Schema unhashable (hash -> dict), so every multi-block batch
    concat in a worker logs 'Failed to hash the schemas (for
    deduplication)'. Passing an explicit metadata-free schema keeps block
    schemas clean (and hashable) end-to-end."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    full = pq.read_schema(first).remove_metadata()
    schema = pa.schema([full.field(c) for c in columns]) if columns else full
    return ray.data.read_parquet(paths, columns=columns, schema=schema, **kwargs)
