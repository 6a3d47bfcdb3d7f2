"""Device mesh construction for distributed placement.

The reference has no distribution layer at all -- one process, OpenMP
shared-memory threads (reference: epik/src/epik/place.cpp:218-229;
SURVEY.md "Parallelism & communication inventory").  The TPU-native design
uses a 2D ``jax.sharding.Mesh``:

* axis ``"data"``  -- reads are data-parallel (the analog of the reference's
  read-level OpenMP parallel-for);
* axis ``"model"`` -- the phylo-k-mer database is hash-sharded when it does
  not fit (or is not wanted) replicated in HBM; per-branch partial score
  matrices merge with ``psum`` over this axis (BASELINE.json north star).

Multi-host: call :func:`init_distributed` first (jax.distributed), then build
the mesh over the global device list.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "init_distributed", "DATA_AXIS", "MODEL_AXIS"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    Defaults: all visible devices on the data axis, model unsharded
    (replicated DB -- the fast path whenever the DB fits in HBM).
    """
    devices = devices if devices is not None else jax.devices()
    n_dev = len(devices)
    if n_data is None:
        if n_dev % n_model:
            raise ValueError(f"{n_dev} devices not divisible by n_model={n_model}")
        n_data = n_dev // n_model
    if n_data * n_model > n_dev:
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, have {n_dev}"
        )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host initialization (green-field vs the reference; SURVEY.md
    section 5.8).  Safe to call with no args under TPU auto-detection."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
