"""Device mesh construction.

New capability vs the reference (which is strictly one process / one GPU /
one stream — SURVEY.md §2.9): a 2-D ("data", "model") mesh where the model
axis carries Megatron-style tensor parallelism over ICI and the data axis
carries request-level scale-out (across hosts / DCN on a pod slice).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: int = 1, tp: Optional[int] = None, devices=None) -> Mesh:
    """Build a (data=dp, model=tp) mesh. tp defaults to n_devices // dp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        assert n % dp == 0, (n, dp)
        tp = n // dp
    assert dp * tp <= n, (dp, tp, n)
    grid = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(dp=1, tp=1)


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bring-up (jax.distributed). On TPU pods the arguments are
    auto-detected from the runtime environment; pass them explicitly for
    manual launches. The reference has no analogue (single process)."""
    kw = {}
    if coordinator is not None:
        kw = dict(coordinator_address=coordinator,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)
