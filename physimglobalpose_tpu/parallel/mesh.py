"""Device mesh construction helpers.

The reference has no distributed computing at all (SURVEY.md section 2.7);
parallelism here is designed TPU-first: a 2D ("data", "model") mesh where
"data" shards scenes/objects and "model" shards the hypothesis batch (the
workload's analogue of tensor parallelism) and the FCN's 4096-wide
activations. Collectives ride ICI via XLA - no NCCL/MPI.
"""

from __future__ import annotations

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, data: int | None = None, model: int | None = None
) -> Mesh:
    """Build a ("data", "model") mesh over the first n_devices devices.

    Default split: model axis gets the largest power-of-two <= sqrt(n), data
    the rest - hypothesis sharding benefits first from more chips.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if data is None or model is None:
        model = 1
        while model * 2 <= int(np.sqrt(n)) and n % (model * 2) == 0:
            model *= 2
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devs).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_along(mesh: Mesh, axis_name: str, ndim: int, dim: int = 0) -> NamedSharding:
    """NamedSharding that splits array dimension `dim` along mesh axis."""
    spec = [None] * ndim
    spec[dim] = axis_name
    return NamedSharding(mesh, P(*spec))
