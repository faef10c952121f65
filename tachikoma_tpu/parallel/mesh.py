"""Device mesh / topology descriptor.

The TPU-native replacement for the reference's Target descriptor + RPC device
pool (SURVEY.md §2.5, §5.6): a topology is a `jax.sharding.Mesh` with named
axes, and 'targets' are mesh shapes, not compiler backends.

Axis conventions used across the framework:
  dp — data parallel (batch)
  tp — tensor parallel (channels / model dims; int32 partial sums ride psum)
  pp — pipeline stages
  sp — sequence parallel (attention ring)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Topology:
    """Declarative mesh spec; realize with .make_mesh()."""

    dp: int = 1
    tp: int = 1
    pp: int = 1
    sp: int = 1

    @property
    def num_devices(self) -> int:
        return self.dp * self.tp * self.pp * self.sp

    def make_mesh(self, devices=None):
        import jax
        from jax.sharding import Mesh

        if devices is None:
            devices = jax.devices()
        n = self.num_devices
        if len(devices) < n:
            raise ValueError(f"topology needs {n} devices, have {len(devices)}")
        arr = np.array(devices[:n]).reshape(self.dp, self.tp, self.pp, self.sp)
        return Mesh(arr, ("dp", "tp", "pp", "sp"))


def simple_mesh(axes: dict[str, int] | None = None, devices=None):
    """Build a mesh with exactly the named axes, e.g. {'dp': 2, 'tp': 4}."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    axes = dict(axes or {"dp": len(devices)})
    n = int(np.prod(list(axes.values())))
    if len(devices) < n:
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(tuple(axes.values()))
    return Mesh(arr, tuple(axes.keys()))
