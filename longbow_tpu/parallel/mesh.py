"""Mesh construction helpers."""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

SHARD_AXIS = "shards"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the first n devices (default: all).

    Vector search shards along one axis — the corpus row dimension —
    so a 1-D mesh suffices; multi-host slices present their devices
    through the same interface (jax.distributed multi-controller).
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"asked for {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(devices, (SHARD_AXIS,))
