"""Device mesh + sharding helpers — the framework's scaling layer.

The reference scales with single-process ``nn.DataParallel``
(`/root/reference/train.py:80`): scatter the batch, replicate weights,
gather outputs.  The TPU-native equivalent is a ``jax.sharding.Mesh`` with
named axes and sharding annotations on jit inputs/outputs; XLA inserts the
gradient all-reduce (over ICI) automatically.  Everything here works
identically on one chip, a v5e pod slice, or N virtual CPU devices
(``--xla_force_host_platform_device_count``), which is how multi-chip
behavior is tested without hardware (SURVEY.md §4).

Axes:
  * ``data``    — batch dimension (DP).  Always present.
  * ``replica`` — optional LEADING axis for multi-slice scale-out: slices
    talk over DCN, so only the (bandwidth-light, latency-tolerant)
    gradient all-reduce crosses it while everything else stays on ICI.
    The batch shards over ``('replica', 'data')`` jointly —
    ``data_sharding`` handles this transparently, so the trainer/eval
    paths are hybrid-mesh capable without changes.
  * ``space``   — optional trailing axis for spatial sharding of the conv
    activations (image height; XLA SPMD inserts the halo exchanges).
    Optional for parity — the 448px activations fit one chip comfortably
    (SURVEY.md §5); it exists for scale-out headroom.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    axis_names: tuple[str, ...] = ("data",),
    devices=None,
    shape: tuple[int, ...] | None = None,
) -> Mesh:
    """Create a mesh over the first ``n_devices`` devices.

    With the default single axis, all devices go to data parallelism.  For
    multi-axis meshes pass ``shape`` (one size per axis, e.g.
    ``axis_names=('replica', 'data'), shape=(2, 4)``); device order follows
    ``jax.devices()``, so the fastest-varying (trailing) axis lands on the
    most-local devices — put the DCN 'replica' axis first.
    """
    if devices is None:
        devices = jax.devices()
    if shape is not None:
        if len(shape) != len(axis_names):
            raise ValueError(f"shape {shape} vs axes {axis_names}")
        n_devices = int(np.prod(shape))
        return Mesh(
            np.asarray(devices[:n_devices]).reshape(shape), axis_names
        )
    if n_devices is None:
        n_devices = len(devices)
    devs = np.asarray(devices[:n_devices])
    if len(axis_names) == 1:
        return Mesh(devs, axis_names)
    # Put everything on the leading axis; trailing axes get size 1 unless the
    # caller passes ``shape``.
    return Mesh(
        devs.reshape((n_devices,) + (1,) * (len(axis_names) - 1)), axis_names
    )


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data-parallel axes —
    jointly over ('replica', 'data') on a multi-slice hybrid mesh, so every
    trainer/eval path scales across slices without changes."""
    if "replica" in mesh.axis_names:
        return NamedSharding(mesh, P(("replica", "data")))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put arrays with the batch dimension sharded over 'data'."""
    sh = data_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def largest_divisor_device_count(
    batch_size: int, n_devices: int | None = None
) -> int:
    """Largest device count <= n_devices that divides batch_size.

    Sharding a [B, ...] batch over a 'data' axis requires the axis size to
    divide B; callers pick the mesh size with this instead of crashing on
    e.g. batch 12 over 8 chips (-> 6 devices used, with a warning upstream).
    To satisfy several batch sizes at once, pass their gcd.
    """
    if n_devices is None:
        n_devices = len(jax.devices())
    for n in range(min(n_devices, batch_size), 0, -1):
        if batch_size % n == 0:
            return n
    return 1


def pad_to_multiple(batch, multiple: int) -> tuple:
    """Pad the batch dim up to a multiple with wrap-around copies of real
    rows (uneven batches must still shard evenly over the mesh; the trainer
    masks the copies out of the loss).  Device arrays are padded on device —
    no D2H round trip.  Returns (padded, n_real)."""
    n = batch.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    idx = np.arange(n + rem) % n
    if isinstance(batch, jax.Array):
        import jax.numpy as jnp

        return jnp.take(batch, jnp.asarray(idx), axis=0), n
    return np.take(batch, idx, axis=0), n
