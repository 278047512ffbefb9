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


#: Canonical axis order.  'replica' (DCN, between slices) must be leading
#: so it lands on the least-local devices; 'space' trails for the same
#: reason in reverse (halo exchanges want maximum ICI locality).
MESH_AXES = ("replica", "data", "space")


def mesh_from_spec(spec: str, devices=None) -> Mesh:
    """Build a mesh from a user-facing CLI spec like
    ``replica=2,data=2,space=2`` (the ``--mesh`` flag).

    Rules:
      * axis names are from MESH_AXES and must appear in canonical order
        (replica before data before space) — the order IS the device
        layout, and a trailing 'replica' would put DCN traffic on the
        fastest-varying (most ICI-local) dimension;
      * 'data' is required (it is what the batch shards over);
      * one axis may be sized ``-1`` to absorb the remaining devices;
      * the product must not exceed the available device count.  A
        product that does not DIVIDE the device count is allowed but
        leaves the remainder idle — a warning is emitted (use ``-1`` to
        absorb every device).
    """
    if devices is None:
        devices = jax.devices()
    axes: list[str] = []
    sizes: list[int] = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(
                f"--mesh spec {spec!r}: expected name=size, got {part!r}"
            )
        name, size = part.split("=", 1)
        name = name.strip()
        if name not in MESH_AXES:
            raise ValueError(
                f"--mesh axis {name!r} unknown (choose from {MESH_AXES})"
            )
        if name in axes:
            raise ValueError(f"--mesh axis {name!r} given twice in {spec!r}")
        axes.append(name)
        sizes.append(int(size))
    if not axes:
        raise ValueError(f"--mesh spec {spec!r} is empty")
    if "data" not in axes:
        raise ValueError(f"--mesh spec {spec!r} must include the 'data' axis")
    order = [MESH_AXES.index(a) for a in axes]
    if order != sorted(order):
        raise ValueError(
            f"--mesh axes must follow the order {MESH_AXES} "
            f"(replica is the DCN axis and must lead); got {tuple(axes)}"
        )
    if sizes.count(-1) > 1:
        raise ValueError(f"--mesh spec {spec!r}: at most one -1 wildcard")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        if known <= 0 or len(devices) % known != 0:
            raise ValueError(
                f"--mesh spec {spec!r}: cannot fill -1 from {len(devices)} "
                f"devices with the other axes at {known}"
            )
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(
            f"--mesh spec {spec!r} needs {total} devices, "
            f"have {len(devices)}"
        )
    if len(devices) % total != 0:
        import warnings

        warnings.warn(
            f"--mesh spec {spec!r} uses {total} of {len(devices)} devices; "
            f"{len(devices) - total} stay idle (use a -1 axis to absorb "
            f"them)",
            stacklevel=2,
        )
    return Mesh(
        np.asarray(devices[:total]).reshape(tuple(sizes)), tuple(axes)
    )


def dp_size(mesh: Mesh) -> int:
    """Number of ways the batch dimension is split (replica x data)."""
    return int(
        np.prod([mesh.shape[a] for a in ("replica", "data")
                 if a in mesh.axis_names])
    )


_DIST_INITIALIZED = False


def maybe_distributed_init(logger=None) -> bool:
    """Multi-process (multi-host) bootstrap: call
    ``jax.distributed.initialize`` exactly once when the standard
    coordinator env vars are present, else no-op.

    Recognized env (JAX's own convention, with bare fallbacks):
      JAX_COORDINATOR_ADDRESS | COORDINATOR_ADDRESS   host:port of process 0
      JAX_NUM_PROCESSES       | NUM_PROCESSES
      JAX_PROCESS_ID          | PROCESS_ID

    On Cloud TPU pods ``initialize()`` auto-detects everything, so setting
    just JAX_COORDINATOR_ADDRESS= (empty ok? no — any of the three) is not
    needed; we also honor JAX_AUTO_DISTRIBUTED=1 to force the autodetect
    path.  After this, ``jax.devices()`` is the GLOBAL device list and the
    meshes built here span hosts; each process feeds identical global
    batches and ``jax.device_put`` uploads only its addressable shards.
    """
    global _DIST_INITIALIZED
    import os

    if _DIST_INITIALIZED:
        return True
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    auto = os.environ.get("JAX_AUTO_DISTRIBUTED", "") in ("1", "true")
    if not addr and not auto:
        return False
    kwargs = {}
    if addr:
        kwargs["coordinator_address"] = addr
        nproc = os.environ.get("JAX_NUM_PROCESSES") or os.environ.get(
            "NUM_PROCESSES"
        )
        pid = os.environ.get("JAX_PROCESS_ID") or os.environ.get("PROCESS_ID")
        if nproc is not None:
            kwargs["num_processes"] = int(nproc)
        if pid is not None:
            kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    _DIST_INITIALIZED = True
    if logger:
        logger.info(
            "jax.distributed initialized: process %d/%d, %d global devices",
            jax.process_index(), jax.process_count(), len(jax.devices()),
        )
    return True


def is_coordinator() -> bool:
    """True on the process that owns host-side run-directory writes
    (checkpoint tree bookkeeping, metrics.csv, dashboard, log files).
    Process 0 by JAX convention; trivially True single-process."""
    return jax.process_index() == 0


_BARRIER_COUNT = 0


def barrier(tag: str) -> None:
    """Cross-process sync point (no-op single-process).  Used to order
    host-side filesystem operations against collective ops — e.g. the
    checkpoint manager's rename-aside must complete on process 0 before
    any process enters the collective Orbax write."""
    if jax.process_count() == 1:
        return
    global _BARRIER_COUNT
    _BARRIER_COUNT += 1
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(f"{tag}_{_BARRIER_COUNT}")


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data-parallel axes —
    jointly over ('replica', 'data') on a multi-slice hybrid mesh, so every
    trainer/eval path scales across slices without changes."""
    if "replica" in mesh.axis_names:
        return NamedSharding(mesh, P(("replica", "data")))
    return NamedSharding(mesh, P("data"))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [N, H, W, C] image batches: batch over the DP axes
    plus image HEIGHT over 'space' when the mesh has that axis (XLA SPMD
    then inserts the conv halo exchanges).  Equals data_sharding on
    meshes without 'space'."""
    dp = (
        ("replica", "data") if "replica" in mesh.axis_names else "data"
    )
    if "space" in mesh.axis_names and mesh.shape["space"] > 1:
        return NamedSharding(mesh, P(dp, "space"))
    return NamedSharding(mesh, P(dp))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(arr, sharding: NamedSharding):
    """Place a host batch under ``sharding``, multi-process safe.

    Single process: plain ``device_put``.  Multi-process (after
    ``maybe_distributed_init``): every process holds the SAME global numpy
    batch (loaders are seeded identically), and each uploads only the
    shards its local devices own — the per-host data feeding step of a
    multi-host run (``device_put`` of a global array onto a sharding that
    spans non-addressable devices is not portable)."""
    if isinstance(arr, jax.Array) and arr.sharding == sharding:
        return arr  # already placed (e.g. device-resident loader output)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    if isinstance(arr, jax.Array):
        # A device array under a DIFFERENT sharding (e.g. a resident-loader
        # batch fed through an image_sharding put on a 'space' mesh):
        # indexing per-shard below would touch non-addressable shards.
        # Reshard through a compiled identity instead — SPMD-safe, XLA
        # inserts the collectives.
        return jax.jit(lambda x: x, out_shardings=sharding)(arr)
    global_shape = arr.shape
    index_map = sharding.addressable_devices_indices_map(global_shape)
    arrays = [jax.device_put(arr[idx], d) for d, idx in index_map.items()]
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, arrays
    )


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
