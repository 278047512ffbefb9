"""Mesh/sharding tests + the graft-entry dryrun contract on the virtual
8-device CPU platform."""

import importlib.util

import jax
import numpy as np
import pytest

from yolo_v1_tpu.parallel.mesh import (
    data_sharding, make_mesh, pad_to_multiple, replicated, shard_batch,
)


def test_make_mesh_single_axis():
    mesh = make_mesh(8)
    assert mesh.axis_names == ("data",)
    assert mesh.devices.shape == (8,)


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(4)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    sx = shard_batch(mesh, x)
    assert sx.sharding.spec == data_sharding(mesh).spec
    np.testing.assert_array_equal(np.asarray(sx), x)


def test_pad_to_multiple():
    x = np.arange(10).reshape(5, 2)
    padded, n = pad_to_multiple(x, 4)
    assert padded.shape == (8, 2) and n == 5
    # wrap-around copies of REAL rows (never garbage/last-row repeats)
    np.testing.assert_array_equal(padded[5:], x[:3])
    same, n2 = pad_to_multiple(np.ones((8, 2)), 4)
    assert same.shape == (8, 2) and n2 == 8
    # device arrays stay on device (no numpy detour)
    import jax.numpy as jnp

    dx = jnp.asarray(x)
    dpadded, dn = pad_to_multiple(dx, 4)
    assert isinstance(dpadded, jax.Array) and dn == 5
    np.testing.assert_array_equal(np.asarray(dpadded), padded)


def test_replicated_spec():
    mesh = make_mesh(2)
    assert replicated(mesh).spec == jax.sharding.PartitionSpec()


def _load_graft():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_graft_entry_contract():
    mod = _load_graft()
    fn, args = mod.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (8, 7, 7, 30)


@pytest.mark.slow
def test_graft_dryrun_multichip():
    mod = _load_graft()
    mod.dryrun_multichip(8)  # asserts internally; conftest already forced cpu
