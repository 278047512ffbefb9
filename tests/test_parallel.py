"""Mesh/sharding tests + the graft-entry dryrun contract on the virtual
8-device CPU platform."""

import importlib.util

import jax
import numpy as np
import pytest

from yolo_v1_tpu.parallel.mesh import (
    data_sharding, dp_size, image_sharding, make_mesh, mesh_from_spec,
    pad_to_multiple, replicated, shard_batch,
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


def test_mesh_from_spec_full_hybrid():
    mesh = mesh_from_spec("replica=2,data=2,space=2")
    assert mesh.axis_names == ("replica", "data", "space")
    assert mesh.devices.shape == (2, 2, 2)
    assert dp_size(mesh) == 4


def test_mesh_from_spec_wildcard_fills_devices():
    mesh = mesh_from_spec("data=-1")
    assert mesh.devices.shape == (len(jax.devices()),)
    mesh2 = mesh_from_spec("data=-1,space=2")
    assert mesh2.devices.shape == (len(jax.devices()) // 2, 2)
    assert dp_size(mesh2) == len(jax.devices()) // 2


def test_mesh_from_spec_rejects_bad_specs():
    with pytest.raises(ValueError, match="unknown"):
        mesh_from_spec("model=2,data=4")
    with pytest.raises(ValueError, match="order"):
        mesh_from_spec("data=4,replica=2")  # replica is DCN: must lead
    with pytest.raises(ValueError, match="'data'"):
        mesh_from_spec("replica=2,space=2")
    with pytest.raises(ValueError, match="devices"):
        mesh_from_spec("data=16")  # only 8 virtual devices
    with pytest.raises(ValueError, match="twice"):
        mesh_from_spec("data=2,data=2")
    with pytest.raises(ValueError, match="wildcard"):
        mesh_from_spec("replica=-1,data=-1")
    with pytest.raises(ValueError, match="name=size"):
        mesh_from_spec("data")


def test_image_sharding_adds_space_axis():
    from jax.sharding import PartitionSpec as P

    flat = mesh_from_spec("data=8")
    assert image_sharding(flat).spec == P("data")
    hybrid = mesh_from_spec("replica=2,data=2,space=2")
    assert image_sharding(hybrid).spec == P(("replica", "data"), "space")
    assert data_sharding(hybrid).spec == P(("replica", "data"))


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
