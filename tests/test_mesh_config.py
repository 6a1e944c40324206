"""mesh_for_config: the config `parallel` block must never be silently
ignored or exceed the --ws device cap (review findings, round 4).

Runs on the conftest's 8-device virtual CPU mesh.
"""
from types import SimpleNamespace

import jax
import pytest

from rspnet_tpu.config import ConfigTree
from rspnet_tpu.parallel import mesh_for_config


def _args(ws=None):
    return SimpleNamespace(world_size=ws)


def _cfg(block):
    return ConfigTree({"parallel": block} if block is not None else {})


def test_no_block_is_1d_all_devices():
    mesh = mesh_for_config(_cfg(None), _args())
    assert mesh.axis_names == ("data",)
    assert mesh.size == jax.device_count()


def test_data_only_block_caps_width():
    # `parallel: {data: 2}` (model absent) must build a 2-device mesh,
    # not silently fall back to all 8 (which would 4x the global batch
    # and the scaled lr).
    mesh = mesh_for_config(_cfg({"data": 2}), _args())
    assert mesh.size == 2
    assert mesh.axis_names == ("data",)


def test_data_only_block_over_devices_raises():
    with pytest.raises(ValueError, match="exceeds"):
        mesh_for_config(_cfg({"data": 16}), _args())


def test_data_only_block_over_ws_raises():
    with pytest.raises(ValueError, match="exceeds"):
        mesh_for_config(_cfg({"data": 8}), _args(ws=4))


def test_2d_block_respects_ws_cap():
    # --ws 4 caps usable devices; an explicit 4x2 grid needs 8 > 4.
    with pytest.raises(ValueError, match="needs 8 devices"):
        mesh_for_config(_cfg({"data": 4, "model": 2}), _args(ws=4))


def test_2d_block_within_ws():
    mesh = mesh_for_config(_cfg({"data": 2, "model": 2}), _args(ws=4))
    assert mesh.shape == {"data": 2, "model": 2}


def test_2d_data_inferred_from_ws():
    # model given, data inferred from the CAPPED width (ws=4 -> data=2)
    mesh = mesh_for_config(_cfg({"model": 2}), _args(ws=4))
    assert mesh.shape == {"data": 2, "model": 2}
