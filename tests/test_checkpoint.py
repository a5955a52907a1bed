"""Orbax checkpoint save/restore roundtrip + epoch-dir discovery."""
import jax.numpy as jnp
import numpy as np

from eval_driving_safety_tpu.utils.checkpoint import (
    latest_epoch_dir, restore_checkpoint, save_checkpoint)


def test_roundtrip(tmp_path):
    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "epoch": np.int32(7)}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, tree)
    back = restore_checkpoint(path, template=tree)
    np.testing.assert_allclose(np.asarray(back["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    assert int(back["epoch"]) == 7


def test_latest_epoch_dir(tmp_path):
    assert latest_epoch_dir(str(tmp_path / "missing")) is None
    for n in (0, 3, 12):
        (tmp_path / f"epoch{n}").mkdir()
    (tmp_path / "other").mkdir()
    assert latest_epoch_dir(str(tmp_path)).endswith("epoch12")
