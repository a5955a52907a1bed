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


def test_load_params_trainer_checkpoint_roundtrip(tmp_path):
    """cli.common.load_params accepts a trainer checkpoint
    ({params, uncert, opt_state, epoch}), grafts the bare params collection
    back under init's other collections, and surfaces uncert as aux."""
    import jax.numpy as jnp

    from eval_driving_safety_tpu.cli.common import load_params
    from eval_driving_safety_tpu.utils.checkpoint import save_checkpoint

    def init():
        return {"params": {"w": jnp.zeros((2,))},
                "constants": {"anchors": jnp.arange(3.0)}}

    trained = {"params": {"w": np.ones((2,), np.float32)},
               "uncert": np.full((6,), 0.5, np.float32),
               "opt_state": {"count": np.int32(3)},
               "epoch": np.int32(4)}
    p = str(tmp_path / "trainer_ck")
    save_checkpoint(p, trained)

    class Dummy:
        pass

    params, aux = load_params(Dummy(), init, p, return_aux=True)
    np.testing.assert_allclose(params["params"]["w"], 1.0)
    np.testing.assert_allclose(params["constants"]["anchors"],
                               np.arange(3.0))
    np.testing.assert_allclose(aux["uncert"], 0.5)
