"""Mesh sharding: DP PGD step and psum'd patch gradient on 8 CPU devices."""
import jax
import jax.numpy as jnp
import numpy as np

from eval_driving_safety_tpu.parallel.sharding import (
    dp_sharding, make_mesh, replicated, shard_batch, sharded_patch_step,
    sharded_pgd_step)


def test_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh1 = make_mesh()
    assert mesh1.shape["data"] == 8


def test_make_mesh_insufficient_devices_message():
    import pytest
    with pytest.raises(ValueError, match="xla_force_host_platform"):
        make_mesh(16, 2)


def test_dryrun_multichip_reexecs_when_too_few_devices(monkeypatch):
    """The driver calls dryrun_multichip on a 1-chip platform; the function
    must re-exec itself in a virtual-CPU subprocess rather than crash
    (VERDICT.md missing #1)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    calls = {}

    def fake_run(cmd, env=None, cwd=None):
        calls["env"] = env
        calls["cmd"] = cmd

        class R:
            returncode = 0
        return R()

    monkeypatch.setattr(g.subprocess, "run", fake_run)
    monkeypatch.setattr(g.jax, "devices", lambda: [object()])
    g.dryrun_multichip(8)
    assert "--xla_force_host_platform_device_count=8" in calls["env"]["XLA_FLAGS"]
    assert calls["env"]["JAX_PLATFORMS"] == "cpu"
    assert "_dryrun_multichip_impl(8)" in calls["cmd"][-1]


def test_sharded_pgd_matches_single_device():
    mesh = make_mesh(8, 1)

    def loss(l, r):
        return (l ** 2).sum() + (r ** 2).sum()

    clean = jnp.ones((8, 4, 4, 3))
    step = sharded_pgd_step(loss, mesh, alpha=0.1, eps=0.25,
                            clip_min=0.0, clip_max=2.0)
    with mesh:
        b = shard_batch({"x": clean}, mesh)["x"]
        al, ar, l0 = step(b, b, b, b)
    # grad of sum(x^2) at 1 is positive -> ascend by alpha
    np.testing.assert_allclose(np.asarray(al), 1.1, atol=1e-6)
    assert float(l0) == 8 * 4 * 4 * 3 * 2


def test_sharded_patch_grad_is_batch_sum():
    mesh = make_mesh(8, 1)
    imgs = jnp.zeros((8, 16, 16, 3))
    patch = jnp.full((5, 5, 3), 0.2)
    centers = jnp.full((8, 2), 8, jnp.int32)

    def loss(l, r):
        return (l ** 2).sum() + (r ** 2).sum()

    step = sharded_patch_step(loss, mesh, alpha=1.0, eps=10.0)
    with mesh:
        sb = shard_batch({"i": imgs, "c": centers}, mesh)
        p = jax.device_put(patch, replicated(mesh))
        new_patch, l0 = step(p, sb["i"], sb["i"], sb["c"], sb["c"])
    # d/dp of sum over batch of (mask*p)^2 (both views) = 2*2*B*p at masked px
    g_center = 2.0 * 2.0 * 8 * 0.2
    expected = 0.2 - 0.5 * 1.0 * g_center
    np.testing.assert_allclose(float(new_patch[2, 2, 0]), expected, atol=1e-5)
    # corners are outside the circular mask -> no gradient
    np.testing.assert_allclose(float(new_patch[0, 0, 0]), 0.2, atol=1e-7)


def test_dryrun_multichip_falls_back_when_backend_unavailable(monkeypatch):
    """A busy/unreachable tunneled accelerator must not stall the dryrun:
    backend-init RuntimeError routes to the virtual-CPU subprocess."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    calls = {}

    def fake_run(cmd, env=None, cwd=None):
        calls["env"] = env

        class R:
            returncode = 0
        return R()

    def raise_unavailable():
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")

    monkeypatch.setattr(g.subprocess, "run", fake_run)
    monkeypatch.setattr(g.jax, "devices", raise_unavailable)
    g.dryrun_multichip(8)
    assert calls["env"]["JAX_PLATFORMS"] == "cpu"
