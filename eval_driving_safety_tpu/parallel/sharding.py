"""Device-mesh sharding for the attack/inference sweeps.

The reference's only parallelism is single-process `nn.DataParallel`
replication (/root/reference/attack/DSGN/pgd_attack.py:138; SURVEY.md §2.3).
TPU-native equivalent and extensions:

* **data axis (DP)** — stereo pairs are independent; the PGD sweep is
  batch-sharded over the mesh and scales linearly over ICI. The
  universal-patch gradient (summed over the batch by autodiff) becomes an
  XLA all-reduce over the data axis — the psum the reference approximates
  by *sequential* per-image accumulation.
* **model axis (volume parallelism)** — DSGN's D x H x W cost volumes are
  the memory-pressure axis (SURVEY.md §5). `constrain_psv` shards the
  depth-plane dimension over the `model` axis; XLA inserts halo exchanges
  for the 3D convolutions. This is this framework's analogue of tensor
  parallelism: the reference has no TP/PP/SP/EP to match (CNNs, no
  attention), so extra axes are headroom, not parity.

Everything uses `jax.sharding.NamedSharding` + jit's SPMD partitioner —
no hand-written collectives; XLA lowers them onto ICI.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """(data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data < 1 or len(devices) < n_data * n_model:
        need = max(n_data, 1) * n_model
        raise ValueError(
            f"make_mesh needs {max(n_data, 1)}x{n_model}={need} devices "
            f"but the {devices[0].platform} backend has {len(devices)}; "
            "start the process with XLA_FLAGS="
            f"--xla_force_host_platform_device_count={need} "
            "JAX_PLATFORMS=cpu for a virtual mesh")
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def dp_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Leading-axis batch sharding; everything else replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Device-put every array with its leading axis over `data`."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), dp_sharding(mesh, jnp.asarray(x).ndim)),
        tree)


def constrain_psv(psv, mesh: Optional[Mesh]):
    """Shard the plane-sweep volume (B, D, H, W, C): batch over `data`,
    depth planes over `model`."""
    if mesh is None:
        return psv
    return jax.lax.with_sharding_constraint(
        psv, NamedSharding(mesh, P("data", "model", None, None, None)))


def sharded_pgd_step(loss_fn: Callable, mesh: Mesh, *, alpha, eps,
                     clip_min, clip_max):
    """One batch-sharded PGD iteration, jitted over the mesh.

    Returns step(adv_l, adv_r, clean_l, clean_r) -> (adv_l, adv_r, loss).
    The per-pixel grads are local to each data shard; the scalar loss is the
    only cross-device reduction.
    """
    clip_min = jnp.asarray(clip_min)
    clip_max = jnp.asarray(clip_max)

    def step(adv_l, adv_r, clean_l, clean_r):
        loss, (gl, gr) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            adv_l, adv_r)
        adv_l = clean_l + jnp.clip(adv_l + alpha * jnp.sign(gl) - clean_l,
                                   -eps, eps)
        adv_r = clean_r + jnp.clip(adv_r + alpha * jnp.sign(gr) - clean_r,
                                   -eps, eps)
        return (jnp.clip(adv_l, clip_min, clip_max),
                jnp.clip(adv_r, clip_min, clip_max), loss)

    dp4 = dp_sharding(mesh, 4)
    return jax.jit(step, in_shardings=(dp4, dp4, dp4, dp4),
                   out_shardings=(dp4, dp4, replicated(mesh)))


def sharded_patch_step(loss_fn: Callable, mesh: Mesh, *, alpha: float,
                       eps: float):
    """One batch-sharded universal-patch descent step.

    The patch is replicated; its gradient (a sum over the sharded batch) is
    an XLA psum over `data` — the all-reduce of SURVEY.md §2.3.
    Returns step(patch, imgs_l, imgs_r, centers_l, centers_r) ->
    (patch, loss).
    """
    from eval_driving_safety_tpu.attack.patch import composite_patch_batch

    def step(patch, imgs_l, imgs_r, centers_l, centers_r):
        def f(p):
            il = composite_patch_batch(imgs_l, p, centers_l)
            ir = composite_patch_batch(imgs_r, p, centers_r)
            return loss_fn(il, ir)
        loss, g = jax.value_and_grad(f)(patch)
        return patch - jnp.clip(0.5 * alpha * g, -eps, eps), loss

    dp4 = dp_sharding(mesh, 4)
    dp2 = dp_sharding(mesh, 2)
    rep = replicated(mesh)
    return jax.jit(step,
                   in_shardings=(rep, dp4, dp4, dp2, dp2),
                   out_shardings=(rep, rep))
