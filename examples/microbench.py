"""Isolated fwd+bwd timings of the DSGN attack step's stages at paper scale.

Times each stage of the headline program (bench.py) on its own, with the
same tunnel-safe methodology as bench.py (`_time`/`_sync`: chained
dispatches + a value fetch — `block_until_ready` returns at ENQUEUE on the
tunneled backend). Per-stage numbers identify which block to attack next;
they will not sum exactly to the end-to-end step (XLA fuses across stage
boundaries in the full program).

Stages (paper-scale shapes, bf16):
  feat        StereoFeatureNet on one 384x1248 view
  psv         build_psv warp (96 planes, stride-4 features)
  hourglass   Hourglass3D on the (1,96,96,312,64) PSV
              (--depthconv pallas for the fused depth-tap kernel)
  score_full  Score3D on the full-volume u0 scale
  score_half  Score3D on the half-volume d1 scale
  gv_resample psv_to_3dgv frustum->voxel einsum chain
  gv_convs    the three (2+1)D volume convs around the 3DGV
  bev_head    BEVHead on the (1,288,304,320) collapsed BEV

Usage:  python examples/microbench.py [--iters 20] [--stages a,b,...]
        [--depthconv transpose|pallas] [--cpu] [--tiny]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--stages", default=None,
                    help="comma list; default: all")
    ap.add_argument("--depthconv", default="transpose",
                    choices=("transpose", "pallas"))
    ap.add_argument("--cpu", action="store_true",
                    help="CPU backend (smoke only; forced via jax.config "
                         "because the image's sitecustomize overrides env)")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_eval_driving_safety"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from bench import _time
    from eval_driving_safety_tpu.config import DSGNConfig
    from eval_driving_safety_tpu.models.dsgn import (BEVHead, ConvBnRelu2p1D,
                                                     Hourglass3D, Score3D,
                                                     StereoFeatureNet)
    from eval_driving_safety_tpu.ops.cost_volume import (build_psv,
                                                         depth_planes,
                                                         psv_to_3dgv)

    cfg = DSGNConfig.tiny() if args.tiny else DSGNConfig.full()
    dtype = jnp.bfloat16
    h4, w4 = cfg.height // 4, cfg.width // 4          # stride-4 features
    d = cfg.num_depth_planes
    c = cfg.psv_channels
    k = jax.random.PRNGKey(0)

    def normal(key, shape):
        return jax.random.normal(jax.random.fold_in(k, key), shape, dtype)

    def timed_grad_step(module, x, extra_args=()):
        """jit'd fwd+bwd of `module` w.r.t. its input, state-chained the
        way bench._time expects (params as const args, x as state)."""
        params = jax.jit(module.init)(jax.random.PRNGKey(1), x, *extra_args)

        def loss_fn(p, xx):
            out = module.apply(p, xx, *extra_args)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(t.astype(jnp.float32)) for t in leaves)

        @jax.jit
        def step(p, xx):
            g = jax.grad(loss_fn, argnums=1)(p, xx)
            return (xx + 1e-9 * g.astype(xx.dtype),)

        return lambda: _time(step, args.iters, (params,), (x,))

    stages = {}

    # --- feature extractor (one view) ---------------------------------
    im = normal(1, (1, cfg.height, cfg.width, 3))
    stages["feat"] = lambda: timed_grad_step(
        StereoFeatureNet(cfg.feature_channels, dtype=dtype), im)()

    # --- PSV warp -------------------------------------------------------
    fl = normal(2, (1, h4, w4, c))
    fr = normal(3, (1, h4, w4, c))
    planes = depth_planes(cfg.min_depth, cfg.max_depth, d).astype(dtype)
    fu = jnp.full((1,), 720.0, dtype)
    bl = jnp.full((1,), 0.54, dtype)

    def bench_psv():
        @jax.jit
        def step(l, r):
            def loss(l_, r_):
                v = build_psv(l_, r_, fu, bl, planes, cfg.feature_stride)
                return jnp.sum(v.astype(jnp.float32))
            gl, gr = jax.grad(loss, argnums=(0, 1))(l, r)
            return (l + 1e-9 * gl.astype(l.dtype), r + 1e-9 * gr.astype(r.dtype))
        return _time(step, args.iters, (), (fl, fr))
    stages["psv"] = bench_psv

    # --- hourglass ------------------------------------------------------
    vol = normal(4, (1, d, h4, w4, 2 * c))
    stages["hourglass"] = lambda: timed_grad_step(
        Hourglass3D(c, dtype=dtype, depth_method=args.depthconv), vol)()

    # --- score heads ----------------------------------------------------
    u0 = normal(5, (1, d, h4, w4, c))
    d1 = normal(6, (1, d // 2, h4 // 2, w4 // 2, 2 * c))
    stages["score_full"] = lambda: timed_grad_step(Score3D(dtype=dtype), u0)()
    stages["score_half"] = lambda: timed_grad_step(Score3D(dtype=dtype), d1)()

    # --- 3DGV resample (einsum chain only) ------------------------------
    gv = normal(7, (1, d, h4, w4, cfg.gv_channels))
    cu = jnp.full((1,), cfg.width / 2.0)
    cv = jnp.full((1,), cfg.height / 2.0)
    planes32 = depth_planes(cfg.min_depth, cfg.max_depth, d)

    def bench_resample():
        @jax.jit
        def step(x):
            def loss(xx):
                v = psv_to_3dgv(xx, planes32, jnp.full((1,), 720.0), cu, cv,
                                cfg, cfg.feature_stride)
                return jnp.sum(v.astype(jnp.float32))
            g = jax.grad(loss)(x)
            return (x + 1e-9 * g.astype(x.dtype),)
        return _time(step, args.iters, (), (gv,))
    stages["gv_resample"] = bench_resample

    # --- the three (2+1)D volume convs around the 3DGV -------------------
    vox = normal(8, (1, cfg.num_voxels_z, cfg.num_voxels_y,
                     cfg.num_voxels_x, cfg.gv_channels))

    def bench_gv_convs():
        class GvConvs(__import__("flax").linen.Module):
            @__import__("flax").linen.compact
            def __call__(self, frustum, voxels):
                a = ConvBnRelu2p1D(cfg.gv_channels, dtype=dtype,
                                   depth_method=args.depthconv)(frustum)
                b = ConvBnRelu2p1D(cfg.gv_channels, dtype=dtype,
                                   depth_method=args.depthconv)(voxels)
                b = ConvBnRelu2p1D(cfg.gv_channels, dtype=dtype,
                                   depth_method=args.depthconv)(b)
                return (jnp.sum(a.astype(jnp.float32))
                        + jnp.sum(b.astype(jnp.float32)))

        mod = GvConvs()
        params = jax.jit(mod.init)(jax.random.PRNGKey(1), gv, vox)

        @jax.jit
        def step(p, f, v):
            gf, gvx = jax.grad(
                lambda ff, vv: mod.apply(p, ff, vv), argnums=(0, 1))(f, v)
            return (f + 1e-9 * gf.astype(f.dtype),
                    v + 1e-9 * gvx.astype(v.dtype))
        return _time(step, args.iters, (params,), (gv, vox))
    stages["gv_convs"] = bench_gv_convs

    # --- BEV head ---------------------------------------------------------
    bev = normal(9, (1, cfg.num_voxels_z, cfg.num_voxels_x,
                     cfg.num_voxels_y * cfg.gv_channels))
    stages["bev_head"] = lambda: timed_grad_step(
        BEVHead(cfg.num_classes, cfg.head_channels, dtype=dtype), bev)()

    wanted = (args.stages.split(",") if args.stages else list(stages))
    out = {}
    for name in wanted:
        rate = stages[name]()
        out[name] = {"iters_per_sec": round(rate, 3),
                     "ms_per_iter": round(1e3 / rate, 3)}
        print(f"{name:12s} {rate:9.3f} it/s   {1e3 / rate:8.3f} ms",
              flush=True)
    print(json.dumps({"depthconv": args.depthconv, "tiny": args.tiny,
                      "stages": out}))


if __name__ == "__main__":
    main()
