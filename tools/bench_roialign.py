#!/usr/bin/env python
"""Microbenchmark of the fused stereo RoIAlign kernels on the real TPU.

Times the per-level-branch kernel, the branchless atlas kernel, and the
XLA atlas fallback at production shapes (batch x 300 rois, 4-level
bf16 pyramid of a 384x1280 image, C=256), printing us/roi so kernel
changes can be judged in isolation from the rest of the pipeline.

Usage: python tools/bench_roialign.py [--batch 16] [--rois 300]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def realistic_rois(rng, n, im_h, im_w):
    """Car-like boxes across the level-assignment range."""
    out = []
    for _ in range(n):
        size = float(np.exp(rng.uniform(np.log(24), np.log(500))))
        ar = rng.uniform(0.8, 3.0)                    # w/h, car-like
        w = size * np.sqrt(ar)
        h = size / np.sqrt(ar)
        x1 = rng.uniform(0, max(im_w - w, 1))
        y1 = rng.uniform(0, max(im_h - h, 1))
        out.append([x1, y1, min(x1 + w, im_w - 1), min(y1 + h, im_h - 1)])
    return np.asarray(out, np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--rois", type=int, default=300)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from stereo_rcnn_tpu.utils.cache import enable_compile_cache
    enable_compile_cache("perf")
    from stereo_rcnn_tpu.ops.roi_align import multilevel_roi_align
    from stereo_rcnn_tpu.ops.roi_align_pallas import (
        stereo_roi_align_pallas, stereo_roi_align_pallas_atlas)

    im_h, im_w, c = 384, 1280, 256
    strides = (4, 8, 16, 32)
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.rand(args.batch, im_h // s, im_w // s, c),
                         jnp.bfloat16) for s in strides]
    rois = jnp.asarray(np.stack([
        realistic_rois(rng, args.rois, im_h, im_w)
        for _ in range(args.batch)]))
    rois_r = rois - jnp.array([30.0, 0.0, 30.0, 0.0])

    n_total = args.batch * args.rois

    def timeit(name, fn):
        f = jax.jit(fn)
        out = f(feats, rois, rois_r)
        float(jnp.asarray(jax.tree.leaves(out)[0]).sum())      # warm-up
        t0 = time.time()
        for _ in range(args.iters - 1):
            out = f(feats, rois, rois_r)
        float(jnp.asarray(jax.tree.leaves(out)[0]).sum())
        dt = (time.time() - t0) / args.iters
        print(f"{name:28s} {dt * 1000:8.2f} ms/batch   "
              f"{dt / n_total * 1e6:6.2f} us/roi")
        return dt

    def run_kernel(kfn):
        def f(fl, rl, rr):
            return jax.vmap(lambda f_, a, b: kfn(
                list(f_), list(f_), a, b, strides, 7, 14,
                interpret=False))(tuple(fl), rl, rr)
        return f

    def run_xla(fl, rl, rr):
        def one(f_, a, b):
            p7l = multilevel_roi_align(list(f_), a, strides, 7, 2)
            p7r = multilevel_roi_align(list(f_), b, strides, 7, 2)
            p14 = multilevel_roi_align(list(f_), a, strides, 14, 1)
            return p7l, p7r, p14
        return jax.vmap(one)(tuple(fl), rl, rr)

    def run_hat(hat_dtype):
        def f(fl, rl, rr):
            return jax.vmap(lambda f_, a, b: stereo_roi_align_pallas(
                list(f_), list(f_), a, b, strides, 7, 14,
                interpret=False, hat_dtype=hat_dtype))(tuple(fl), rl, rr)
        return f

    print(f"batch={args.batch} rois={args.rois} "
          f"({n_total} windows/step), C={c}, bf16 pyramid of {im_h}x{im_w}")
    timeit("pallas per-level branches", run_kernel(stereo_roi_align_pallas))
    timeit("pallas atlas branchless",
           run_kernel(stereo_roi_align_pallas_atlas))
    timeit("xla atlas gather", run_xla)
    # Hat-weight MXU precision sweep (see _sample_grid docstring).
    # MEASURED (v5e): f32 18.7 / bf16 20.3 / hilo 41.3 us/roi — matmul
    # rate is NOT the per-step cost; f32 stays the production default.
    timeit("pallas hat=bf16", run_hat(jnp.bfloat16))
    timeit("pallas hat=hilo", run_hat("hilo"))

    # Cost attribution: ablate one half of the double-buffered step
    # (bench_skip is bench-only, see _stereo_kernel docstring).  With
    # perfect overlap the full step should be ~max(dma, compute) + eps.
    def run_skip(skip):
        def f(fl, rl, rr):
            return jax.vmap(lambda f_, a, b: stereo_roi_align_pallas(
                list(f_), list(f_), a, b, strides, 7, 14,
                interpret=False, bench_skip=skip))(tuple(fl), rl, rr)
        return f
    timeit("pallas dma-only", run_skip("compute"))
    timeit("pallas compute-only", run_skip("dma"))
    timeit("pallas step-floor", run_skip("all"))

    # Packed single-output-block variants: the step floor above is all
    # output-copy machinery (3 blocks/step), so merge them into one.
    def run_packed(hat_dtype=jnp.float32, skip=None):
        def f(fl, rl, rr):
            return jax.vmap(lambda f_, a, b: stereo_roi_align_pallas(
                list(f_), list(f_), a, b, strides, 7, 14,
                interpret=False, hat_dtype=hat_dtype, bench_skip=skip,
                packed_out=True))(tuple(fl), rl, rr)
        return f
    timeit("pallas packed f32", run_packed())
    timeit("pallas packed step-floor", run_packed(skip="all"))
    timeit("pallas packed kron_bf16", run_packed("kron_bf16"))
    timeit("pallas packed kron_hilo", run_packed("kron_hilo"))

    # group = rois per grid step: amortizes step machinery, overlaps
    # 2*group window DMAs per side.  VMEM-bound: scratch is
    # 2 slots x group x (48,64,C) per side.
    def run_group(g, hat_dtype=jnp.float32, skip=None):
        def f(fl, rl, rr):
            return jax.vmap(lambda f_, a, b: stereo_roi_align_pallas(
                list(f_), list(f_), a, b, strides, 7, 14,
                interpret=False, hat_dtype=hat_dtype, bench_skip=skip,
                packed_out=True, group=g))(tuple(fl), rl, rr)
        return f
    for g in (2, 4):
        try:
            timeit(f"pallas packed group{g}", run_group(g))
            timeit(f"pallas packed group{g} floor", run_group(g, skip="all"))
        except Exception as e:  # noqa: BLE001 — VMEM limits are data
            print(f"pallas packed group{g}: FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})")
    # Relayout-free single-matmul sampling (see _sample_grid 'Why kron').
    timeit("pallas hat=kron_bf16", run_hat("kron_bf16"))
    timeit("pallas hat=kron_hilo", run_hat("kron_hilo"))


if __name__ == "__main__":
    main()
