"""Calibrate a GroupNorm-trained model into a frozen-affine inference tree.

Why: from-scratch training at depth 101 needs real activation
normalisation (``backbone.norm: group`` — see configs/synthetic_fullres.yml),
but GroupNorm at INFERENCE computes per-sample statistics that XLA cannot
fold away, costing ~12% end-to-end throughput vs the frozen-BN program
(measured round 4: 83.6 vs 94.8 pairs/s).  Batch-norm-style calibration
removes that cost: freeze each GroupNorm site's normalizer at the EXPECTED
statistics over a calibration set, turning the site into a per-channel
affine

    scale_c = gamma_c / sqrt(E[var_g(c)] + eps)
    bias_c  = beta_c - E[mu_g(c)] * scale_c

which restores into the default frozen-BN inference program (identical
parameter tree to ``backbone.norm: frozen``) and folds into the adjacent
convolutions at compile time.  This is the inference-side analogue of what
the reference gets for free from pretrained frozen BatchNorm constants
(upstream ``lib/model/utils/config.py`` freezes all BN; SURVEY.md §3.1) —
re-derived here for from-scratch GroupNorm checkpoints.

The approximation replaces per-sample normalizers with their expectation;
``tools/calibrate_norm.py`` validates it end-to-end by comparing detections
of the calibrated program against the exact GroupNorm program on held-out
scenes before anything consumes the export.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp

# flax.linen.GroupNorm default epsilon — GroupNorm32 leaves it unset.
_GN_EPS = 1e-6


def capture_norm_stats(model, variables, batches: List[Tuple[Any, Any]]):
    """Run the backbone over calibration batches, return averaged moments.

    ``batches``: list of (images_left, images_right) arrays.  Both stereo
    views share backbone weights, so both contribute calibration samples.
    Returns a ``norm_stats`` pytree {site_path: {"mu": [C], "var": [C]}}.
    """
    from stereo_rcnn_tpu.models.detector import StereoRCNN

    @jax.jit
    def one(images):
        _, stats = model.apply(variables, images,
                               method=StereoRCNN.backbone,
                               mutable=["norm_stats"])
        # sow wraps each value in a tuple (one apply => length 1).
        return jax.tree.map(lambda t: t[0], stats["norm_stats"],
                            is_leaf=lambda t: isinstance(t, tuple))

    acc = None
    n = 0
    for il, ir in batches:
        for im in (il, ir):
            s = one(jnp.asarray(im))
            acc = s if acc is None else jax.tree.map(jnp.add, acc, s)
            n += 1
    return jax.tree.map(lambda a: a / n, acc)


def fold_group_norms(group_params, norm_stats, affine_template):
    """Build a frozen-affine parameter tree from a GroupNorm tree + stats.

    ``group_params`` / ``affine_template``: the ``params`` collections of
    the same config built with ``norm: group`` and ``norm: frozen``.  The
    trees are identical except at norm sites, where the group tree has
    ``{"gn": {"scale", "bias"}}`` and the affine tree has
    ``{"scale", "bias"}``.  Non-norm leaves are copied verbatim.
    """

    def walk(gp: Dict, tmpl: Dict, stats: Dict | None):
        out = {}
        for k, tv in tmpl.items():
            gv = gp[k]
            if (isinstance(gv, dict) and "gn" in gv
                    and isinstance(tv, dict)
                    and set(tv) == {"scale", "bias"}):
                gamma = gv["gn"]["scale"]
                beta = gv["gn"]["bias"]
                site = stats[k] if stats and k in stats else None
                if site is None:
                    raise KeyError(f"no calibration stats for norm site {k}")
                inv = gamma / jnp.sqrt(site["var"] + _GN_EPS)
                out[k] = {"scale": inv.astype(tv["scale"].dtype),
                          "bias": (beta - site["mu"] * inv
                                   ).astype(tv["bias"].dtype)}
            elif isinstance(tv, dict):
                out[k] = walk(gv, tv, stats.get(k) if stats else None)
            else:
                if gv.shape != tv.shape:
                    raise ValueError(
                        f"shape mismatch at {k}: {gv.shape} vs {tv.shape}")
                out[k] = gv
        return out

    return walk(group_params, affine_template, norm_stats)


def calibrate(cfg, group_variables, batches: List[Tuple[Any, Any]],
              init_affine: Callable | None = None):
    """End-to-end: capture stats and return ``{"params": affine_tree}``
    for ``cfg`` with ``backbone.norm: "frozen"``."""
    import dataclasses

    from stereo_rcnn_tpu.models.detector import build_model, init_params

    model = build_model(cfg)
    stats = capture_norm_stats(model, group_variables, batches)
    cfg_aff = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, norm="frozen"))
    if init_affine is None:
        tmpl = init_params(cfg_aff, jax.random.PRNGKey(0))
    else:
        tmpl = init_affine(cfg_aff)
    affine = fold_group_norms(group_variables["params"], stats,
                              tmpl["params"])
    return cfg_aff, {"params": affine}
