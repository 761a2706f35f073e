import jax
import jax.numpy as jnp
import numpy as np

from stereo_rcnn_tpu.ops import nms_indices, nms_mask


def reference_nms(boxes, scores, thresh):
    """Plain O(N^2) numpy greedy NMS for cross-checking."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if scores[j] <= scores[i] and inter / (a + b - inter) > thresh:
                suppressed[j] = True
    return sorted(keep)


def test_nms_matches_reference(rng):
    n = 100
    centers = rng.uniform(50, 450, (n, 2)).astype(np.float32)
    wh = rng.uniform(20, 80, (n, 2)).astype(np.float32)
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1)
    scores = rng.uniform(0, 1, n).astype(np.float32)

    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    expected = reference_nms(boxes, scores, 0.5)
    assert sorted(np.nonzero(keep)[0].tolist()) == expected


def test_nms_indices_shapes_and_validity():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                      jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7])
    idx, valid = nms_indices(boxes, scores, 0.5, top_k=5)
    assert idx.shape == (5,) and valid.shape == (5,)
    assert valid.sum() == 2                       # box 1 suppressed by box 0
    assert set(np.asarray(idx[valid]).tolist()) == {0, 2}


def test_nms_respects_valid_mask():
    boxes = jnp.array([[0, 0, 10, 10], [100, 100, 110, 110]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    valid = jnp.array([False, True])
    keep = nms_mask(boxes, scores, 0.5, valid=valid)
    assert not bool(keep[0]) and bool(keep[1])


def test_nms_jit_compiles():
    fn = jax.jit(lambda b, s: nms_indices(b, s, 0.5, top_k=8))
    boxes = jnp.ones((32, 4)) * jnp.arange(32)[:, None]
    scores = jnp.linspace(1.0, 0.0, 32)
    idx, valid = fn(boxes, scores)
    assert idx.shape == (8,)
