"""Bounding-box utilities (port of reference utils/bbox_utils.py, jnp)."""
import jax.numpy as jnp
import numpy as np


def bboxes_area(bboxes):
    """ltrb (...,4) -> area (...)."""
    return (bboxes[..., 2] - bboxes[..., 0]) * (bboxes[..., 3] - bboxes[..., 1])


def bboxes_iou(bboxes0, bboxes1):
    """IoU of ltrb boxes (bbox_utils.py:19-39)."""
    x0 = jnp.maximum(bboxes0[..., 0], bboxes1[..., 0])
    y0 = jnp.maximum(bboxes0[..., 1], bboxes1[..., 1])
    x1 = jnp.minimum(bboxes0[..., 2], bboxes1[..., 2])
    y1 = jnp.minimum(bboxes0[..., 3], bboxes1[..., 3])
    inter = jnp.clip(x1 - x0, 0) * jnp.clip(y1 - y0, 0)
    union = bboxes_area(bboxes0) + bboxes_area(bboxes1) - inter
    return inter / union


def lthw_to_ltrb(bboxes):
    """(bbox_utils.py:41-45)."""
    return jnp.concatenate([bboxes[..., :2], bboxes[..., :2] + bboxes[..., 2:]],
                           -1)


def ltrb_to_lthw(bboxes):
    lt = bboxes[..., :2]
    return jnp.concatenate([lt, bboxes[..., 2:] - lt], -1)


def cl_to_ltrb(bboxes_cl):
    """center+length -> ltrb (bbox_utils.py:47-50)."""
    cen = bboxes_cl[..., :2]
    ln = bboxes_cl[..., 2:]
    return jnp.concatenate([cen - ln / 2, cen + ln / 2], -1)


def ltrb_to_cl(bboxes):
    cen = (bboxes[..., :2] + bboxes[..., 2:]) / 2
    ln = bboxes[..., 2:] - bboxes[..., :2]
    return jnp.concatenate([cen, ln], -1)


def bboxes_lthw_squared(bboxes):
    """Square boxes around the same centers (bbox_utils.py:4-14)."""
    ln = bboxes[..., 2:]
    cen = bboxes[..., :2] + ln / 2
    m = jnp.max(ln, -1, keepdims=True)
    ln_sq = jnp.repeat(m, 2, -1)
    return jnp.concatenate([cen - ln_sq / 2, ln_sq], -1)


def parse_bbox_from_scale_offset(que_select_id, scale_pr, select_offset,
                                 pool_ratio, ref_shape):
    """Decode a detection bbox [l,t,w,h] (bbox_utils.py:73-96). Host numpy."""
    hr, wr = ref_shape
    sx, sy = que_select_id
    scale = 2 ** scale_pr[sy, sx]
    ox, oy = select_offset[:, sy, sx] if select_offset.ndim == 3 else select_offset[sy, sx]
    cx = (sx + ox + 0.5) * pool_ratio - 0.5
    cy = (sy + oy + 0.5) * pool_ratio - 0.5
    w_pr, h_pr = wr * scale, hr * scale
    return np.asarray([cx - w_pr / 2, cy - h_pr / 2, w_pr, h_pr])
