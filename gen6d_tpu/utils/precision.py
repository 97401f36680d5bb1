"""Precision control for geometry math.

On TPU, jax's default matmul precision is bfloat16; that is fine for the big
backbone convolutions but loses ~degrees of accuracy in the tiny 3x3 rotation /
pose algebra (observed: 3.9 deg rotation error in the pose-init solver under the
default precision vs 0.1 deg at float32). All geometry entry points are wrapped
with @f32 so their matmuls run at full float32 on every backend; the cost is
negligible (matrices are 3x3).
"""
import functools

import jax


def f32(fn):
    """Run ``fn`` with float32 matmul precision (TPU: full-precision MXU passes)."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    return wrapped
