"""GenMOP alignment math tests (triangulation + Umeyama transfer pose)."""
import numpy as np
import jax.numpy as jnp

from gen6d_tpu.cli.compute_align_poses import triangulate_pair
from gen6d_tpu.geometry.camera import project_points


def look_at(campos):
    campos = np.asarray(campos, np.float64)
    z = -campos / np.linalg.norm(campos)
    x = np.cross(z, [0, 1, 0])
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], 0)
    return np.concatenate([R, (-R @ campos)[:, None]], 1).astype(np.float64)


class TestTriangulation:
    def test_recovers_points(self, rng):
        K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
        pose0 = look_at([0.5, 0.2, -3])
        pose1 = look_at([-0.4, 0.3, -3])
        pts3d = (rng.rand(6, 3) - 0.5).astype(np.float64)
        kps0, _ = project_points(jnp.asarray(pts3d, jnp.float32),
                                 jnp.asarray(pose0, jnp.float32),
                                 jnp.asarray(K, jnp.float32))
        kps1, _ = project_points(jnp.asarray(pts3d, jnp.float32),
                                 jnp.asarray(pose1, jnp.float32),
                                 jnp.asarray(K, jnp.float32))
        rec = triangulate_pair(np.asarray(kps0, np.float64),
                               np.asarray(kps1, np.float64), pose0, pose1, K, K)
        np.testing.assert_allclose(rec, pts3d, atol=1e-3)
