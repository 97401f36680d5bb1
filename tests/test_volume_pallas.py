"""Volume-sampling kernel tests (interpret mode on CPU; the compiled kernel is
validated on TPU — see the bench/verify drives)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels + VJP checks

from gen6d_tpu.ops.volume_pallas import (volume_sample_meanstd,
                                         volume_sample_meanstd_xla,
                                         volume_sample_single)


def make_inputs(rng, rfn=4, h=16, w=16, f=32, pn=2048):
    feats = rng.rand(rfn, h, w, f).astype(np.float32)
    projs = np.tile(np.asarray([[20.0, 0, 8, 0], [0, 20, 8, 0], [0, 0, 1, 3]],
                               np.float32)[None], (rfn, 1, 1))
    projs += rng.rand(rfn, 3, 4).astype(np.float32) * 0.1
    verts = (rng.rand(pn, 3).astype(np.float32) - 0.5) * 2
    return jnp.asarray(feats), jnp.asarray(projs), jnp.asarray(verts)


class TestVolumeKernel:
    def test_interpret_matches_xla(self, rng):
        feats, projs, verts = make_inputs(rng)
        m1, s1 = volume_sample_meanstd(feats, projs, verts, tile=512,
                                       interpret=True)
        m2, s2 = volume_sample_meanstd_xla(feats, projs, verts)
        np.testing.assert_allclose(np.array(m1), np.array(m2), atol=1e-4)
        np.testing.assert_allclose(np.array(s1), np.array(s2), atol=1e-4)

    def test_single_view(self, rng):
        feats, projs, verts = make_inputs(rng, rfn=1)
        out = volume_sample_single(feats[0], projs[0], verts, tile=512,
                                   interpret=True)
        ref, _ = volume_sample_meanstd_xla(feats, projs, verts)
        np.testing.assert_allclose(np.array(out), np.array(ref), atol=1e-4)

    def test_out_of_bounds_points_are_zero(self, rng):
        feats, projs, verts = make_inputs(rng, rfn=1)
        far = verts + 100.0  # projects far outside the map
        out = volume_sample_single(feats[0], projs[0], far, tile=512,
                                   interpret=True)
        assert float(jnp.max(jnp.abs(out))) == 0.0


class TestVolumeKernelVJP:
    def test_meanstd_grad_matches_xla_autodiff(self, rng):
        import jax
        feats, projs, verts = make_inputs(rng)
        from gen6d_tpu.ops.volume_pallas import volume_sample_meanstd_grad

        def lp(F):
            m, s = volume_sample_meanstd_grad(F, projs, verts, 512, True)
            return jnp.sum(m * m) + jnp.sum(s)

        def lx(F):
            m, s = volume_sample_meanstd_xla(F, projs, verts)
            s = jnp.sqrt(s * s + 1e-12)
            return jnp.sum(m * m) + jnp.sum(s)

        g1 = jax.grad(lp)(feats)
        g2 = jax.grad(lx)(feats)
        np.testing.assert_allclose(np.array(g1), np.array(g2), atol=1e-4)

    def test_single_grad(self, rng):
        import jax
        from gen6d_tpu.ops.volume_pallas import volume_sample_single_grad
        feats, projs, verts = make_inputs(rng, rfn=1)

        def lp(F):
            return jnp.sum(volume_sample_single_grad(F, projs[0], verts, 512,
                                                     True) ** 2)

        def lx(F):
            m, _ = volume_sample_meanstd_xla(F[None], projs[:1], verts)
            return jnp.sum(m ** 2)

        g1 = jax.grad(lp)(feats[0])
        g2 = jax.grad(lx)(feats[0])
        np.testing.assert_allclose(np.array(g1), np.array(g2), atol=1e-4)
