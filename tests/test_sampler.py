"""Sampler tests: scan-based reverse chain, guidance, thresholding
(reference models/molopt_score_model.py:533-775)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapemol_tpu.models.denoiser import DenoiserConfig
from shapemol_tpu.models.score_model import ScoreModelConfig, ShapeDiffusionNet
from shapemol_tpu.sample import sampler as smp

CFG = ScoreModelConfig(
    num_diffusion_timesteps=20,
    num_classes=15,
    hidden_dim=32,
    denoiser=DenoiserConfig(num_blocks=1, num_layers=1, hidden_dim=32,
                            n_heads=4, knn=4, shape_dim=8,
                            shape_latent_dim=8),
)


@pytest.fixture(scope="module")
def setup():
    net = ShapeDiffusionNet(CFG)
    sched = CFG.make_schedule()
    B, N, S = 2, 10, 8
    rng = np.random.default_rng(0)
    shape = jnp.asarray(rng.standard_normal((B, S, 3)), jnp.float32)
    num_atoms = jnp.array([7, 10])
    pos, v, mask = smp.make_init_state(jax.random.PRNGKey(1), B, N,
                                       num_atoms, CFG.num_net_classes)
    variables = net.init(jax.random.PRNGKey(0), pos, v, mask, shape,
                         jnp.zeros((B,), jnp.int32))
    return net, sched, variables, pos, v, mask, shape


def test_make_init_state():
    pos, v, mask = smp.make_init_state(jax.random.PRNGKey(0), 3, 8,
                                       jnp.array([2, 8, 5]), 15)
    assert pos.shape == (3, 8, 3) and v.shape == (3, 8)
    m = np.asarray(mask)
    assert m.sum() == 15
    assert m[0, :2].all() and not m[0, 2:].any()
    assert np.asarray(v).min() >= 0 and np.asarray(v).max() < 15


def test_sample_basic(setup):
    net, sched, variables, pos, v, mask, shape = setup
    cfg = smp.SamplerConfig(num_steps=20)
    out = smp.sample_diffusion(net, sched, variables, jax.random.PRNGKey(2),
                               pos, v, mask, shape, cfg)
    assert out["pos"].shape == pos.shape
    assert out["v"].shape == v.shape
    assert np.all(np.isfinite(np.asarray(out["pos"])))
    # padded entries unchanged from init
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(out["pos"])[~m],
                               np.asarray(pos)[~m])
    np.testing.assert_array_equal(np.asarray(out["v"])[~m],
                                  np.asarray(v)[~m])


def test_sample_jit_and_traj(setup):
    net, sched, variables, pos, v, mask, shape = setup
    cfg = smp.SamplerConfig(num_steps=5, record_traj=True)

    @jax.jit
    def run(rng):
        return smp.sample_diffusion(net, sched, variables, rng, pos, v,
                                    mask, shape, cfg)

    out = run(jax.random.PRNGKey(3))
    assert out["pos_traj"].shape == (5, *pos.shape)
    assert out["v_traj"].shape == (5, *v.shape)


def test_sample_with_cfg_guidance(setup):
    net, sched, variables, pos, v, mask, shape = setup
    bounds = jnp.tile(jnp.array([[-8.0, 8.0]]), (2, 3, 1))
    cfg = smp.SamplerConfig(num_steps=10, guide_stren=0.5,
                            threshold_type="reference_threshold",
                            threshold_args={"p": 1.1})
    out = smp.sample_diffusion(net, sched, variables, jax.random.PRNGKey(4),
                               pos, v, mask, shape, cfg, bounds=bounds)
    p = np.asarray(out["pos"])[np.asarray(mask)]
    assert np.all(p >= -8.0) and np.all(p <= 8.0)


def test_sample_with_pointcloud_guidance(setup):
    net, sched, variables, pos, v, mask, shape = setup
    cloud = jnp.asarray(np.random.default_rng(5).standard_normal((2, 64, 3)),
                        jnp.float32)
    cfg = smp.SamplerConfig(num_steps=10, guidance="pointcloud",
                            grad_step=2, pointcloud_radius=0.5)
    out = smp.sample_diffusion(net, sched, variables, jax.random.PRNGKey(6),
                               pos, v, mask, shape, cfg, cloud=cloud)
    assert np.all(np.isfinite(np.asarray(out["pos"])))


def test_sample_with_sdf_guidance(setup):
    net, sched, variables, pos, v, mask, shape = setup
    # synthetic SDF of a sphere radius 4 centered at origin on a 32^3 grid
    G, spacing = 32, 0.5
    origin = jnp.tile(jnp.array([[-8.0, -8.0, -8.0]]), (2, 1))
    coords = np.stack(np.meshgrid(*[np.arange(G) * spacing - 8.0] * 3,
                                  indexing="ij"), -1)
    sdf = np.linalg.norm(coords, axis=-1) - 4.0
    sdf_grid = jnp.tile(jnp.asarray(sdf, jnp.float32)[None], (2, 1, 1, 1))
    cfg = smp.SamplerConfig(num_steps=10, guidance="mesh_sdf", grad_step=2)
    out = smp.sample_diffusion(net, sched, variables, jax.random.PRNGKey(7),
                               pos, v, mask, shape, cfg, sdf_grid=sdf_grid,
                               sdf_origin=origin, sdf_spacing=spacing)
    assert np.all(np.isfinite(np.asarray(out["pos"])))


def test_threshold_functions():
    x = jnp.array([[-5.0, 0.5, 5.0]])
    xc = jnp.array([[-1.0, 0.5, 1.0]])
    out = smp.reference_threshold(x, xc, 1.1)
    np.testing.assert_allclose(np.asarray(out), [[-1.1, 0.5, 1.1]])
    out = smp.dynamic_threshold(jnp.array([1.0, -1.0, 10.0]), 0.5)
    assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-6
    out = smp.rescale(x, xc, 1.0)
    np.testing.assert_allclose(float(jnp.std(out)), float(jnp.std(xc)),
                               rtol=1e-5)


def test_sdf_trilinear_sphere():
    G, spacing = 32, 0.5
    origin = jnp.array([[-8.0, -8.0, -8.0]])
    coords = np.stack(np.meshgrid(*[np.arange(G) * spacing - 8.0] * 3,
                                  indexing="ij"), -1)
    sdf = np.linalg.norm(coords, axis=-1) - 4.0
    grid = jnp.asarray(sdf, jnp.float32)[None]
    pts = jnp.array([[[0.0, 0.0, 0.0], [4.0, 0.0, 0.0], [6.0, 0.0, 0.0]]])
    vals = smp.sdf_trilinear(grid, origin, spacing, pts)
    np.testing.assert_allclose(np.asarray(vals[0]), [-4.0, 0.0, 2.0],
                               atol=0.05)


def test_pointcloud_guidance_pulls_far_atoms():
    rng = jax.random.PRNGKey(0)
    # cloud = unit sphere surface samples
    npts = np.random.default_rng(1).standard_normal((1, 256, 3))
    npts /= np.linalg.norm(npts, axis=-1, keepdims=True)
    cloud = jnp.asarray(npts, jnp.float32)
    pos = jnp.array([[[5.0, 0.0, 0.0], [0.5, 0.0, 0.0]]])
    mask = jnp.ones((1, 2), bool)
    out = smp.pointcloud_guidance(rng, pos, cloud, mask, radius=1.0)
    d_far = float(jnp.linalg.norm(out[0, 0]))
    assert d_far < 5.0                       # far atom moved inward
    np.testing.assert_allclose(np.asarray(out[0, 1]),
                               np.asarray(pos[0, 1]))  # near atom untouched


def test_pointcloud_guidance_diverged_atom_not_frozen():
    """Regression (r4 self-review): an atom whose nearest-point distance
    exceeds the _BIG/2 exhaustion sentinel must still be treated as far
    and pulled toward the cloud — round 0 is a true measurement, not an
    exhausted round."""
    rng = jax.random.PRNGKey(0)
    npts = np.random.default_rng(1).standard_normal((1, 64, 3))
    cloud = jnp.asarray(npts, jnp.float32)
    pos = jnp.array([[[1e5, 0.0, 0.0]]])     # d^2 = 1e10 >= _BIG/2
    mask = jnp.ones((1, 1), bool)
    out = smp.pointcloud_guidance(rng, pos, cloud, mask, radius=1.0)
    assert float(jnp.linalg.norm(out[0, 0])) < 1e5   # moved, not frozen
