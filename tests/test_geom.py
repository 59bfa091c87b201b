"""Geometry stack tests: field, marching tetrahedra, mesh sampling, SDF
targets, voxelization, shape embedding pipeline."""
import numpy as np
import pytest

from shapemol_tpu.geom import surface as srf
from shapemol_tpu.geom import voxel as vox
from shapemol_tpu.geom import shape_emb as semb


def single_carbon():
    return np.array([6]), np.zeros((1, 3))


def test_field_sign():
    z, pos = single_carbon()
    f = srf.mol_field(z, pos, probe_radius=1.4)
    # C vdW 1.908 + 1.4 probe = 3.308 surface radius
    vals = f(np.array([[0, 0, 0], [3.308, 0, 0], [5.0, 0, 0]]))
    assert vals[0] < 0
    assert abs(vals[1]) < 1e-6
    assert vals[2] > 0


def test_marching_tetrahedra_sphere():
    """Isosurface of a single atom ≈ sphere of radius 3.308."""
    z, pos = single_carbon()
    verts, faces = srf.get_mesh(z, pos, probe_radius=1.4, spacing=0.4)
    assert len(verts) > 50 and len(faces) > 50
    r = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(r.mean(), 3.308, atol=0.15)
    assert r.std() < 0.1


def test_mesh_sampling_on_surface():
    z, pos = single_carbon()
    verts, faces = srf.get_mesh(z, pos, spacing=0.4)
    pts = srf.sample_points_from_mesh(verts, faces, 256,
                                      np.random.default_rng(0))
    assert pts.shape == (256, 3)
    r = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(r.mean(), 3.308, atol=0.2)


def test_two_atom_mesh_is_capsule():
    z = np.array([6, 6])
    pos = np.array([[0, 0, 0], [3.0, 0, 0]])
    verts, faces = srf.get_mesh(z, pos, spacing=0.4)
    # extent along x must exceed extent along y by the bond length
    ext = verts.max(axis=0) - verts.min(axis=0)
    assert ext[0] - ext[1] == pytest.approx(3.0, abs=0.4)


def test_mesh_bounds():
    verts = np.array([[0, 0, 0], [2, 3, 4], [-1, 1, 1]])
    b = srf.mesh_bounds(verts)
    np.testing.assert_allclose(b[:, 0], [-1, 0, 0])
    np.testing.assert_allclose(b[:, 1], [2, 3, 4])


def test_sample_sdf_points_balanced_signs():
    z = np.array([6, 6, 7])
    pos = np.array([[0, 0, 0], [1.5, 0, 0], [0.7, 1.3, 0]])
    cloud, center, bounds = semb.mol_surface_cloud(z, pos, num_samples=256,
                                                   rng=np.random.default_rng(1))
    pts, sd = srf.sample_sdf_points(z, pos + 0, cloud + center, 512,
                                    rng=np.random.default_rng(2))
    assert pts.shape == (512, 3) and sd.shape == (512,)
    frac_inside = float((sd < 0).mean())
    assert 0.3 < frac_inside < 0.7
    # signed distance magnitude should be small near the surface cloud
    assert np.abs(sd).mean() < 4.0


def test_voxel_count_monotonic_in_size():
    z1, p1 = single_carbon()
    c1 = vox.voxel_count(z1, p1)
    z2 = np.array([6, 6, 6])
    p2 = np.array([[0, 0, 0], [2.0, 0, 0], [4.0, 0, 0]])
    c2 = vox.voxel_count(z2, p2)
    assert c2 > c1 > 0


def test_voxel_h_excluded():
    z = np.array([6, 1])
    pos = np.array([[0, 0, 0], [1.1, 0, 0]])
    c_with_h = vox.voxel_count(z, pos)
    c_c_only = vox.voxel_count(np.array([6]), np.zeros((1, 3)))
    assert c_with_h == pytest.approx(c_c_only, rel=0.05)


def test_shape_embedding_pipeline_with_dummy_encoder():
    z = np.array([6, 6, 8])
    pos = np.array([[0, 0, 0], [1.5, 0, 0], [2.2, 1.2, 0]])

    class M:
        atomic_nums, pos_ = z, pos
    m = type("M", (), {"atomic_nums": z, "pos": pos})()

    def dummy_encoder(clouds):
        return clouds[:, :32, :] * 0.1          # (B, 32, 3)

    out = semb.batch_encode_shapes(dummy_encoder, [m, m], num_samples=128)
    assert len(out) == 2
    emb = out[0]
    assert emb.latent.shape == (32, 3)
    assert emb.cloud.shape == (128, 3)
    assert emb.bounds.shape == (3, 2)
    np.testing.assert_allclose(emb.cloud.mean(axis=0), 0.0, atol=1e-6)


def test_electroshape_invariance():
    rng = np.random.default_rng(3)
    pos = rng.standard_normal((10, 3))
    q = rng.standard_normal(10) * 0.1
    e1 = semb.electroshape(pos, q)
    # rotation invariance
    m = rng.standard_normal((3, 3))
    qq, _ = np.linalg.qr(m)
    e2 = semb.electroshape(pos @ qq, q)
    np.testing.assert_allclose(e1, e2, atol=1e-4)
    assert e1.shape == (15,)


def test_sdf_grid_for_guidance():
    z = np.array([6])
    pos = np.zeros((1, 3))
    grid, origin, spacing = semb.sdf_grid_for_guidance(z, pos, size=32)
    assert grid.shape == (32, 32, 32)
    # center voxel inside, corner outside
    assert grid[16, 16, 16] < 0
    assert grid[0, 0, 0] > 0


def test_native_surface_matches_numpy():
    """csrc/surface.cpp vs the numpy marching-tetrahedra path: identical
    vertex/face counts and coincident geometry (same 6-tet split, same
    interpolation)."""
    from shapemol_tpu.chem.native import surface_mesh_native
    if surface_mesh_native(np.zeros((1, 3)), np.array([1.9])) is None:
        import pytest
        pytest.skip("native surface library unavailable")
    z = np.array([6, 7, 8, 6, 6])
    rng = np.random.default_rng(3)
    pos = rng.standard_normal((5, 3)) * 1.5
    v1, f1 = srf.get_mesh(z, pos, use_native=False)
    v2, f2 = srf.get_mesh(z, pos, use_native=True)
    assert len(v1) == len(v2) and len(f1) == len(f2)
    from scipy.spatial import cKDTree
    assert cKDTree(v1).query(v2)[0].max() < 1e-9
    assert cKDTree(v2).query(v1)[0].max() < 1e-9
