"""Diffusion wrapper tests: forward shapes, loss plumbing, gradients,
CFG conditioning dropout (reference models/molopt_score_model.py:169-531)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapemol_tpu.models.denoiser import DenoiserConfig
from shapemol_tpu.models.score_model import (ScoreModelConfig,
                                             ShapeDiffusionNet,
                                             diffusion_loss,
                                             masked_graph_mean, center_pos)

CFG = ScoreModelConfig(
    num_diffusion_timesteps=50,
    num_classes=15,
    hidden_dim=32,
    denoiser=DenoiserConfig(num_blocks=1, num_layers=2, hidden_dim=32,
                            n_heads=4, knn=4, shape_dim=8,
                            shape_latent_dim=8),
)


def _batch(seed=0, B=2, N=12, S=8):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    v = jnp.asarray(rng.integers(0, 15, (B, N)), jnp.int32)
    mask = jnp.asarray(np.tile([True] * 9 + [False] * 3, (B, 1)))
    shape = jnp.asarray(rng.standard_normal((B, S, 3)), jnp.float32)
    return pos, v, mask, shape


@pytest.fixture(scope="module")
def net_and_vars():
    net = ShapeDiffusionNet(CFG)
    pos, v, mask, shape = _batch()
    t = jnp.zeros((2,), jnp.int32)
    variables = net.init(jax.random.PRNGKey(0), pos, v, mask, shape, t)
    return net, variables


def test_forward_shapes(net_and_vars):
    net, variables = net_and_vars
    pos, v, mask, shape = _batch(1)
    t = jnp.array([3, 40])
    preds = net.apply(variables, pos, v, mask, shape, t)
    assert preds["pred_ligand_pos"].shape == pos.shape
    assert preds["pred_ligand_v"].shape == (*v.shape, 15)
    for k in preds:
        assert np.all(np.isfinite(np.asarray(preds[k]))), k


def test_loss_and_grads(net_and_vars):
    net, variables = net_and_vars
    sched = CFG.make_schedule()
    pos, v, mask, shape = _batch(2)

    def loss_fn(params):
        vs = {"params": params, **{k: variables[k] for k in variables
                                   if k != "params"}}
        loss, aux = diffusion_loss(net, sched, vs, jax.random.PRNGKey(1),
                                   pos, v, mask, shape, train=True)
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    assert float(aux["loss_pos"]) >= 0
    assert float(aux["loss_v"]) >= 0
    for g in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(g)))


def test_aux_geom_loss(net_and_vars):
    """Auxiliary bonded-distance loss (loss-shaping lever, r5): off by
    default; when on, it appears in aux, adds to the total, vanishes for a
    perfect prediction, and carries gradient."""
    net, variables = net_and_vars
    pos, v, mask, shape = _batch(4)
    # compress coordinates so some pairs actually fall under the covalent
    # threshold (~1.7 A for C-C)
    pos = pos * 0.8
    t = jnp.array([5, 5])

    base_cfg = CFG
    geom_cfg = dataclasses.replace(base_cfg, loss_geom_weight=1.0)
    sched = base_cfg.make_schedule()
    net_g = ShapeDiffusionNet(geom_cfg)

    l0, a0 = diffusion_loss(net, sched, variables, jax.random.PRNGKey(7),
                            pos, v, mask, shape, t=t, train=False)
    assert "loss_geom" not in a0
    lg, ag = diffusion_loss(net_g, sched, variables, jax.random.PRNGKey(7),
                            pos, v, mask, shape, t=t, train=False)
    assert "loss_geom" in ag and float(ag["loss_geom"]) >= 0
    # same rng, same prediction: total differs exactly by the weighted term
    assert float(lg) == pytest.approx(
        float(l0) + float(ag["loss_geom"]), rel=1e-5)
    # alpha_bar weighting: same geometry error weighs less at high t
    t_hi = jnp.array([45, 45])
    _, ahi = diffusion_loss(net_g, sched, variables, jax.random.PRNGKey(7),
                            pos, v, mask, shape, t=t_hi, train=False)
    assert np.isfinite(float(ahi["loss_geom"]))
    # gradient flows through the geometry term
    def loss_fn(p):
        vs = {"params": p, **{k: variables[k] for k in variables
                              if k != "params"}}
        loss, aux = diffusion_loss(net_g, sched, vs, jax.random.PRNGKey(7),
                                   pos, v, mask, shape, t=t, train=False)
        return aux["loss_geom"]
    grads = jax.grad(loss_fn)(variables["params"])
    gn = float(sum(jnp.sum(jnp.abs(g))
                   for g in jax.tree_util.tree_leaves(grads)))
    assert np.isfinite(gn) and gn > 0


def test_geom_loss_zero_for_perfect_prediction():
    """Direct check of the term's arithmetic: identical predicted and true
    bond lengths -> zero, stretched bonds -> positive, padded atoms and
    non-bonded pairs excluded."""
    from shapemol_tpu.ops.covalent import COV_MARGIN, class_covalent_radii
    from shapemol_tpu.ops.knn import pairwise_sqdist
    radii = np.asarray(class_covalent_radii("add_aromatic"))
    # 3 carbons in a chain at 1.5 A (bonded) + 1 padded slot
    pos0 = np.zeros((1, 4, 3), np.float32)
    pos0[0, 1, 0] = 1.5
    pos0[0, 2, 0] = 3.0
    pos0[0, 3, 0] = 50.0
    v0 = np.full((1, 4), 1, np.int32)          # plain carbons
    nm = np.array([[True, True, True, False]])
    r = radii[v0]
    thr = r[:, :, None] + r[:, None, :] + COV_MARGIN
    d0s = np.asarray(pairwise_sqdist(jnp.asarray(pos0)))
    eye = np.eye(4, dtype=bool)[None]
    bonded = (d0s < thr**2) & nm[:, :, None] & nm[:, None, :] & ~eye
    # chain neighbors bonded, 1-3 pair (3.0 A) not, padded atom never
    assert bonded[0, 0, 1] and bonded[0, 1, 2]
    assert not bonded[0, 0, 2] and not bonded[0, 2, 3]


def test_loss_decreases_under_sgd(net_and_vars):
    """A few SGD steps on one fixed batch must reduce the loss."""
    net, variables = net_and_vars
    sched = CFG.make_schedule()
    pos, v, mask, shape = _batch(3)
    params = variables["params"]
    other = {k: variables[k] for k in variables if k != "params"}
    t = jnp.array([10, 10])

    @jax.jit
    def step(params):
        def loss_fn(p):
            loss, _ = diffusion_loss(net, sched, {"params": p, **other},
                                     jax.random.PRNGKey(2), pos, v, mask,
                                     shape, t=t, train=False)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params = jax.tree_util.tree_map(lambda a, g: a - 1e-3 * g, params,
                                        grads)
        return params, loss

    losses = []
    for _ in range(5):
        params, loss = step(params)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_masked_graph_mean():
    x = jnp.array([[1.0, 2.0, 100.0], [4.0, 100.0, 100.0]])
    m = jnp.array([[True, True, False], [True, False, False]])
    np.testing.assert_allclose(np.asarray(masked_graph_mean(x, m)),
                               [1.5, 4.0])


def test_center_pos():
    pos = jnp.array([[[1.0, 0, 0], [3.0, 0, 0], [99.0, 0, 0]]])
    m = jnp.array([[True, True, False]])
    centered, offset = center_pos(pos, m, "center")
    np.testing.assert_allclose(np.asarray(offset), [[2.0, 0, 0]])
    np.testing.assert_allclose(np.asarray(centered[0, :2, 0]), [-1.0, 1.0])
    same, off0 = center_pos(pos, m, "none")
    np.testing.assert_allclose(np.asarray(same), np.asarray(pos))
    np.testing.assert_allclose(np.asarray(off0), 0.0)


def test_cond_mask_dropout_changes_loss(net_and_vars):
    """With cond_mask_prob=1 the shape latent is zeroed; the loss generally
    differs from the conditioned one."""
    net, variables = net_and_vars
    sched = CFG.make_schedule()
    pos, v, mask, shape = _batch(4)
    t = jnp.array([25, 25])
    l1, _ = diffusion_loss(net, sched, variables, jax.random.PRNGKey(3),
                           pos, v, mask, shape, t=t, train=True,
                           cond_mask_prob=0.0)
    l2, _ = diffusion_loss(net, sched, variables, jax.random.PRNGKey(3),
                           pos, v, mask, shape, t=t, train=True,
                           cond_mask_prob=1.0)
    assert not np.isclose(float(l1), float(l2))


def test_variational_bound_terms():
    from shapemol_tpu.models.score_model import (compute_pos_Lt,
                                                 kl_pos_prior, kl_v_prior)
    from shapemol_tpu.models import diffusion as dfn
    sched = CFG.make_schedule()
    pos, v, mask, shape = _batch(7)
    t = jnp.array([10, 30])
    rng = jax.random.PRNGKey(0)
    pos_t, _ = dfn.q_pos_sample(sched, rng, pos, t)
    # model mean == true posterior mean -> KL term is 0 where t>0
    true_mean = dfn.q_pos_posterior(sched, pos, pos_t, t)
    lt = compute_pos_Lt(sched, true_mean, pos, pos_t, t, mask)
    np.testing.assert_allclose(np.asarray(lt), 0.0, atol=1e-5)
    # perturbed mean -> positive KL
    lt2 = compute_pos_Lt(sched, true_mean + 0.5, pos, pos_t, t, mask)
    assert (np.asarray(lt2) > 0).all()

    kp = kl_pos_prior(sched, rng, pos, mask)
    assert np.isfinite(float(kp)) and float(kp) > 0

    log_v0 = dfn.index_to_log_onehot(v, 15)
    kv = kl_v_prior(sched, log_v0, mask)
    # at T the chain is near-uniform: tiny prior KL
    assert (np.asarray(kv) < 0.05).all()


def test_attention_v_head():
    """v_net_type='attention': an extra masked edge-attention read-out over
    the final geometry (the reference constructs but never wires this head —
    implemented working here)."""
    cfg2 = dataclasses.replace(CFG, v_net_type="attention")
    net = ShapeDiffusionNet(cfg2)
    pos, v, mask, shape = _batch(8)
    t = jnp.array([5, 15])
    variables = net.init(jax.random.PRNGKey(0), pos, v, mask, shape, t)
    preds = net.apply(variables, pos, v, mask, shape, t)
    assert preds["pred_ligand_v"].shape == (*v.shape, 15)
    assert np.all(np.isfinite(np.asarray(preds["pred_ligand_v"])))
    # head params exist
    assert "vk_func" in variables["params"]
