"""Pallas kernel tests (interpreter mode on CPU): the fused edge-attention
kernel must match the XLA composition exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapemol_tpu.kernels.edge_attention import (edge_attention_pallas,
                                                 edge_attention_xla,
                                                 fused_edge_attention)


def _inputs(B=3, N=16, K=8, H=64, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, N, H)), dtype)
    k = jnp.asarray(rng.standard_normal((B, N, K, H)), dtype)
    v = jnp.asarray(rng.standard_normal((B, N, K, H)), dtype)
    e_w = jnp.asarray(rng.random((B, N, K, 1)), dtype)
    mask = jnp.asarray(rng.random((B, N, K)) < 0.8)
    return q, k, v, e_w, mask


def test_pallas_matches_xla_interpret():
    q, k, v, e_w, mask = _inputs()
    out_xla = edge_attention_xla(q, k, v, e_w, mask, n_heads=8)
    out_pl = edge_attention_pallas(q, k, v, e_w, mask, n_heads=8,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               atol=1e-5)


def test_pallas_empty_neighborhoods():
    q, k, v, e_w, _ = _inputs(seed=1)
    mask = jnp.zeros((3, 16, 8), bool)        # nobody has neighbors
    out = edge_attention_pallas(q, k, v, e_w, mask, n_heads=8,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def test_dispatch_falls_back_off_tpu():
    q, k, v, e_w, mask = _inputs(seed=2)
    out = fused_edge_attention(q, k, v, e_w, mask, n_heads=8)
    ref = edge_attention_xla(q, k, v, e_w, mask, n_heads=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_xla_composition_matches_manual():
    """One row checked against a hand-rolled softmax."""
    q, k, v, e_w, mask = _inputs(B=1, N=2, K=3, H=4, seed=3)
    out = edge_attention_xla(q, k, v, e_w, mask, n_heads=2)
    b, n = 0, 0
    dh = 2
    qh = np.asarray(q).reshape(1, 2, 1, 2, dh)[b, n, 0]
    kh = np.asarray(k).reshape(1, 2, 3, 2, dh)[b, n]
    vh = (np.asarray(v) * np.asarray(e_w)).reshape(1, 2, 3, 2, dh)[b, n]
    m = np.asarray(mask)[b, n]
    expect = np.zeros((2, dh))
    for hd in range(2):
        logit = (kh[:, hd] @ qh[hd]) / np.sqrt(dh)
        logit = np.where(m, logit, -1e30)
        a = np.exp(logit - logit.max())
        a = a * m
        a = a / max(a.sum(), 1e-20)
        expect[hd] = (a[:, None] * vh[:, hd]).sum(0)
    np.testing.assert_allclose(np.asarray(out)[b, n],
                               expect.reshape(-1), atol=1e-5)


def test_h2x_pallas_matches_xla_interpret():
    from shapemol_tpu.kernels.edge_attention import (h2x_attention_pallas,
                                                     h2x_attention_xla)
    rng = np.random.default_rng(4)
    B, N, K, H, heads = 2, 8, 4, 32, 4
    q = jnp.asarray(rng.standard_normal((B, N, H)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, K, H)), jnp.float32)
    hv = jnp.asarray(rng.standard_normal((B, N, K, H)), jnp.float32)
    wv = jnp.asarray(rng.standard_normal((H, heads)), jnp.float32)
    bv = jnp.asarray(rng.standard_normal((heads,)), jnp.float32)
    e_w = jnp.asarray(rng.random((B, N, K, 1)), jnp.float32)
    rel_x = jnp.asarray(rng.standard_normal((B, N, K, 3)), jnp.float32)
    mask = jnp.asarray(rng.random((B, N, K)) < 0.7)
    out_xla = h2x_attention_xla(q, k, hv, wv, bv, e_w, rel_x, mask, heads)
    out_pl = h2x_attention_pallas(q, k, hv, wv, bv, e_w, rel_x, mask, heads,
                                  interpret=True)
    assert out_pl.shape == (B, N, heads, 3)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               atol=1e-4)


def test_edge_block_pallas_matches_xla_interpret():
    """Full fused layer kernel (geometry + edge MLP + attention) vs the XLA
    reference composition, both modes."""
    from shapemol_tpu.kernels.edge_block import (edge_block_pallas,
                                                 edge_block_xla)
    rng = np.random.default_rng(5)
    B, N, K, H, heads, D, R = 2, 8, 4, 32, 4, 40, 20
    params = {
        "w_dst": jnp.asarray(rng.standard_normal((D, 2 * H)) * 0.1, jnp.float32),
        "b_dst": jnp.asarray(rng.standard_normal(2 * H) * 0.1, jnp.float32),
        "w_src": jnp.asarray(rng.standard_normal((H, 2 * H)) * 0.1, jnp.float32),
        "w_rbf": jnp.asarray(rng.standard_normal((R, 2 * H)) * 0.1, jnp.float32),
        "ln_k_scale": jnp.ones(H), "ln_k_bias": jnp.zeros(H),
        "ln_v_scale": jnp.ones(H), "ln_v_bias": jnp.zeros(H),
        "w_out_k": jnp.asarray(rng.standard_normal((H, H)) * 0.1, jnp.float32),
        "b_out_k": jnp.zeros(H),
        "w_out_v": jnp.asarray(rng.standard_normal((H, heads)) * 0.1, jnp.float32),
        "b_out_v": jnp.zeros(heads),
    }
    x = jnp.asarray(rng.standard_normal((B, N, 3)) * 2, jnp.float32)
    dst = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((B, N, H)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, N, H)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)), jnp.int32)
    e_w = jnp.asarray(rng.random((B, N, K, 1)), jnp.float32)
    mask = jnp.asarray(rng.random((B, N, K)) < 0.8)

    out_xla = edge_block_xla(params, x, dst, h, q, idx, e_w, mask, heads,
                             "h2x", num_rbf=R)
    out_pl = edge_block_pallas(params, x, dst, h, q, idx, e_w, mask, heads,
                               "h2x", num_rbf=R, interpret=True)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               atol=2e-4)

    params_x2h = dict(params)
    params_x2h["w_out_v"] = jnp.asarray(
        rng.standard_normal((H, H)) * 0.1, jnp.float32)
    params_x2h["b_out_v"] = jnp.zeros(H)
    out_xla = edge_block_xla(params_x2h, x, dst, h, q, idx, e_w, mask,
                             heads, "x2h", num_rbf=R)
    out_pl = edge_block_pallas(params_x2h, x, dst, h, q, idx, e_w, mask,
                               heads, "x2h", num_rbf=R, interpret=True)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               atol=2e-4)


def _fused_layer_case():
    rng = np.random.default_rng(6)
    B, N, K, H, heads, S, R = 2, 8, 4, 32, 4, 8, 20

    def mlp_p(d_in, d_out):
        return {"w0": jnp.asarray(rng.standard_normal((d_in, H)) * 0.1,
                                  jnp.float32),
                "b0": jnp.zeros(H), "ln_s": jnp.ones(H),
                "ln_b": jnp.zeros(H),
                "w1": jnp.asarray(rng.standard_normal((H, d_out)) * 0.1,
                                  jnp.float32),
                "b1": jnp.zeros(d_out)}

    def edge_p(out_v):
        D = H + S
        return {
            "w_dst": jnp.asarray(rng.standard_normal((D, 2 * H)) * 0.1,
                                 jnp.float32),
            "b_dst": jnp.zeros(2 * H),
            "w_src": jnp.asarray(rng.standard_normal((H, 2 * H)) * 0.1,
                                 jnp.float32),
            "w_rbf": jnp.asarray(rng.standard_normal((R, 2 * H)) * 0.1,
                                 jnp.float32),
            "ln_k_scale": jnp.ones(H), "ln_k_bias": jnp.zeros(H),
            "ln_v_scale": jnp.ones(H), "ln_v_bias": jnp.zeros(H),
            "w_out_k": jnp.asarray(rng.standard_normal((H, H)) * 0.1,
                                   jnp.float32),
            "b_out_k": jnp.zeros(H),
            "w_out_v": jnp.asarray(rng.standard_normal((H, out_v)) * 0.1,
                                   jnp.float32),
            "b_out_v": jnp.zeros(out_v)}

    params = {"hq": mlp_p(H, H), "x2h": edge_p(H),
              "node_output": mlp_p(2 * H, H), "xq": mlp_p(H, H),
              "h2x": edge_p(heads)}
    x = jnp.asarray(rng.standard_normal((B, N, 3)) * 2, jnp.float32)
    h = jnp.asarray(rng.standard_normal((B, N, H)), jnp.float32)
    invar = jnp.asarray(rng.standard_normal((B, N, S)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)), jnp.int32)
    e_w = jnp.asarray(rng.random((B, N, K, 1)), jnp.float32)
    mask = jnp.asarray(rng.random((B, N, K)) < 0.8)

    return params, x, h, invar, idx, e_w, mask, heads, R


def test_fused_layer_pallas_matches_xla_interpret():
    from shapemol_tpu.kernels.fused_layer import (fused_layer_pallas,
                                                  fused_layer_xla)
    params, x, h, invar, idx, e_w, mask, heads, R = _fused_layer_case()
    h_xla, m_xla = fused_layer_xla(params, x, h, invar, idx, e_w, mask,
                                   heads, num_rbf=R)
    h_pl, m_pl = fused_layer_pallas(params, x, h, invar, idx, e_w, mask,
                                    heads, num_rbf=R, interpret=True)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_xla),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(m_pl), np.asarray(m_xla),
                               atol=3e-4)


def test_fused_layer_bf16_indicators_close_to_f32():
    """mm_dtype='bfloat16' runs the weight AND indicator matmuls in bf16
    (f32 accumulate); outputs must stay within bf16 rounding of the f32
    XLA reference."""
    from shapemol_tpu.kernels.fused_layer import (fused_layer_pallas,
                                                  fused_layer_xla)
    params, x, h, invar, idx, e_w, mask, heads, R = _fused_layer_case()
    h_xla, m_xla = fused_layer_xla(params, x, h, invar, idx, e_w, mask,
                                   heads, num_rbf=R)
    h_pl, m_pl = fused_layer_pallas(params, x, h, invar, idx, e_w, mask,
                                    heads, num_rbf=R,
                                    mm_dtype="bfloat16", interpret=True)
    scale_h = np.max(np.abs(np.asarray(h_xla)))
    scale_m = np.max(np.abs(np.asarray(m_xla)))
    assert np.max(np.abs(np.asarray(h_pl) - np.asarray(h_xla))) \
        < 0.05 * scale_h
    assert np.max(np.abs(np.asarray(m_pl) - np.asarray(m_xla))) \
        < 0.05 * scale_m


def test_dense_layer_matches_xla_interpret():
    """Round-3 dense masked N x N formulation == the sparse XLA reference
    on real kNN graphs (distinct neighbors; dense_from_knn assumes a set)."""
    from shapemol_tpu.kernels.dense_layer import (dense_layer_pallas,
                                                  dense_from_knn)
    from shapemol_tpu.kernels.fused_layer import fused_layer_xla
    from shapemol_tpu.ops.knn import masked_knn
    params, x, h, invar, _idx, e_w, _mask, heads, R = _fused_layer_case()
    B, N = x.shape[:2]
    rng = np.random.default_rng(5)
    node_mask = jnp.asarray(np.arange(N)[None]
                            < rng.integers(4, N + 1, B)[:, None])
    idx, nbr_mask = masked_knn(x, node_mask, _idx.shape[-1])
    h_xla, m_xla = fused_layer_xla(params, x, h, invar, idx, e_w, nbr_mask,
                                   heads, num_rbf=R)
    adj, ewd = dense_from_knn(idx, nbr_mask, e_w[..., 0])
    h_d, m_d = dense_layer_pallas(params, x, h, invar, adj, ewd, heads,
                                  num_rbf=R, interpret=True)
    np.testing.assert_allclose(np.asarray(h_d), np.asarray(h_xla),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(m_d), np.asarray(m_xla),
                               atol=3e-4)


def test_dense_layer_grad_path():
    """dense_layer custom VJP differentiates through the XLA backward."""
    import jax
    from shapemol_tpu.kernels.dense_layer import dense_layer
    from shapemol_tpu.ops.knn import masked_knn
    params, x, h, invar, _idx, e_w, _mask, heads, R = _fused_layer_case()
    B, N = x.shape[:2]
    node_mask = jnp.ones((B, N), bool)
    idx, nbr_mask = masked_knn(x, node_mask, _idx.shape[-1])

    def loss(p):
        hn, m = dense_layer(p, x, h, invar, idx, e_w, nbr_mask, heads,
                            num_rbf=R, use_pallas=False)
        return jnp.sum(hn ** 2) + jnp.sum(m ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(np.abs(np.asarray(l)).sum()) for l in leaves) > 0


def test_onehot_gather_grads_match_take():
    """The VJP differentiates the one-hot-einsum composition (matmul
    backward instead of scatter-add); its gradients must equal the
    take-based composition's exactly."""
    import jax
    from shapemol_tpu.kernels.fused_layer import fused_layer_xla
    from shapemol_tpu.ops.knn import masked_knn
    params, x, h, invar, _idx, e_w, _mask, heads, R = _fused_layer_case()
    B, N = x.shape[:2]
    idx, nbr_mask = masked_knn(x, jnp.ones((B, N), bool), _idx.shape[-1])

    def loss(gi):
        def f(p, xx, hh):
            hn, m = fused_layer_xla(p, xx, hh, invar, idx, e_w, nbr_mask,
                                    heads, num_rbf=R, gather_impl=gi)
            return jnp.sum(hn ** 2) + jnp.sum(m ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(params, x, h)

    g_take = loss("take")
    g_oh = loss("onehot")
    for a, b in zip(jax.tree_util.tree_leaves(g_take),
                    jax.tree_util.tree_leaves(g_oh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def _rel_check(a, b, tol, zero_tol=1e-5):
    """Relative max-error vs the reference's scale; near-zero references
    (e.g. d_b_out_k, whose true gradient vanishes by softmax shift
    invariance) are compared absolutely."""
    a, b = np.asarray(a), np.asarray(b)
    scale = np.abs(b).max()
    if scale < zero_tol:
        np.testing.assert_allclose(a, b, atol=zero_tol)
    else:
        assert np.abs(a - b).max() / scale < tol, (
            f"rel err {np.abs(a - b).max() / scale:.3e} > {tol}")


def test_edge_block_bwd_pallas_matches_xla_vjp():
    """Hand-derived Pallas backward kernel (interpret mode) vs the XLA
    VJP of the reference composition, both modes, with masked edges,
    self-edges and duplicate neighbors present. Run at highest matmul
    precision so both sides use true-f32 dots (the default precision is
    bf16-class and would mask real formula errors)."""
    import jax
    from shapemol_tpu.kernels.edge_block import (edge_block_bwd_pallas,
                                                 edge_block_xla)
    params, x, h, invar, idx, e_w, mask, heads, R = _fused_layer_case()
    mask = mask.at[:, :, 0].set(True)
    dstf = jnp.concatenate([h, invar], axis=-1)
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal(h.shape), jnp.float32)
    H = h.shape[-1]

    with jax.default_matmul_precision("highest"):
        for mode, out_shape in (("x2h", h.shape),
                                ("h2x", x.shape[:2] + (heads, 3))):
            p = dict(params["x2h" if mode == "x2h" else "h2x"])
            g = jnp.asarray(rng.standard_normal(out_shape), jnp.float32)
            f = lambda p_, x_, d_, h_, q_, e_: edge_block_xla(
                p_, x_, d_, h_, q_, idx, e_, mask, heads, mode, R, 10.0)
            _, vjp = jax.vjp(f, p, x, dstf, h, q, e_w)
            want = vjp(g)
            gp, gx, gd, gh, gq, gew = edge_block_bwd_pallas(
                p, x, dstf, h, q, idx, e_w, mask, g, heads, mode, R, 10.0,
                interpret=True)
            _rel_check(gx, want[1], 2e-4)
            _rel_check(gd, want[2], 2e-4)
            _rel_check(gh, want[3], 2e-4)
            _rel_check(gq, want[4], 2e-4)
            _rel_check(gew, want[5], 2e-4)
            for k in gp:
                _rel_check(gp[k], want[0][k], 2e-4)


def test_fused_layer_bwd_composed_matches_xla_vjp():
    """Full-layer Pallas backward (two edge-block bwd kernels + XLA MLP
    glue) vs the XLA VJP of fused_layer_xla."""
    import jax
    from shapemol_tpu.kernels.fused_layer import (fused_layer_bwd_composed,
                                                  fused_layer_xla)
    params, x, h, invar, idx, e_w, mask, heads, R = _fused_layer_case()
    mask = mask.at[:, :, 0].set(True)
    rng = np.random.default_rng(8)

    with jax.default_matmul_precision("highest"):
        f = lambda p_, x_, h_, i_, e_: fused_layer_xla(
            p_, x_, h_, i_, idx, e_, mask, heads, R, 10.0)
        out, vjp = jax.vjp(f, params, x, h, invar, e_w)
        g = (jnp.asarray(rng.standard_normal(out[0].shape), jnp.float32),
             jnp.asarray(rng.standard_normal(out[1].shape), jnp.float32))
        want = vjp(g)
        dp, dx, dh, dinv, dew = fused_layer_bwd_composed(
            params, x, h, invar, idx, e_w, mask, g, heads, R, 10.0,
            interpret=True)
        _rel_check(dx, want[1], 5e-4)
        _rel_check(dh, want[2], 5e-4)
        _rel_check(dinv, want[3], 5e-4)
        _rel_check(dew, want[4], 5e-4)
        flat_got = jax.tree_util.tree_leaves_with_path(dp)
        flat_want = jax.tree_util.tree_leaves_with_path(want[0])
        for (kp, a), (_, b) in zip(flat_got, flat_want):
            _rel_check(a, b, 5e-4)
