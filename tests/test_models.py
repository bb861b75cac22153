"""Model-layer parity tests, incl. loading torch MHA weights verbatim."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scaling_rgcn_training_tpu.models import (
    MHAParams, mha_self_attention,
    init_emb_model, init_mlp_model, init_att_model,
    apply_emb_model, apply_mlp_model, apply_att_model,
)
from scaling_rgcn_training_tpu.ops import build_rel_edges

torch = pytest.importorskip("torch")


def small_edges(n=10, e=24, r=2, seed=0):
    rng = np.random.default_rng(seed)
    return build_rel_edges(
        rng.integers(0, n, e).astype(np.int32),
        rng.integers(0, n, e).astype(np.int32),
        rng.integers(0, 2 * r, e).astype(np.int32),
        n, 2 * r + 1, pad_to_multiple=32)


def test_mha_matches_torch():
    torch.manual_seed(0)
    K, N, d = 3, 11, 12
    mha = torch.nn.MultiheadAttention(embed_dim=d, num_heads=K, dropout=0.2)
    mha.eval()
    x = torch.randn(K, N, d)
    with torch.no_grad():
        ref, _ = mha(x, x, x, average_attn_weights=True)

    params = MHAParams(
        in_proj_w=jnp.asarray(mha.in_proj_weight.detach().numpy()),
        in_proj_b=jnp.asarray(mha.in_proj_bias.detach().numpy()),
        out_proj_w=jnp.asarray(mha.out_proj.weight.detach().numpy()),
        out_proj_b=jnp.asarray(mha.out_proj.bias.detach().numpy()),
    )
    out = mha_self_attention(params, jnp.asarray(x.numpy()), num_heads=K)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_emb_model_forward_shape():
    n, d, h, c, slots = 10, 8, 6, 3, 5
    edges = small_edges(n=n)
    params = init_emb_model(jax.random.key(0), slots, h, c, n, d)
    out = apply_emb_model(params, edges, backend="gather")
    assert out.shape == (n, c)
    assert np.isfinite(np.asarray(out)).all()


def test_mlp_model_matches_manual():
    n, d, h, c, slots, k = 10, 4, 6, 3, 5, 2
    edges = small_edges(n=n)
    params = init_mlp_model(jax.random.key(1), slots, h, c, n, d, num_sums=k)
    # un-transferred MLP keeps a [N, d] embedding only if num_sums==1; with
    # num_sums=2 the lin1 expects [N, 2d] input, so load a concat embedding
    emb = jax.random.normal(jax.random.key(2), (n, k * d))
    params = params._replace(embedding=emb)
    out = apply_mlp_model(params, edges, backend="gather")
    assert out.shape == (n, c)
    # manual front-end
    x = np.tanh(np.asarray(emb) @ np.asarray(params.lin1_w).T + np.asarray(params.lin1_b))
    x = x @ np.asarray(params.lin2_w).T + np.asarray(params.lin2_b)
    assert x.shape == (n, d)
    # MLP output sizes follow round(2/3 in + C) (model/layers.py:93)
    assert params.lin1_w.shape == (round(k * d * 2 / 3 + c), k * d)


def test_att_model_forward_and_dropout_determinism():
    n, d, h, c, slots, k = 9, 8, 6, 3, 5, 2
    edges = small_edges(n=n)
    params = init_att_model(jax.random.key(3), slots, h, c, n, d, num_sums=k)
    out1 = apply_att_model(params, edges, backend="gather")
    out2 = apply_att_model(params, edges, backend="gather")
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))  # eval: no dropout
    # train mode with dropout rng changes the output
    out3 = apply_att_model(params, edges, train=True, rng=jax.random.key(9), backend="gather")
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_mlp_hidden_dim_formula():
    # round(in_f*(2/3) + num_labels), model/layers.py:93
    n, d, c, k = 5, 63, 4, 3
    params = init_mlp_model(jax.random.key(4), 7, 16, c, n, d, num_sums=k)
    in_f = k * d
    assert params.lin1_w.shape[0] == round(in_f * (2 / 3) + c) == 130
    assert params.lin2_w.shape == (d, 130)
