"""KmeansVectorQuantizer parity vs a torch re-statement of the reference
forward (/root/reference/src/fairseq/modules/kmeans_vector_quantizer.py:
74-127 — grouped 1x1 conv + Fp32GroupNorm projection, per-group nearest
codeword, straight-through, perplexity, kmeans loss)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from unispeech_tpu.ops.quantizer import KmeansVectorQuantizer


def torch_oracle(x_btc, proj_w, gn_scale, gn_bias, embedding, groups, gamma):
    """The reference forward, restated in torch (time_first=True path)."""
    x = torch.from_numpy(x_btc).transpose(1, 2)  # (B, C, T)
    B, C, T = x.shape
    num_vars, num_groups, var_dim = embedding.shape
    w = torch.from_numpy(proj_w)  # (G, C/G, C/G) einsum btgi,gio->btgo
    # grouped conv1d weight layout: (C_out, C_in/groups, 1); out channel
    # o = g*(C/G)+j takes inputs from group g: kernel[o, i] = w[g, i, j]
    kern = torch.zeros(C, C // groups, 1)
    for g in range(groups):
        kern[g * (C // groups) : (g + 1) * (C // groups), :, 0] = w[g].T
    ze = F.conv1d(x, kern, groups=groups)
    ze = F.group_norm(ze.float(), groups, torch.from_numpy(gn_scale),
                      torch.from_numpy(gn_bias), eps=1e-5)
    emb = torch.from_numpy(embedding)
    expand = emb.expand(num_vars, groups, var_dim) if num_groups == 1 else emb
    ze_ = ze.view(B, groups, var_dim, T).permute(0, 3, 1, 2)  # (B,T,G,D)
    d = (
        (ze_.unsqueeze(0) - expand.unsqueeze(1).unsqueeze(1))
        .view(num_vars, B, T, groups, -1)
        .norm(dim=-1, p=2)
    )
    idx = d.argmin(dim=0)  # (B, T, G)
    zq = torch.stack(
        [expand[idx[..., g], g] for g in range(groups)], dim=-2
    ).view(B, T, groups * var_dim)
    hard_x = (
        idx.new_zeros(B * T * groups, num_vars)
        .scatter_(-1, idx.view(-1, 1), 1.0)
        .view(B * T, groups, -1)
    )
    hard_probs = torch.mean(hard_x.float(), dim=0)
    code_ppl = torch.exp(
        -torch.sum(hard_probs * torch.log(hard_probs + 1e-7), dim=-1)
    ).sum()
    ze_btc = ze.transpose(1, 2)
    latent = F.mse_loss(zq, ze_btc)
    commit = F.mse_loss(ze_btc, zq)
    return (
        idx.numpy(),
        zq.numpy(),
        float(code_ppl),
        float(latent + gamma * commit),
    )


def _run_case(combine_groups):
    B, T, C, G, V = 2, 13, 16, 4, 11
    rng = jax.random.PRNGKey(0)
    x = np.random.default_rng(0).standard_normal((B, T, C)).astype(np.float32)
    vq = KmeansVectorQuantizer(
        dim=C, num_vars=V, groups=G, combine_groups=combine_groups, vq_dim=C
    )
    variables = vq.init({"params": rng}, jnp.asarray(x), produce_targets=True)
    res = vq.apply(variables, jnp.asarray(x), produce_targets=True)
    p = variables["params"]
    idx_t, zq_t, ppl_t, loss_t = torch_oracle(
        x,
        np.asarray(p["proj_kernel"]),
        np.asarray(p["gn_scale"]),
        np.asarray(p["gn_bias"]),
        np.asarray(p["embedding"]),
        G,
        0.25,
    )
    np.testing.assert_array_equal(np.asarray(res["targets"]), idx_t)
    np.testing.assert_allclose(np.asarray(res["x"]), zq_t, atol=1e-5)
    np.testing.assert_allclose(float(res["code_perplexity"]), ppl_t, rtol=1e-5)
    np.testing.assert_allclose(float(res["kmeans_loss"]), loss_t, rtol=1e-4)


def test_kmeans_vq_parity_grouped():
    _run_case(combine_groups=False)


def test_kmeans_vq_parity_combined():
    _run_case(combine_groups=True)


def test_kmeans_vq_straight_through_and_emb_grads():
    B, T, C, G, V = 2, 7, 8, 2, 5
    rng = jax.random.PRNGKey(1)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((B, T, C)),
                    jnp.float32)
    vq = KmeansVectorQuantizer(dim=C, num_vars=V, groups=G,
                               combine_groups=False, vq_dim=C)
    variables = vq.init({"params": rng}, x)

    def out_loss(xx):
        return jnp.sum(vq.apply(variables, xx)["x"] ** 2)

    g = jax.grad(out_loss)(x)
    assert np.abs(np.asarray(g)).sum() > 0  # straight-through reaches input

    def km_loss(params):
        return vq.apply({"params": params}, x)["kmeans_loss"]

    gp = jax.grad(km_loss)(variables["params"])
    assert np.abs(np.asarray(gp["embedding"])).sum() > 0  # latent term
    assert np.abs(np.asarray(gp["proj_kernel"])).sum() > 0  # commitment term
