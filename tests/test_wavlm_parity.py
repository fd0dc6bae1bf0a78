"""Golden parity: our flax WavLM vs the reference torch standalone model.

Random-weight parity (no pretrained checkpoints available offline): build the
reference model, convert its state dict to flax params, and assert feature
allclose per layer on random waveforms. This exercises every numerics path of
the parity anchor: conv frontend + fp32 norms, pos conv weight norm + SamePad,
bucketed rel-pos bias, the GRU gate, pre/post-LN layers, padding masks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from unispeech_tpu.configs import WavLMModelConfig
from unispeech_tpu.convert.torch_import import wavlm_params_from_reference
from unispeech_tpu.models.wavlm import WavLM


def _small_cfg_dict(**over):
    d = dict(
        encoder_layers=3,
        encoder_embed_dim=96,
        encoder_ffn_embed_dim=192,
        encoder_attention_heads=4,
        conv_feature_layers="[(64,10,5)] + [(64,3,2)] * 2",
        conv_pos=16,
        conv_pos_groups=4,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        encoder_layerdrop=0.0,
        dropout_input=0.0,
        dropout_features=0.0,
        relative_position_embedding=True,
        num_buckets=32,
        max_distance=64,
        gru_rel_pos=True,
    )
    d.update(over)
    return d


def _build_pair(reference_wavlm_module, cfg_dict, seed=0):
    torch.manual_seed(seed)
    ref_cfg = reference_wavlm_module.WavLMConfig(cfg_dict)
    ref = reference_wavlm_module.WavLM(ref_cfg)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = WavLMModelConfig.from_reference_dict(cfg_dict)
    model = WavLM(cfg)
    params = wavlm_params_from_reference(sd, cfg)
    return ref, model, {"params": params}


@pytest.mark.parametrize(
    "over",
    [
        {},  # base-style: post-LN, groupnorm extractor, gated rel-pos
        {"layer_norm_first": True, "extractor_mode": "layer_norm", "normalize": True},
        {"relative_position_embedding": False, "gru_rel_pos": False},
    ],
    ids=["base_style", "large_style", "no_relpos"],
)
def test_feature_parity(reference_wavlm_module, over):
    cfg_dict = _small_cfg_dict(**over)
    ref, model, variables = _build_pair(reference_wavlm_module, cfg_dict)

    rng = np.random.RandomState(0)
    wav = rng.randn(2, 4000).astype(np.float32)

    wav_in = wav
    if cfg_dict.get("normalize"):
        m = wav.mean(axis=1, keepdims=True)
        v = wav.var(axis=1, keepdims=True)
        wav_in = (wav - m) / np.sqrt(v + 1e-5)
        # reference normalizes on the host with layer_norm; feed it normalized
        ref_in = torch.from_numpy(wav_in)
        ours_in = jnp.asarray(wav)  # our model normalizes internally
    else:
        ref_in = torch.from_numpy(wav)
        ours_in = jnp.asarray(wav)

    n_layers = cfg_dict["encoder_layers"]
    with torch.no_grad():
        ref_final, _ = ref.extract_features(ref_in)
        # reference fills layer_results only when output_layer is given
        # (WavLM.py:591-601); ask for the last layer to get all entries
        (_, ref_layers), _ = ref.extract_features(
            ref_in, output_layer=n_layers, ret_layer_results=True
        )

    out = model.apply(variables, ours_in, mask=False, collect_layer_outputs=True)

    np.testing.assert_allclose(
        np.asarray(out.x), ref_final.numpy(), rtol=2e-4, atol=2e-5
    )
    # per-layer hidden states: reference layer_results[i][0] is (T, B, C),
    # entry i = input to layer i. (Entry L omits the final pre-LN norm in the
    # reference, so compare inputs only.)
    for i in range(n_layers):
        ref_h = ref_layers[i][0].transpose(0, 1).numpy()
        np.testing.assert_allclose(
            np.asarray(out.layer_outputs[i]), ref_h, rtol=2e-4, atol=2e-5,
            err_msg=f"layer input {i}",
        )


def test_feature_parity_with_padding(reference_wavlm_module):
    cfg_dict = _small_cfg_dict()
    ref, model, variables = _build_pair(reference_wavlm_module, cfg_dict)

    rng = np.random.RandomState(1)
    B, T = 3, 4000
    lengths = np.array([4000, 3200, 2500])
    wav = rng.randn(B, T).astype(np.float32)
    for b in range(B):
        wav[b, lengths[b] :] = 0.0

    pad_mask = torch.zeros(B, T, dtype=torch.bool)
    for b in range(B):
        pad_mask[b, lengths[b] :] = True

    with torch.no_grad():
        ref_final, ref_pad = ref.extract_features(
            torch.from_numpy(wav), padding_mask=pad_mask
        )

    out = model.apply(variables, jnp.asarray(wav), lengths=jnp.asarray(lengths))

    np.testing.assert_array_equal(np.asarray(out.padding_mask), ref_pad.numpy())
    ours = np.asarray(out.x)
    refv = ref_final.numpy()
    valid = ~ref_pad.numpy()
    np.testing.assert_allclose(ours[valid], refv[valid], rtol=2e-4, atol=2e-5)


def test_base_plus_shape_smoke(reference_wavlm_module):
    """Full WavLM-Base+ shape on a short clip — checks real-config wiring."""
    cfg_dict = dict(
        relative_position_embedding=True,
        gru_rel_pos=True,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        encoder_layerdrop=0.0,
        dropout_input=0.0,
        dropout_features=0.0,
    )
    ref, model, variables = _build_pair(reference_wavlm_module, cfg_dict)
    rng = np.random.RandomState(2)
    wav = rng.randn(1, 8000).astype(np.float32)
    with torch.no_grad():
        ref_final, _ = ref.extract_features(torch.from_numpy(wav))
    out = model.apply(variables, jnp.asarray(wav))
    np.testing.assert_allclose(
        np.asarray(out.x), ref_final.numpy(), rtol=3e-4, atol=5e-5
    )


@pytest.mark.parametrize(
    "k,stride,T",
    [
        (10, 5, 4003),   # frontend L0 shape class
        (3, 2, 511),     # L1-4 class (k > stride, ragged tail)
        (2, 2, 512),     # L5-6 class (k == stride)
        (2, 2, 513),     # k == stride, ragged
        (3, 1, 64),      # stride == 1
        (2, 5, 103),     # k < stride
        (5, 3, 200),     # k > stride, non-divisible
        (1, 1, 32),      # degenerate
    ],
)
def test_strided_conv_as_matmul_matches_lax_conv(k, stride, T):
    """The stride-collapsed MXU formulation must equal lax.conv exactly —
    values AND gradients — at every (k, stride) class the frontend uses and
    several it doesn't (advisor round-2 finding #3)."""
    from unispeech_tpu.models.encoder import strided_conv1d_as_matmul

    rng = jax.random.PRNGKey(k * 100 + stride * 10 + T)
    r1, r2 = jax.random.split(rng)
    B, cin, cout = 2, 6, 8
    x = jax.random.normal(r1, (B, T, cin), jnp.float32)
    w = jax.random.normal(r2, (k, cin, cout), jnp.float32)

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(stride,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
        )

    got = strided_conv1d_as_matmul(x, w, stride)
    want = ref(x, w)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    g_got = jax.grad(lambda x, w: (strided_conv1d_as_matmul(x, w, stride) ** 2).sum(),
                     argnums=(0, 1))(x, w)
    g_want = jax.grad(lambda x, w: (ref(x, w) ** 2).sum(), argnums=(0, 1))(x, w)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_expand_attention_head_size():
    """q/k head widening (reference multihead_attention.py:88-92): q/k
    project to H*expand, v keeps D/H, scaling follows the expanded dim."""
    from unispeech_tpu.configs import base_encoder_config
    from unispeech_tpu.models.encoder import TransformerEncoder

    enc = base_encoder_config(
        encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
        encoder_attention_heads=4, expand_attention_head_size=24,
        relative_position_embedding=True, gru_rel_pos=True,
        num_buckets=32, max_distance=64, use_flash_attention=False,
    )
    m = TransformerEncoder(enc)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 37, 64))
    variables = m.init({"params": jax.random.PRNGKey(1)}, x)
    qk = variables["params"]["layers"]["self_attn"]["q_proj"]["kernel"]
    vk = variables["params"]["layers"]["self_attn"]["v_proj"]["kernel"]
    assert qk.shape == (2, 64, 4 * 24)  # (L, D, H*expand)
    assert vk.shape == (2, 64, 64)
    out = m.apply(variables, x)
    assert out.x.shape == (2, 37, 64)
    assert np.isfinite(np.asarray(out.x)).all()


def test_quant_noise_dense_semantics():
    """QNDense (reference quant_noise, modules.py:203-287): at train time,
    block_size-wide input blocks are dropped per output unit with
    probability p and survivors are scaled by 1/(1-p); eval is the plain
    dense layer."""
    from unispeech_tpu.models.encoder import QNDense

    rng = jax.random.PRNGKey(0)
    m = QNDense(16, p=0.5, block_size=4)
    x = jnp.eye(32)  # rows select kernel rows: y = k (+ bias 0)
    variables = m.init({"params": rng}, x, True)
    k = variables["params"]["kernel"]

    # eval: exact dense
    y = m.apply(variables, x, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(k), rtol=1e-6)

    # train: whole 4-row blocks zeroed; survivors scaled by 2x
    y = m.apply(variables, x, False, rngs={"dropout": jax.random.PRNGKey(1)})
    eff = np.asarray(y)  # (32, 16) = masked kernel
    blocks = eff.reshape(8, 4, 16)
    kb = np.asarray(k).reshape(8, 4, 16)
    zeroed = np.all(blocks == 0.0, axis=1)  # (8, 16)
    scaled = np.all(np.isclose(blocks, 2.0 * kb, rtol=1e-5), axis=1)
    assert np.all(zeroed | scaled), "every block fully dropped or 2x-scaled"
    frac = zeroed.mean()
    assert 0.25 < frac < 0.75  # p = 0.5

    # config plumbing: a train-mode encoder forward with quant noise runs
    from unispeech_tpu.configs import base_encoder_config
    from unispeech_tpu.models.encoder import TransformerEncoder

    enc = base_encoder_config(
        encoder_layers=1, encoder_embed_dim=32, encoder_ffn_embed_dim=64,
        encoder_attention_heads=2, conv_layers=((16, 10, 5),),
        quant_noise_pq=0.25, quant_noise_pq_block_size=8,
        relative_position_embedding=False, conv_pos=16, conv_pos_groups=4,
        dropout=0.0, attention_dropout=0.0,
    )
    te = TransformerEncoder(enc)
    x = jax.random.normal(rng, (2, 24, 32))
    vs = te.init({"params": rng}, x, deterministic=True)
    out = te.apply(vs, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(3),
                         "layerdrop": jax.random.PRNGKey(4)})
    assert np.isfinite(np.asarray(out.x)).all()
