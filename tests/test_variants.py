"""Tests for fork-extension components: attention blocks (torch parity),
condition-code encoders, non-rigid variants, vocab/time embeds, localized
conditioning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humannerf_tpu.config import make_cfg
from humannerf_tpu.models import attention, encoders
from humannerf_tpu.models import nonrigid_variants as nv
from humannerf_tpu.models.embedders import init_vocab_embedder, vocab_embed
from humannerf_tpu.models.network import (HumanNeRF, localize_condition_code)

torch = pytest.importorskip("torch")


def test_mha_matches_torch():
    dim, T = 16, 5
    p = attention.init_mha(jax.random.key(0), dim, num_heads=2)
    x_np = np.random.RandomState(0).randn(2, T, dim).astype(np.float32)
    got, _ = attention.apply_mha(p, jnp.asarray(x_np), jnp.asarray(x_np),
                                 jnp.asarray(x_np))

    m = torch.nn.MultiheadAttention(dim, num_heads=2, batch_first=True)
    m.in_proj_weight.data = torch.from_numpy(np.asarray(p["in_proj"]["w"]).T.copy())
    m.in_proj_bias.data = torch.from_numpy(np.asarray(p["in_proj"]["b"]).copy())
    m.out_proj.weight.data = torch.from_numpy(np.asarray(p["out_proj"]["w"]).T.copy())
    m.out_proj.bias.data = torch.from_numpy(np.asarray(p["out_proj"]["b"]).copy())
    with torch.no_grad():
        want, _ = m(torch.from_numpy(x_np), torch.from_numpy(x_np),
                    torch.from_numpy(x_np))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_transformer_encoder_layer_matches_torch():
    d, T = 16, 4
    p = attention.init_transformer_encoder_layer(jax.random.key(1), d, 2, 32)
    x_np = np.random.RandomState(1).randn(3, T, d).astype(np.float32)
    got = attention.apply_transformer_encoder_layer(p, jnp.asarray(x_np))

    layer = torch.nn.TransformerEncoderLayer(d, 2, 32, dropout=0.0,
                                             batch_first=True)
    layer.self_attn.in_proj_weight.data = torch.from_numpy(
        np.asarray(p["mha"]["in_proj"]["w"]).T.copy())
    layer.self_attn.in_proj_bias.data = torch.from_numpy(
        np.asarray(p["mha"]["in_proj"]["b"]).copy())
    layer.self_attn.out_proj.weight.data = torch.from_numpy(
        np.asarray(p["mha"]["out_proj"]["w"]).T.copy())
    layer.self_attn.out_proj.bias.data = torch.from_numpy(
        np.asarray(p["mha"]["out_proj"]["b"]).copy())
    layer.linear1.weight.data = torch.from_numpy(np.asarray(p["ff1"]["w"]).T.copy())
    layer.linear1.bias.data = torch.from_numpy(np.asarray(p["ff1"]["b"]).copy())
    layer.linear2.weight.data = torch.from_numpy(np.asarray(p["ff2"]["w"]).T.copy())
    layer.linear2.bias.data = torch.from_numpy(np.asarray(p["ff2"]["b"]).copy())
    layer.eval()
    with torch.no_grad():
        want = layer(torch.from_numpy(x_np))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=3e-5)


def test_mlpseq_and_selfattention_encoders():
    p = encoders.init_mlpseq(jax.random.key(0), input_dim=9, seq_len=4,
                             hidden_dim=32, output_dim=16, non_linear=True,
                             depth=2)
    seq = np.random.RandomState(0).randn(4, 9).astype(np.float32)
    out = encoders.apply_mlpseq(p, jnp.asarray(seq))
    assert out.shape == (16,)

    for pe in ("learnable", "sine", "sine_fourier", "empty"):
        p = encoders.init_selfattention(
            jax.random.key(1), input_dim=9, hidden_dim=32, output_dim=16,
            positional_encoding_type=pe, max_length=8, pe_order="after_fc",
            pe_dim=8)
        out = encoders.apply_selfattention(p, jnp.asarray(seq[None]))
        assert out.shape == (1, 16)
        assert np.isfinite(np.asarray(out)).all()
    # before_fc PE order
    p = encoders.init_selfattention(
        jax.random.key(2), input_dim=9, hidden_dim=32, output_dim=16,
        positional_encoding_type="learnable", max_length=8,
        pe_order="before_fc", pe_dim=8)
    out = encoders.apply_selfattention(p, jnp.asarray(seq[None]))
    assert out.shape == (1, 16)


def _nv_inputs(n=7, e=36):
    rng = np.random.RandomState(0)
    return (jnp.asarray(rng.randn(n, e).astype(np.float32)),
            jnp.asarray(rng.randn(n, 3).astype(np.float32)))


def test_nonrigid_sa_variant():
    for version in (1, 2):
        p = nv.init_nonrigid_sa(jax.random.key(0), pos_embed_size=36,
                                condition_code_size=69, mlp_width=32,
                                mlp_depth=3, skips=(), sa_version=version)
        embed, xyz = _nv_inputs()
        cond = jnp.asarray(np.random.RandomState(1).randn(4, 69)
                           .astype(np.float32))
        out = nv.apply_nonrigid_sa(p, embed, xyz, cond, skips=())
        assert out["offsets"].shape == (7, 3)
        # tiny-init last layer: offsets ~ 0 at init
        assert np.abs(np.asarray(out["offsets"])).max() < 1e-2


def test_nonrigid_transformer_variant():
    cfg = make_cfg()
    te = cfg.non_rigid_motion_transformer_encoder
    te.d_model, te.dim_feedforward, te.num_encoder_layers = 16, 32, 1
    te.joint_embedding_max_length = 4
    te.condition_input_dim = 9
    p = nv.init_nonrigid_transformer(jax.random.key(0), query_input_dim=36,
                                     cfg_te=te)
    embed, xyz = _nv_inputs()
    cond = jnp.asarray(np.random.RandomState(2).randn(8, 9)
                       .astype(np.float32))  # 2 frames x 4 joints
    out = nv.apply_nonrigid_transformer(p, embed, xyz, cond)
    assert out["offsets"].shape == (7, 3)
    assert np.abs(np.asarray(out["offsets"])).max() < 1e-2


def test_nonrigid_ts_transformer_variant():
    cfg = make_cfg()
    ts = cfg.non_rigid_motion_TStransformer_encoder
    ts.encoder1.d_model, ts.encoder1.dim_feedforward = 8, 16
    ts.encoder2.d_model, ts.encoder2.dim_feedforward = 16, 32
    ts.condition_input_dim = 3
    p = nv.init_nonrigid_ts_transformer(jax.random.key(0),
                                        query_input_dim=36, cfg_ts=ts)
    embed, xyz = _nv_inputs()
    cond = jnp.asarray(np.random.RandomState(3).randn(2, 4, 3)
                       .astype(np.float32))  # (T=2, J=4, D=3)
    out = nv.apply_nonrigid_ts_transformer(p, embed, xyz, cond)
    assert out["offsets"].shape == (7, 3)


def test_vocab_embedder():
    p = init_vocab_embedder(jax.random.key(0), 10, 8)
    out = vocab_embed(p, jnp.asarray([3, 3, 7]))
    assert out.shape == (3, 8)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out[1]))
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[2]))


def test_localize_condition_code_modes():
    cfg = make_cfg()
    rng = np.random.RandomState(0)
    cc = jnp.asarray(rng.rand(5, 69).astype(np.float32))
    w = jnp.asarray(rng.rand(5, 24).astype(np.float32))

    cfg.condition_code.type = "global"
    np.testing.assert_array_equal(
        np.asarray(localize_condition_code(cc, w, cfg.condition_code)),
        np.asarray(cc))

    cfg.condition_code.type = "local"
    out = np.asarray(localize_condition_code(cc, w, cfg.condition_code))
    want = np.asarray(cc) * np.repeat(np.asarray(w)[:, 1:], 3, axis=-1)
    np.testing.assert_allclose(out, want, atol=1e-6)

    cfg.condition_code.type = "local"
    cfg.condition_code.local.threshold = 0.5
    out = np.asarray(localize_condition_code(cc, w, cfg.condition_code))
    mask = (np.asarray(w)[:, 1:] > 0.5).astype(np.float32)
    np.testing.assert_allclose(out, np.asarray(cc) * np.repeat(mask, 3, -1),
                               atol=1e-6)

    cfg.condition_code.type = "local_manual"
    out = np.asarray(localize_condition_code(cc, w, cfg.condition_code))
    assert out.shape == (5, 69) and np.isfinite(out).all()


def test_network_with_variant_models():
    """The network runs end-to-end with each non-rigid variant."""
    from test_network import make_rays, make_synthetic_frame
    for model, cond_shape in (("mlp_SA", (4, 69)),
                              ("transformer_encoder", (46, 9)),
                              ("TStransformer_encoder", (2, 23, 3))):
        opts = [
            "N_samples", "4", "mweight_volume.volume_size", "16",
            "mweight_volume.embedding_size", "16", "warp.grid_size", "16",
            "canonical_mlp.mlp_width", "32", "canonical_mlp.mlp_depth", "4",
            "non_rigid_motion_model", f"'{model}'",
            "non_rigid_motion_mlp_sa.mlp_width", "16",
            "non_rigid_motion_mlp_sa.mlp_depth", "2",
            "non_rigid_motion_mlp_sa.skips", "[]",
            "non_rigid_motion_transformer_encoder.d_model", "16",
            "non_rigid_motion_transformer_encoder.dim_feedforward", "16",
            "non_rigid_motion_transformer_encoder.num_encoder_layers", "1",
            "non_rigid_motion_transformer_encoder.joint_embedding_max_length",
            "23",
            "non_rigid_motion_TStransformer_encoder.encoder1.d_model", "8",
            "non_rigid_motion_TStransformer_encoder.encoder1.dim_feedforward",
            "8",
            "non_rigid_motion_TStransformer_encoder.encoder2.d_model", "16",
            "non_rigid_motion_TStransformer_encoder.encoder2.dim_feedforward",
            "16",
        ]
        cfg = make_cfg(opts=opts)
        net = HumanNeRF(cfg)
        params = net.init_params(jax.random.key(0))
        frame = dict(make_synthetic_frame())
        frame["pose_condition"] = jnp.asarray(
            np.random.RandomState(0).randn(*cond_shape).astype(np.float32))
        out = net.render_rays(params, frame, make_rays(8), iter_val=1e7)
        assert out["rgb"].shape == (8, 3)
        assert np.isfinite(np.asarray(out["rgb"])).all()


def test_network_time_and_vocab_inputs():
    from test_network import make_rays, make_synthetic_frame
    cfg = make_cfg(opts=[
        "N_samples", "4", "mweight_volume.volume_size", "16",
        "mweight_volume.embedding_size", "16", "warp.grid_size", "16",
        "canonical_mlp.mlp_width", "32", "canonical_mlp.mlp_depth", "4",
        "non_rigid_motion_mlp.mlp_width", "16",
        "non_rigid_motion_mlp.mlp_depth", "3",
        "non_rigid_motion_mlp.skips", "[]",
        "non_rigid_motion_mlp.time_input", "True",
        "non_rigid_motion_mlp.condition_code_size",
        str(69 + 128),
        "canonical_mlp.time_input", "True",
        "canonical_mlp.view_dir", "True",
        "canonical_mlp.view_embed", "'vocab'",
    ])
    net = HumanNeRF(cfg)
    params = net.init_params(jax.random.key(0))
    assert "time_embed_fn" in params and "time_embed_fn_cnl" in params
    assert "dir_embed_fn" in params
    frame = dict(make_synthetic_frame())
    frame["frame_id"] = jnp.asarray(5, jnp.int32)
    frame["dir_idx"] = jnp.asarray(1, jnp.int32)
    out = net.render_rays(params, frame, make_rays(8), iter_val=1e7)
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_input_encoder_paths():
    from humannerf_tpu.models.input_encoder import (apply_input_encoder,
                                                    init_input_encoder,
                                                    input_encoder_output_dim)
    from humannerf_tpu.config import make_cfg
    cfg = make_cfg()
    base = {k: v for k, v in cfg.canonical_mlp.input_encoder.items()
            if k != "enable"}
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.randn(10, 63).astype(np.float32))
    cond = jnp.asarray(rng.randn(8, 23, 3).astype(np.float32))
    w = jnp.asarray(rng.rand(10, 24).astype(np.float32))
    for temporal in ("selfattention", "mlp", "empty"):
        for spatial in ("mlp", "empty"):
            kw = dict(base)
            kw["temporal_enc_method"] = temporal
            kw["spatial_enc_method"] = spatial
            p = init_input_encoder(jax.random.key(0), input_ch=63,
                                   condition_code_dim=3, **kw)
            out = apply_input_encoder(p, pos, cond, w)
            assert out.shape == (10, input_encoder_output_dim(p))
            assert np.isfinite(np.asarray(out)).all()


def test_input_encoder_v2_part_indexing():
    from humannerf_tpu.models.input_encoder import (apply_input_encoder,
                                                    init_input_encoder)
    from humannerf_tpu.config import make_cfg
    cfg = make_cfg()
    kw = {k: v for k, v in cfg.canonical_mlp.input_encoder.items()
          if k != "enable"}
    kw["version"] = "v2"
    p = init_input_encoder(jax.random.key(0), input_ch=63,
                           condition_code_dim=3, **kw)
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.randn(10, 63).astype(np.float32))
    cond = jnp.asarray(rng.randn(8, 23, 3).astype(np.float32))
    # samples 0..4 strongly on bone 3, samples 5..9 background
    w = np.zeros((10, 24), np.float32)
    w[:5, 3] = 0.9
    out = np.asarray(apply_input_encoder(p, pos, cond, jnp.asarray(w)))
    assert out.shape[0] == 10 and np.isfinite(out).all()
    code = out[:, 63:]
    # same part -> identical codes; background -> zero code
    np.testing.assert_allclose(code[0], code[4], atol=1e-6)
    np.testing.assert_allclose(code[5:], 0.0, atol=1e-6)
    assert np.abs(code[0]).max() > 0
