"""Train-time attention dropout + eval-render compile bucketing.

The reference enables dropout only through torch train()/eval() mode:
MultiheadAttention dropout=0.2 (selfattention.py:65, mlp_offset_SA.py:44)
and TransformerEncoderLayer's default 0.1. Here dropout activates iff an
rng is threaded; rng=None is eval mode and must be bit-identical to the
pre-dropout behavior (the torch-parity tests in test_variants.py pin that).
"""

import jax
import jax.numpy as jnp
import numpy as np

from humannerf_tpu.config import make_cfg
from humannerf_tpu.models import attention, encoders
from humannerf_tpu.models import nonrigid_variants as nv
from humannerf_tpu.models.network import HumanNeRF


def test_mha_dropout_train_vs_eval():
    dim, T = 16, 6
    p = attention.init_mha(jax.random.key(0), dim, num_heads=2)
    x = jnp.asarray(np.random.RandomState(0).randn(2, T, dim)
                    .astype(np.float32))
    eval1, _ = attention.apply_mha(p, x, x, x)
    eval2, _ = attention.apply_mha(p, x, x, x, dropout_rate=0.2, rng=None)
    np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))

    t1, a1 = attention.apply_mha(p, x, x, x, dropout_rate=0.5,
                                 rng=jax.random.key(1))
    t2, _ = attention.apply_mha(p, x, x, x, dropout_rate=0.5,
                                rng=jax.random.key(2))
    assert not np.allclose(np.asarray(t1), np.asarray(eval1))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    # inverted dropout on the attention weights: ~rate of entries zeroed,
    # survivors scaled by 1/(1-rate)
    a1 = np.asarray(a1)
    frac_zero = (a1 == 0).mean()
    assert 0.3 < frac_zero < 0.7


def test_transformer_layer_dropout_sites():
    d, T = 16, 4
    p = attention.init_transformer_encoder_layer(jax.random.key(1), d, 2, 32)
    x = jnp.asarray(np.random.RandomState(1).randn(3, T, d)
                    .astype(np.float32))
    ev = attention.apply_transformer_encoder_layer(p, x)
    tr = attention.apply_transformer_encoder_layer(
        p, x, dropout_rate=0.1, rng=jax.random.key(0))
    assert not np.allclose(np.asarray(ev), np.asarray(tr))
    assert np.isfinite(np.asarray(tr)).all()

    enc = attention.init_transformer_encoder(jax.random.key(2), d, 2, 32, 2)
    ev = attention.apply_transformer_encoder(enc, x)
    tr = attention.apply_transformer_encoder(enc, x, dropout_rate=0.1,
                                             rng=jax.random.key(0))
    assert not np.allclose(np.asarray(ev), np.asarray(tr))


def test_selfattention_encoder_dropout():
    p = encoders.init_selfattention(
        jax.random.key(1), input_dim=9, hidden_dim=32, output_dim=16,
        positional_encoding_type="learnable", max_length=8,
        pe_order="after_fc", pe_dim=8)
    seq = jnp.asarray(np.random.RandomState(0).randn(1, 4, 9)
                      .astype(np.float32))
    ev = encoders.apply_selfattention(p, seq)
    tr = encoders.apply_selfattention(p, seq, rng=jax.random.key(3))
    assert not np.allclose(np.asarray(ev), np.asarray(tr))
    ev2 = encoders.apply_selfattention(p, seq, rng=None)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(ev2))


def test_nonrigid_variant_dropout():
    p = nv.init_nonrigid_sa(jax.random.key(0), pos_embed_size=36,
                            condition_code_size=69, mlp_width=32,
                            mlp_depth=3, skips=())
    rng = np.random.RandomState(0)
    embed = jnp.asarray(rng.randn(7, 36).astype(np.float32))
    xyz = jnp.asarray(rng.randn(7, 3).astype(np.float32))
    cond = jnp.asarray(rng.randn(4, 69).astype(np.float32))
    ev = nv.apply_nonrigid_sa(p, embed, xyz, cond, skips=())
    tr = nv.apply_nonrigid_sa(p, embed, xyz, cond, skips=(),
                              rng=jax.random.key(1))
    assert not np.allclose(np.asarray(ev["offsets"]), np.asarray(tr["offsets"]))


def test_input_encoder_dropout_threading():
    """The input encoder's selfattention temporal net must see dropout in
    train mode (reference input_encoder.py builds it from SelfAttention,
    dropout=0.2 in train())."""
    from humannerf_tpu.models.input_encoder import (apply_input_encoder,
                                                    init_input_encoder)
    cfg = make_cfg()
    kw = {k: v for k, v in cfg.canonical_mlp.input_encoder.items()
          if k != "enable"}
    kw["temporal_enc_method"] = "selfattention"
    params = init_input_encoder(jax.random.key(0), input_ch=12,
                                condition_code_dim=3, **kw)
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.randn(8, 12).astype(np.float32))
    cc = jnp.asarray(rng.randn(kw["seq_len"], 23, 3).astype(np.float32))
    w = jnp.asarray(np.abs(rng.randn(8, 24)).astype(np.float32))
    e1 = apply_input_encoder(params, pos, cc, w)
    e2 = apply_input_encoder(params, pos, cc, w, rng=None)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    t1 = apply_input_encoder(params, pos, cc, w, rng=jax.random.key(1))
    assert not np.allclose(np.asarray(t1), np.asarray(e1))


def test_network_train_flag_controls_dropout():
    """render_rays(train=True) differs from eval for the SA variant, and
    train=True with the plain MLP (no dropout modules) is a no-op."""
    from test_network import make_rays, make_synthetic_frame
    opts = [
        "N_samples", "4", "mweight_volume.volume_size", "16",
        "mweight_volume.embedding_size", "16", "warp.grid_size", "16",
        "canonical_mlp.mlp_width", "32", "canonical_mlp.mlp_depth", "4",
        "non_rigid_motion_model", "'mlp_SA'",
        "non_rigid_motion_mlp_sa.mlp_width", "16",
        "non_rigid_motion_mlp_sa.mlp_depth", "2",
        "non_rigid_motion_mlp_sa.skips", "[]",
    ]
    cfg = make_cfg(opts=opts)
    net = HumanNeRF(cfg)
    params = net.init_params(jax.random.key(0))
    frame = dict(make_synthetic_frame())
    frame["pose_condition"] = jnp.asarray(
        np.random.RandomState(0).randn(4, 69).astype(np.float32))
    rays = make_rays(8)
    key = jax.random.key(5)
    # compare non-rigid offsets (rgb is ~background at random init)
    ev = net.render_rays(params, frame, rays, 1e7, key, full_outputs=True)
    tr = net.render_rays(params, frame, rays, 1e7, key, full_outputs=True,
                         train=True)
    assert not np.allclose(np.asarray(ev["offsets"]),
                           np.asarray(tr["offsets"]))
    # eval path ignores the flagless default: two eval calls identical
    ev2 = net.render_rays(params, frame, rays, 1e7, key, full_outputs=True)
    np.testing.assert_array_equal(np.asarray(ev["offsets"]),
                                  np.asarray(ev2["offsets"]))

    cfg2 = make_cfg(opts=[
        "N_samples", "4", "mweight_volume.volume_size", "16",
        "mweight_volume.embedding_size", "16", "warp.grid_size", "16",
        "canonical_mlp.mlp_width", "32", "canonical_mlp.mlp_depth", "4",
    ])
    net2 = HumanNeRF(cfg2)
    params2 = net2.init_params(jax.random.key(0))
    frame2 = make_synthetic_frame()
    ev = net2.render_rays(params2, frame2, rays, 1e7, key, full_outputs=True)
    tr = net2.render_rays(params2, frame2, rays, 1e7, key, full_outputs=True,
                          train=True)
    np.testing.assert_array_equal(np.asarray(ev["offsets"]),
                                  np.asarray(tr["offsets"]))


def test_eval_renderer_compile_bucketing():
    """A sequence with many distinct masked-ray counts compiles at most
    log2 buckets (VERDICT r1 weak #6): pad sizes are chunk * 2^k."""
    from test_network import make_rays, make_synthetic_frame
    from humannerf_tpu.train.trainer import EvalRenderer
    cfg = make_cfg(opts=[
        "N_samples", "4", "mweight_volume.volume_size", "16",
        "mweight_volume.embedding_size", "16", "warp.grid_size", "16",
        "canonical_mlp.mlp_width", "32", "canonical_mlp.mlp_depth", "4",
    ])
    net = HumanNeRF(cfg)
    params = net.init_params(jax.random.key(0))
    frame = make_synthetic_frame()
    r = EvalRenderer(net, chunk=64)
    for n in (17, 40, 64, 65, 100, 128, 130, 200, 256, 300):
        item = dict(frame)
        item.update({k: np.asarray(v) for k, v in make_rays(n).items()})
        out = r.render_frame(params, item, 1e7)
        assert out["rgb"].shape == (n, 3)
    # buckets: 64, 128, 256, 512 -> at most 4 compiled programs
    assert len(r._jitted) <= 4, sorted(r._jitted)
