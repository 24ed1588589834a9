"""Structural round-trip test of the full checkpoint converters.

Builds a torch-style state dict *from* a flax init (applying the inverse
weight transposes), runs the converters, and checks the result reproduces the
original parameter tree exactly — proving the name mapping covers every
parameter and every transpose is self-consistent, without needing the actual
reference checkpoints.
"""
import jax
import jax.numpy as jnp
import numpy as np

from odam_tpu.models import associator as assoc_mod, detr as detr_mod, porting


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _inv_t(kernel):  # flax Dense [in, out] -> torch Linear [out, in]
    return np.ascontiguousarray(np.asarray(kernel).T)


def _inv_conv(kernel):  # flax HWIO -> torch OIHW
    return np.ascontiguousarray(np.transpose(np.asarray(kernel), (3, 2, 0, 1)))


def _bn_out(sd, tname, p):
    for stat in ("weight", "bias", "running_mean", "running_var"):
        sd[f"{tname}.{stat}"] = np.asarray(p[stat])


def _mha_out(sd, tname, p):
    w = np.concatenate([_inv_t(p[n]["kernel"]) for n in ("q_proj", "k_proj", "v_proj")])
    b = np.concatenate([np.asarray(p[n]["bias"]) for n in ("q_proj", "k_proj", "v_proj")])
    sd[f"{tname}.in_proj_weight"] = w
    sd[f"{tname}.in_proj_bias"] = b
    sd[f"{tname}.out_proj.weight"] = _inv_t(p["out_proj"]["kernel"])
    sd[f"{tname}.out_proj.bias"] = np.asarray(p["out_proj"]["bias"])


def _dense_out(sd, tname, p):
    sd[f"{tname}.weight"] = _inv_t(p["kernel"])
    sd[f"{tname}.bias"] = np.asarray(p["bias"])


def _ln_out(sd, tname, p):
    sd[f"{tname}.weight"] = np.asarray(p["scale"])
    sd[f"{tname}.bias"] = np.asarray(p["bias"])


def test_detr_conversion_roundtrip():
    cfg = detr_mod.DETRConfig(enc_layers=2, dec_layers=2)
    model = detr_mod.DETR(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    p = params["params"]

    sd = {}
    # backbone (torchvision naming)
    bb = p["backbone"]
    sd["backbone.0.body.conv1.weight"] = _inv_conv(bb["conv1"]["kernel"])
    _bn_out(sd, "backbone.0.body.bn1", bb["bn1"])
    for stage, n_blocks in enumerate((3, 4, 6, 3), start=1):
        for blk in range(n_blocks):
            fb = bb[f"layer{stage}_{blk}"]
            tp = f"backbone.0.body.layer{stage}.{blk}"
            for c in (1, 2, 3):
                sd[f"{tp}.conv{c}.weight"] = _inv_conv(fb[f"conv{c}"]["kernel"])
                _bn_out(sd, f"{tp}.bn{c}", fb[f"bn{c}"])
            if "downsample_conv" in fb:
                sd[f"{tp}.downsample.0.weight"] = _inv_conv(fb["downsample_conv"]["kernel"])
                _bn_out(sd, f"{tp}.downsample.1", fb["downsample_bn"])
    # transformer
    tr = p["transformer"]
    for i in range(cfg.enc_layers):
        fl = tr[f"encoder_layer{i}"]
        tp = f"transformer.encoder.layers.{i}"
        _mha_out(sd, f"{tp}.self_attn", fl["self_attn"])
        _dense_out(sd, f"{tp}.linear1", fl["linear1"])
        _dense_out(sd, f"{tp}.linear2", fl["linear2"])
        _ln_out(sd, f"{tp}.norm1", fl["norm1"])
        _ln_out(sd, f"{tp}.norm2", fl["norm2"])
    for i in range(cfg.dec_layers):
        fl = tr[f"decoder_layer{i}"]
        tp = f"transformer.decoder.layers.{i}"
        _mha_out(sd, f"{tp}.self_attn", fl["self_attn"])
        _mha_out(sd, f"{tp}.multihead_attn", fl["multihead_attn"])
        _dense_out(sd, f"{tp}.linear1", fl["linear1"])
        _dense_out(sd, f"{tp}.linear2", fl["linear2"])
        for n in ("norm1", "norm2", "norm3"):
            _ln_out(sd, f"{tp}.{n}", fl[n])
    _ln_out(sd, "transformer.decoder.norm", tr["decoder_norm"])
    # heads
    sd["input_proj.weight"] = _inv_conv(p["input_proj"]["kernel"])
    sd["input_proj.bias"] = np.asarray(p["input_proj"]["bias"])
    sd["query_embed.weight"] = np.asarray(p["query_embed"])
    _dense_out(sd, "class_embed", p["class_embed"])
    for head in ("bbox", "offset", "angle", "size", "depth"):
        for i in range(3):
            _dense_out(sd, f"{head}_embed.layers.{i}", p[f"{head}_embed"][f"layer{i}"])

    converted = porting.convert_detr(sd, enc_layers=2, dec_layers=2)
    a = _flatten(params["params"])
    b = _flatten(converted["params"])
    assert set(a) == set(b), (set(a) ^ set(b))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)

    # converted params must actually run through the model
    out = model.apply(converted, jnp.zeros((1, 64, 64, 3)))
    assert out["pred_logits"].shape == (1, cfg.num_queries, cfg.num_classes + 1)


def test_associator_conversion_roundtrip():
    cfg = assoc_mod.AssociatorConfig(
        gnn_layers=("self", "cross"), self_gnn_layers=("self",),
        sinkhorn_iterations=5,
    )
    model = assoc_mod.Associator(cfg)
    params = model.init(
        jax.random.key(0),
        jnp.full((1, 4, 4, 79), -1.0), jnp.zeros((1, 4), bool),
        jnp.full((1, 4, 79), -1.0), jnp.zeros((1, 4), bool),
    )
    p = params["params"]
    D, H = cfg.descriptor_dim, cfg.num_heads
    perm = porting._head_minor_perm(D, H)
    inv_perm = np.argsort(perm)

    def conv1d_out(sd, tname, fp):
        sd[f"{tname}.weight"] = _inv_t(fp["kernel"])[:, :, None]
        sd[f"{tname}.bias"] = np.asarray(fp["bias"])

    def prop_out(sd, tname, fp):
        # invert the head-minor permutation applied by the converter
        for i, n in enumerate(("q_proj", "k_proj", "v_proj")):
            k = np.asarray(fp[n]["kernel"])[:, inv_perm]
            b = np.asarray(fp[n]["bias"])[inv_perm]
            sd[f"{tname}.attn.proj.{i}.weight"] = _inv_t(k)[:, :, None]
            sd[f"{tname}.attn.proj.{i}.bias"] = b
        mk = np.asarray(fp["merge"]["kernel"])[inv_perm, :]
        sd[f"{tname}.attn.merge.weight"] = _inv_t(mk)[:, :, None]
        sd[f"{tname}.attn.merge.bias"] = np.asarray(fp["merge"]["bias"])
        conv1d_out(sd, f"{tname}.mlp.0", fp["mlp"]["layer0"])
        conv1d_out(sd, f"{tname}.mlp.2", fp["mlp"]["layer1"])

    sd = {"bin_score": np.asarray(p["bin_score"])}
    conv1d_out(sd, "encoder.0", p["encoder"]["layer0"])
    conv1d_out(sd, "encoder.2", p["encoder"]["layer1"])
    conv1d_out(sd, "final_proj", p["final_proj"])
    prop_out(sd, "fuser.layers.0", p["fuser_layer0"])
    prop_out(sd, "gnn.layers.0", p["gnn_layer0"])
    prop_out(sd, "gnn.layers.1", p["gnn_layer1"])

    converted = porting.convert_associator(sd, d_model=D, num_heads=H,
                                           n_gnn=2, n_fuser=1)
    a = _flatten(params["params"])
    b = _flatten(converted["params"])
    assert set(a) == set(b), (set(a) ^ set(b))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)

    out = model.apply(
        converted,
        jnp.full((1, 4, 4, 79), -1.0), jnp.zeros((1, 4), bool),
        jnp.full((1, 4, 79), -1.0), jnp.zeros((1, 4), bool),
    )
    assert out.log_assignment.shape == (1, 5, 5)
