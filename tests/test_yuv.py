import numpy as np

from odam_tpu.data import transforms


def test_yuv420_roundtrip_accuracy(rng):
    rgb = rng.integers(0, 255, (64, 96, 3), np.uint8)
    # smooth the chroma so 4:2:0 subsampling loss is small (natural images)
    rgb = rgb.astype(np.float32)
    k = np.ones((4, 4)) / 16
    from scipy.signal import convolve2d

    sm = np.stack(
        [convolve2d(rgb[..., c], k, mode="same", boundary="symm") for c in range(3)],
        axis=-1,
    ).astype(np.uint8)
    y, uv = transforms.rgb_to_yuv420(sm)
    assert y.shape == (64, 96) and uv.shape == (32, 48, 2)
    assert y.dtype == np.uint8 and uv.dtype == np.uint8
    back = np.asarray(transforms.yuv420_to_rgb_device(y, uv))
    err = np.abs(back - sm.astype(np.float32))
    assert err.mean() < 8.0, err.mean()
    assert err.max() < 80.0, err.max()


def test_yuv420_gray_is_exact():
    gray = np.full((32, 32, 3), 137, np.uint8)
    y, uv = transforms.rgb_to_yuv420(gray)
    np.testing.assert_allclose(y, 137, atol=1)
    np.testing.assert_allclose(uv, 128, atol=1)
    back = np.asarray(transforms.yuv420_to_rgb_device(y, uv))
    np.testing.assert_allclose(back, 137, atol=2)


def test_pipeline_accepts_yuv_frames():
    import jax
    import jax.numpy as jnp

    from odam_tpu.models import associator as assoc_mod, detr as detr_mod
    from odam_tpu.runtime import processor as proc_mod

    dcfg = detr_mod.DETRConfig(
        num_classes=4, num_queries=6, hidden_dim=32, nheads=4,
        enc_layers=1, dec_layers=1, dim_feedforward=32, aux_loss=False,
    )
    detr = detr_mod.DETR(dcfg)
    dparams = detr.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    acfg = assoc_mod.AssociatorConfig(
        descriptor_dim=32, keypoint_encoder=(78, 32, 32),
        gnn_layers=("self",), self_gnn_layers=("self",), sinkhorn_iterations=5,
    )
    assoc = assoc_mod.Associator(acfg)
    aparams = assoc.init(
        jax.random.key(1),
        jnp.full((1, 4, 4, 79), -1.0), jnp.zeros((1, 4), bool),
        jnp.full((1, 5, 79), -1.0), jnp.zeros((1, 5), bool),
    )
    cfg = proc_mod.PipelineConfig(
        detect_threshold=0.0, score_threshold=0.0, max_tracks=4, max_dets=5,
        window=4, track_bbox_samples=32, max_log_frames=8,
    )
    pipe = proc_mod.OdamPipeline(detr, dparams, assoc, aparams, cfg)
    pipe.init_sequence(np.eye(3, dtype=np.float32) * 100, 64, 64)
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (64, 64, 3), np.uint8)

    # same frame as RGB and as YUV must give near-identical detections
    r_rgb = pipe.process_frame(rgb, 0, np.eye(4, dtype=np.float32))
    n_rgb = int(r_rgb.n_detections)

    pipe.init_sequence(np.eye(3, dtype=np.float32) * 100, 64, 64)
    yuv = transforms.rgb_to_yuv420(rgb)
    r_yuv = pipe.process_frame(yuv, 0, np.eye(4, dtype=np.float32))
    n_yuv = int(r_yuv.n_detections)
    assert n_yuv > 0
    assert abs(n_rgb - n_yuv) <= max(2, n_rgb // 2)


def test_fused_normalized_matches_reference_chain(rng):
    """yuv420_to_normalized_device == yuv420_to_rgb_device -> /255-mean/std
    (it exists purely as the fused/lower-traffic form of that chain)."""
    import jax.numpy as jnp

    rgb = rng.integers(0, 255, (67, 101, 3), np.uint8)  # odd H/W: edge pad
    y, uv = transforms.rgb_to_yuv420(rgb)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    ref = (np.asarray(transforms.yuv420_to_rgb_device(y, uv)) / 255.0
           - mean) / std
    fused = np.asarray(transforms.yuv420_to_normalized_device(
        y, uv, mean=mean, std=std))
    np.testing.assert_allclose(fused, ref, atol=2e-5, rtol=1e-5)
    # bf16 output stays within bf16 resolution of the f32 result
    fused16 = np.asarray(transforms.yuv420_to_normalized_device(
        y, uv, mean=mean, std=std, dtype=jnp.bfloat16)).astype(np.float32)
    np.testing.assert_allclose(fused16, ref, atol=0.04)
