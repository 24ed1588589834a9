import time

import numpy as np
import pytest

from odam_tpu.data.loader import PrefetchLoader


def test_prefetch_in_order():
    items = list(range(20))
    out = list(PrefetchLoader(items, lambda x: x * 2, num_workers=3, buffer_size=4))
    assert out == [x * 2 for x in items]


def test_prefetch_small_buffer_no_deadlock():
    items = list(range(10))
    out = list(PrefetchLoader(items, lambda x: x, num_workers=4, buffer_size=1))
    assert out == items


def test_prefetch_overlaps_io():
    def slow_load(x):
        time.sleep(0.05)
        return x

    items = list(range(8))
    t0 = time.time()
    consumed = []
    for v in PrefetchLoader(items, slow_load, num_workers=4, buffer_size=4):
        time.sleep(0.05)  # simulated device step
        consumed.append(v)
    elapsed = time.time() - t0
    assert consumed == items
    # serial would be 8 * (0.05 + 0.05) = 0.8s; overlapped < 0.65s
    assert elapsed < 0.65, elapsed


def test_prefetch_propagates_errors():
    def load(x):
        if x == 3:
            raise ValueError("boom")
        return x

    with pytest.raises(ValueError, match="boom"):
        list(PrefetchLoader(range(6), load, num_workers=2, buffer_size=2))


def test_prefetch_empty():
    assert list(PrefetchLoader([], lambda x: x)) == []


def test_device_resize_pipeline():
    """resize_on_device: raw-size uint8 frames through the jitted step."""
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
        window=4, track_bbox_samples=32, max_log_frames=8, resize_on_device=True,
    )
    pipe = proc_mod.OdamPipeline(detr, dparams, assoc, aparams, cfg)
    K = np.eye(3, dtype=np.float32) * 100
    pipe.init_sequence(K, 64, 64)  # detector resolution
    raw = np.random.default_rng(0).integers(0, 255, (96, 128, 3), np.uint8)
    r = pipe.process_frame(raw, 0, np.eye(4, dtype=np.float32))
    jax.block_until_ready(r.store.window)
    r = pipe.process_frame(raw, 1, np.eye(4, dtype=np.float32))
    jax.block_until_ready(r.store.window)
    assert int(r.log.count) == 2


def test_device_prefetch_preserves_order_and_content():
    import jax
    import numpy as np

    from odam_tpu.data.loader import device_prefetch

    items = [(f, np.full((4, 4, 3), f, np.float32), np.eye(4) * (f + 1))
             for f in range(5)]
    out = list(device_prefetch(iter(items), lookahead=2))
    assert [o[0] for o in out] == [0, 1, 2, 3, 4]
    for f, img, T in out:
        assert isinstance(img, jax.Array)
        np.testing.assert_allclose(np.asarray(img), f)
        np.testing.assert_allclose(T, np.eye(4) * (f + 1))

    # tuple images (YUV transport) and empty iterators
    assert list(device_prefetch(iter([]))) == []
    y = np.zeros((4, 4), np.uint8)
    uv = np.zeros((2, 2, 2), np.uint8)
    out = list(device_prefetch(iter([(0, (y, uv), None)])))
    assert isinstance(out[0][1], tuple) and isinstance(out[0][1][0], jax.Array)
