"""Image transforms for the detector (host-side prep + device math).

Inference path matches the reference exactly (transforms.py:281-290):
resize shorter side to 800 with a 1333 long-side cap, then ImageNet
mean/std normalization.  Output is NHWC float32 (TPU layout), with sizes
rounded so each sequence compiles exactly one program.
"""
from __future__ import annotations

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def target_size(h: int, w: int, short_side: int = 800, max_size: int = 1333,
                pad_multiple: int = 1) -> tuple[int, int]:
    """Resized (h, w) with the reference's shorter-side/max-size rule
    (transforms.py:96-118), optionally rounded up to a multiple (TPU tiling)."""
    scale = short_side / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    if pad_multiple > 1:
        nh = -(-nh // pad_multiple) * pad_multiple
        nw = -(-nw // pad_multiple) * pad_multiple
    return nh, nw


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize (align_corners=False, PIL/torch convention)."""
    try:
        from PIL import Image

        pil = Image.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8) if img.dtype != np.uint8 else img
        )
        out = pil.resize((out_w, out_h), Image.BILINEAR)
        return np.asarray(out).astype(np.float32) / 255.0
    except ImportError:  # pure-NumPy fallback
        h, w = img.shape[:2]
        ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
        xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
        y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
        x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        wy = np.clip(ys - y0, 0, 1)[:, None, None]
        wx = np.clip(xs - x0, 0, 1)[None, :, None]
        im = img.astype(np.float32)
        if im.max() > 2.0:
            im = im / 255.0
        top = im[y0][:, x0] * (1 - wx) + im[y0][:, x1] * wx
        bot = im[y1][:, x0] * (1 - wx) + im[y1][:, x1] * wx
        return top * (1 - wy) + bot * wy


def preprocess_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """uint8/float [H, W, 3] -> normalized float32 [out_h, out_w, 3]."""
    resized = resize_bilinear(img, out_h, out_w)
    return ((resized - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)


def inference_transform(img: np.ndarray, short_side: int = 800,
                        max_size: int = 1333) -> np.ndarray:
    h, w = img.shape[:2]
    nh, nw = target_size(h, w, short_side, max_size)
    return preprocess_image(img, nh, nw)


# ---------------------------------------------------------------------------
# YUV 4:2:0 frame packing (bandwidth-efficient host->device transport)
# ---------------------------------------------------------------------------

def rgb_to_yuv420(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint8 RGB [H, W, 3] -> (Y [H, W] uint8, UV [H/2, W/2, 2] uint8).

    BT.601 full-range; chroma is 2x2 box-averaged.  Halves the bytes shipped
    per frame versus packed RGB — the natural transport for a posed-video
    pipeline (camera streams arrive chroma-subsampled anyway).  H and W must
    be even (pad a row/column upstream if needed).
    """
    rgb = np.asarray(rgb)
    if rgb.dtype != np.uint8:
        rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    f = rgb.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    H, W = y.shape
    H2, W2 = H // 2 * 2, W // 2 * 2
    uv = np.stack([u[:H2, :W2], v[:H2, :W2]], axis=-1)
    uv = uv.reshape(H2 // 2, 2, W2 // 2, 2, 2).mean(axis=(1, 3))
    return np.clip(y, 0, 255).astype(np.uint8), np.clip(uv, 0, 255).astype(np.uint8)


def yuv420_to_rgb_device(y, uv):
    """Device-side inverse of :func:`rgb_to_yuv420` -> float32 RGB in [0, 255].

    Chroma is nearest-upsampled (matches typical video decode).  Pure jnp —
    called inside the jitted pipeline step.
    """
    import jax.numpy as jnp

    yf = y.astype(jnp.float32)
    uvf = uv.astype(jnp.float32) - 128.0
    H, W = yf.shape
    uv_up = jnp.repeat(jnp.repeat(uvf, 2, axis=0), 2, axis=1)
    # odd H/W: chroma was computed on the even-cropped region; edge-extend
    pad_h = H - uv_up.shape[0]
    pad_w = W - uv_up.shape[1]
    if pad_h > 0 or pad_w > 0:
        uv_up = jnp.pad(uv_up, ((0, max(pad_h, 0)), (0, max(pad_w, 0)), (0, 0)),
                        mode="edge")
    uv_up = uv_up[:H, :W]
    u = uv_up[..., 0]
    v = uv_up[..., 1]
    r = yf + 1.402 * v
    g = yf - 0.344136 * u - 0.714136 * v
    b = yf + 1.772 * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


# BT.601 chroma->RGB contribution of (U, V) per channel, columns = R, G, B.
_YUV_K = ((0.0, -0.344136, 1.772),
          (1.402, -0.714136, 0.0))


def yuv420_to_normalized_device(y, uv, mean, std, dtype=None):
    """Fused YUV 4:2:0 -> ImageNet-normalized image, single affine pass.

    Same math as ``yuv420_to_rgb_device`` followed by ``(x/255 - mean)/std``,
    but restructured so XLA emits one fused elementwise loop with no
    full-image f32 intermediates (the unfused chain costs ~0.6 ms/frame at
    800x1071 inside the pipeline step — the round-3 throughput regression),
    and the output materializes directly in the model's compute dtype
    (bf16 halves the write traffic).
    """
    import jax.numpy as jnp

    yf = y.astype(jnp.float32)
    uvf = uv.astype(jnp.float32) - 128.0
    H, W = yf.shape
    uv_up = jnp.repeat(jnp.repeat(uvf, 2, axis=0), 2, axis=1)
    pad_h = H - uv_up.shape[0]
    pad_w = W - uv_up.shape[1]
    if pad_h > 0 or pad_w > 0:
        uv_up = jnp.pad(uv_up, ((0, max(pad_h, 0)), (0, max(pad_w, 0)), (0, 0)),
                        mode="edge")
    uv_up = uv_up[:H, :W]
    k = jnp.asarray(_YUV_K, jnp.float32)              # [2, 3]
    rgb = yf[..., None] + uv_up @ k                   # fused as 2 fmas/channel
    rgb = jnp.clip(rgb, 0.0, 255.0)
    s = 1.0 / (255.0 * jnp.asarray(std, jnp.float32))
    t = jnp.asarray(mean, jnp.float32) / jnp.asarray(std, jnp.float32)
    out = rgb * s - t
    return out.astype(dtype) if dtype is not None else out


# ---------------------------------------------------------------------------
# Training augmentation (reference: transforms.py:15-139, 281-290)
# ---------------------------------------------------------------------------

TRAIN_SCALES = (480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800)


def hflip_with_targets(img: np.ndarray, objects: np.ndarray
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Horizontal flip; box centers and x-offsets mirror (boxes normalized).

    Object row layout as in datasets.py: [class, cx, cy, w, h, dims(3),
    off_x, off_y, ..., depth, angle].  The azimuth flips sign (a mirrored
    scene reverses the rotation sense).
    """
    out = np.ascontiguousarray(img[:, ::-1])
    objects = objects.copy()
    objects[:, 1] = 1.0 - objects[:, 1]
    objects[:, 8] = -objects[:, 8]
    objects[:, -1] = -objects[:, -1]
    return out, objects


def random_resize_train(img: np.ndarray, objects: np.ndarray,
                        rng: np.random.Generator,
                        scales=TRAIN_SCALES, max_size: int = 1333,
                        pad_multiple: int = 32
                        ) -> tuple[np.ndarray, np.ndarray, tuple[int, int]]:
    """Multi-scale resize (DETR-style).  Boxes/offsets are normalized so they
    are scale-invariant; depth and 3D dims are metric and unchanged.

    Returns the resized normalized image, objects, and the padded canvas
    size — images are placed top-left on a fixed canvas so a whole epoch
    compiles one program per canvas size.
    """
    short = int(rng.choice(scales))
    h, w = img.shape[:2]
    nh, nw = target_size(h, w, short, max_size)
    resized = preprocess_image(img, nh, nw)
    ch = -(-max(s for s in scales) // pad_multiple) * pad_multiple
    cw = -(-max_size // pad_multiple) * pad_multiple
    return resized, objects, (min(nh, ch), min(nw, cw))


def pad_to_canvas(img: np.ndarray, canvas_h: int, canvas_w: int
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Top-left placement on a fixed canvas -> (padded image, pixel mask).

    The mask (True = padded) is the NestedTensor equivalent
    (reference misc.py:288-343) consumed by the DETR position encoding.
    """
    h, w = img.shape[:2]
    out = np.zeros((canvas_h, canvas_w, img.shape[2]), img.dtype)
    out[:h, :w] = img
    mask = np.ones((canvas_h, canvas_w), bool)
    mask[:h, :w] = False
    return out, mask


def train_transform(img: np.ndarray, objects: np.ndarray,
                    rng: np.random.Generator,
                    canvas: tuple[int, int] = (800, 1344),
                    flip_prob: float = 0.5
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full train-time augmentation: random flip + multi-scale resize + pad.

    Boxes/offsets must already be normalized (datasets.DetectorDataset does
    this).  NOTE: normalized coordinates refer to the *unpadded* region; the
    pixel mask carries the padding information, matching the reference's
    NestedTensor semantics.

    Returns (image [Hc, Wc, 3], mask [Hc, Wc], objects).
    """
    if rng.uniform() < flip_prob:
        img, objects = hflip_with_targets(img, objects)
    resized, objects, _ = random_resize_train(img, objects, rng)
    padded, mask = pad_to_canvas(resized, canvas[0], canvas[1])
    return padded, mask, objects
