"""Image preprocessing and train-time augmentation, pure JAX.

Capability parity with lihzha/lap ``model_adapter.py:83-181`` (which uses the
``augmax`` library): aspect-preserving resize-with-pad to 224x224, then for
training batches a per-sample pipeline of RandomCrop(95%) -> Resize ->
Rotate(+-5 deg) -> ColorJitter(0.2/0.2/0.2), with augmentation skipped for
VQA samples via a batch mask. Everything is jit-compatible device code (the
reference runs augmax on device too); rotation uses bilinear map_coordinates.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp

from lap_tpu.models.types import IMAGE_KEYS, IMAGE_RESOLUTION, CoTObservation


def resize_with_pad(images: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Resize [..., H, W, C] preserving aspect ratio, zero-padding the rest."""
    h, w = images.shape[-3], images.shape[-2]
    if (h, w) == (height, width):
        return images
    ratio = max(h / height, w / width)
    rh, rw = int(h / ratio), int(w / ratio)
    resized = jax.image.resize(
        images, (*images.shape[:-3], rh, rw, images.shape[-1]), method="bilinear"
    )
    pad_h0 = (height - rh) // 2
    pad_w0 = (width - rw) // 2
    pad = [(0, 0)] * (images.ndim - 3) + [
        (pad_h0, height - rh - pad_h0),
        (pad_w0, width - rw - pad_w0),
        (0, 0),
    ]
    return jnp.pad(resized, pad)


def _bilinear_rotate(img: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate one [H, W, C] image by ``angle`` radians about its center."""
    h, w, c = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    sy = cy + (yy - cy) * cos - (xx - cx) * sin
    sx = cx + (yy - cy) * sin + (xx - cx) * cos
    sample = jax.vmap(
        lambda ch: jax.scipy.ndimage.map_coordinates(
            ch, [sy, sx], order=1, mode="constant"
        ),
        in_axes=-1,
        out_axes=-1,
    )
    return sample(img)


def _random_crop_resize(img: jnp.ndarray, key, frac: float = 0.95) -> jnp.ndarray:
    h, w, c = img.shape
    ch, cw = int(h * frac), int(w * frac)
    ky, kx = jax.random.split(key)
    oy = jax.random.randint(ky, (), 0, h - ch + 1)
    ox = jax.random.randint(kx, (), 0, w - cw + 1)
    crop = jax.lax.dynamic_slice(img, (oy, ox, 0), (ch, cw, c))
    return jax.image.resize(crop, (h, w, c), method="bilinear")


def _color_jitter(img: jnp.ndarray, key, strength: float = 0.2) -> jnp.ndarray:
    """Brightness / contrast / saturation jitter on a [0,1] image."""
    kb, kc, ks = jax.random.split(key, 3)
    b = 1.0 + jax.random.uniform(kb, (), minval=-strength, maxval=strength)
    c = 1.0 + jax.random.uniform(kc, (), minval=-strength, maxval=strength)
    s = 1.0 + jax.random.uniform(ks, (), minval=-strength, maxval=strength)
    img = img * b
    mean = jnp.mean(img, axis=(-3, -2, -1), keepdims=True)
    img = mean + (img - mean) * c
    gray = jnp.mean(img, axis=-1, keepdims=True)
    img = gray + (img - gray) * s
    return jnp.clip(img, 0.0, 1.0)


def _augment_one(img: jnp.ndarray, key) -> jnp.ndarray:
    """Full train-time augmentation for a single [H, W, C] image in [0, 1]."""
    k1, k2, k3 = jax.random.split(key, 3)
    img = _random_crop_resize(img, k1)
    angle = jax.random.uniform(k2, (), minval=-5.0, maxval=5.0) * jnp.pi / 180.0
    img = _bilinear_rotate(img, angle)
    return _color_jitter(img, k3)


def augment_images(images: jnp.ndarray, rng) -> jnp.ndarray:
    """Augment a batch [B, H, W, C] in [-1, 1]; returns same range."""
    imgs01 = images / 2.0 + 0.5
    keys = jax.random.split(rng, images.shape[0])
    out = jax.vmap(_augment_one)(imgs01, keys)
    return out * 2.0 - 1.0


def preprocess_observation(
    rng,
    observation: CoTObservation,
    *,
    train: bool = False,
    image_keys: Sequence[str] = IMAGE_KEYS,
    image_resolution: tuple[int, int] = IMAGE_RESOLUTION,
    aug_wrist_image: bool = True,
    enable_image_augmentation: bool = True,
    vqa_mask=None,
) -> CoTObservation:
    """Resize (if needed), augment (train only), default image masks."""
    batch_shape = observation.state.shape[:-1]

    from lap_tpu.models.types import _to_float_image

    out_images = {}
    for i, key in enumerate(image_keys):
        # uint8 batches ride the host->device link at 1/4 the bytes (the
        # loader defers float conversion); normalize to [-1, 1] on device.
        image = _to_float_image(observation.images[key])
        if image.shape[-3:-1] != image_resolution:
            image = resize_with_pad(image, *image_resolution)
        if train and enable_image_augmentation:
            if not aug_wrist_image and "wrist" in key:
                out_images[key] = image
                continue
            sub = jax.random.fold_in(rng, i)
            aug = augment_images(image, sub)
            if vqa_mask is not None:
                image = jnp.where(vqa_mask[:, None, None, None], image, aug)
            else:
                image = aug
        out_images[key] = image

    out_masks = {}
    for key in out_images:
        if key not in observation.image_masks:
            out_masks[key] = jnp.ones(batch_shape, dtype=jnp.bool_)
        else:
            out_masks[key] = jnp.asarray(observation.image_masks[key])

    return observation.replace(images=out_images, image_masks=out_masks)
