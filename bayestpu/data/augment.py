"""On-device training augmentation: pad-4 random crop + horizontal flip.

≙ the reference's torchvision transforms
``RandomCrop(32, padding=4)`` + ``RandomHorizontalFlip``
(``Software_Artifact/software/datasets/dataset_loader.py:103-108``) and the
Keras ``ImageDataGenerator(width/height_shift=0.1, horizontal_flip=True)``
of the HW flow (``Hardware_Artifact/bayes_hw/train_qkeras.py:152-160``).

Runs vectorized on device (one ``dynamic_slice`` per image via vmap) so the
input pipeline never bottlenecks the TPU — augmentation fuses into the step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(2,))
def random_crop_flip(key: jax.Array, x: jax.Array, pad: int = 4,
                     index: jax.Array | int = 0) -> jax.Array:
    """Pad-reflect by ``pad``, random-crop back to size, random h-flip.

    x: (B, H, W, C) float; one independent crop/flip per image. ``index``
    (e.g. the batch counter) is folded into ``key`` inside the jit so
    callers never pay an eager ``fold_in`` dispatch per batch.
    """
    b, h, w, _ = x.shape
    key = jax.random.fold_in(key, index)
    kc, kf = jax.random.split(key)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    offs = jax.random.randint(kc, (b, 2), 0, 2 * pad + 1)

    def crop(img, off):
        return jax.lax.dynamic_slice(
            img, (off[0], off[1], 0), (h, w, img.shape[-1]))

    out = jax.vmap(crop)(xp, offs)
    flip = jax.random.bernoulli(kf, 0.5, (b,))
    return jnp.where(flip[:, None, None, None], out[:, :, ::-1, :], out)
