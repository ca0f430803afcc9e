"""VGG16 feature extractor for the Gram-matrix NST loss, TPU-native.

The reference ships only the loss-math helpers (reference: utils.py:80-96 —
``gram_matrix`` with 1/(C·H·W) normalization and ImageNet ``normalize_batch``)
and no driver; this module plus engine.gram_nst build the full
optimization-based NST path fresh (BASELINE config #3).

Architecture: torchvision-layout VGG16 ``features`` trunk (13 convs, 5
maxpools). The importer maps a torchvision ``vgg16`` state-dict
(``features.N.weight``) onto the param tree; ``init`` gives random weights so
the path is testable without the pretrained blob (zero-egress environment).

Style/content taps follow the Gatys convention:
  content: relu3_3 ; style: relu1_2, relu2_2, relu3_3, relu4_3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.conv import conv2d

# (layer index in torchvision features, out_channels); "M" = maxpool
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
# torchvision features indices of the convs:
_TV_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]

RELU_NAMES = [
    "relu1_1", "relu1_2", "relu2_1", "relu2_2", "relu3_1", "relu3_2", "relu3_3",
    "relu4_1", "relu4_2", "relu4_3", "relu5_1", "relu5_2", "relu5_3",
]
STYLE_LAYERS = ("relu1_2", "relu2_2", "relu3_3", "relu4_3")
CONTENT_LAYER = "relu3_3"

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def init(rng: jax.Array) -> list[dict]:
    params = []
    cin = 3
    keys = iter(jax.random.split(rng, 16))
    for c in _CFG:
        if c == "M":
            continue
        k = next(keys)
        fan_in = cin * 9
        bound = (1.0 / fan_in) ** 0.5
        params.append(
            {
                "w": jax.random.uniform(k, (3, 3, cin, c), jnp.float32, -bound * 3**0.5, bound * 3**0.5),
                "b": jnp.zeros((c,), jnp.float32),
            }
        )
        cin = c
    return params


def import_torchvision_vgg16(sd: dict[str, np.ndarray]) -> list[dict]:
    """torchvision vgg16 state-dict (features.N.weight OIHW) → param list."""
    params = []
    for idx in _TV_CONV_IDX:
        w = np.asarray(sd[f"features.{idx}.weight"], np.float32)
        b = np.asarray(sd[f"features.{idx}.bias"], np.float32)
        params.append({"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "b": jnp.asarray(b)})
    return params


def _maxpool2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def extract_features(params: list[dict], x01: jnp.ndarray, layers: tuple[str, ...]) -> dict:
    """x01: NHWC in [0,1] → {relu_name: feature NHWC} for requested layers.

    Input is ImageNet-normalized (reference: utils.py:93-96)."""
    y = (x01 - IMAGENET_MEAN) / IMAGENET_STD
    feats = {}
    conv_i = 0
    relu_i = 0
    want = set(layers)
    for c in _CFG:
        if c == "M":
            y = _maxpool2(y)
            continue
        y = conv2d(y, params[conv_i]["w"], params[conv_i]["b"], padding=1)
        y = jax.nn.relu(y)
        name = RELU_NAMES[relu_i]
        if name in want:
            feats[name] = y
        conv_i += 1
        relu_i += 1
        if len(feats) == len(want):
            break
    return feats


def gram_matrix(feat: jnp.ndarray) -> jnp.ndarray:
    """Gram with the reference's 1/(C·H·W) normalization
    (reference: utils.py:80-83). feat: NHWC → [N, C, C]."""
    n, h, w, c = feat.shape
    f = feat.reshape(n, h * w, c)
    g = jnp.einsum("nxc,nxd->ncd", f, f, precision=lax.Precision.HIGHEST)
    return g / (c * h * w)
