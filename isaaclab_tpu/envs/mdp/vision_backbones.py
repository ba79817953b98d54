"""Frozen pretrained vision backbones for ``image_features`` observations.

Implements the EXACT torchvision ResNet-18/34 inference graph (reference
``envs/mdp/observations.py:455-505`` ``_prepare_resnet_model``: full model
forward incl. the final fc, so resnet18 features are the 1000-dim ImageNet
logits) in functional JAX, NHWC layout, inference-mode BatchNorm folded into
per-channel scale/bias.

Weights come from a ``.npz`` produced by ``tools/convert_vision_weights.py``
from any torchvision checkpoint/state_dict (``resnet18-f37072fd.pth`` etc.).
This build environment has zero network egress so no ImageNet weights ship
in-repo; without a weights file the backbone runs with deterministic
He-initialized weights (architecture + converter are equivalence-tested
against a torch reference implementation to 1e-4 in
``tests/test_vision_backbones.py``, so dropping a real checkpoint into
``ISAACLAB_TPU_VISION_WEIGHTS`` restores full functional parity).
"""

from __future__ import annotations

import os

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

# torchvision ImageNet normalization (reference observations.py:497-500)
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# BasicBlock layer plan: (stage, blocks, out_channels, first_stride)
_RESNET_PLANS = {
    "resnet18": ((2, 64, 1), (2, 128, 2), (2, 256, 2), (2, 512, 2)),
    "resnet34": ((3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2)),
}


def _conv(x, w, stride, padding):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _max_pool(x, window, stride, padding):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, window, window, 1), (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def resnet_apply(params: dict, x: jnp.ndarray, model_name: str = "resnet18"):
    """Forward pass. ``x``: (E, H, W, 3) in [0, 1] (pre-ImageNet-normalize).
    Returns (E, 1000) logits — the reference's feature tensor."""
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    # stem: 7x7/2 conv pad 3 -> bn -> relu -> 3x3/2 maxpool pad 1
    x = _conv(x, params["conv1.weight"], 2, ((3, 3), (3, 3)))
    x = x * params["bn1.scale"] + params["bn1.bias"]
    x = jax.nn.relu(x)
    x = _max_pool(x, 3, 2, 1)

    for stage_i, (blocks, _ch, first_stride) in enumerate(
        _RESNET_PLANS[model_name], start=1
    ):
        for b in range(blocks):
            pre = f"layer{stage_i}.{b}."
            stride = first_stride if b == 0 else 1
            identity = x
            y = _conv(x, params[pre + "conv1.weight"], stride, ((1, 1), (1, 1)))
            y = y * params[pre + "bn1.scale"] + params[pre + "bn1.bias"]
            y = jax.nn.relu(y)
            y = _conv(y, params[pre + "conv2.weight"], 1, ((1, 1), (1, 1)))
            y = y * params[pre + "bn2.scale"] + params[pre + "bn2.bias"]
            if pre + "downsample.0.weight" in params:
                identity = _conv(
                    x, params[pre + "downsample.0.weight"], stride,
                    ((0, 0), (0, 0)),
                )
                identity = (
                    identity * params[pre + "downsample.1.scale"]
                    + params[pre + "downsample.1.bias"]
                )
            x = jax.nn.relu(y + identity)

    x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
    return x @ params["fc.weight"] + params["fc.bias"]


def fold_bn(gamma, beta, mean, var, eps=1e-5):
    """Inference BatchNorm -> per-channel (scale, bias): exact fold."""
    scale = gamma / np.sqrt(var + eps)
    return scale.astype(np.float32), (beta - mean * scale).astype(np.float32)


def convert_torch_state_dict(sd: dict, model_name: str = "resnet18") -> dict:
    """torchvision ResNet state_dict (tensors or ndarrays) -> our params.

    Conv weights OIHW -> HWIO; BatchNorm folded via running stats; fc weight
    transposed to (in, out).
    """
    def arr(k):
        v = sd[k]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return v.astype(np.float32)

    out = {}

    def put_conv(key):
        out[key + ".weight"] = np.transpose(arr(key + ".weight"), (2, 3, 1, 0))

    def put_bn(key):
        out[key + ".scale"], out[key + ".bias"] = fold_bn(
            arr(key + ".weight"), arr(key + ".bias"),
            arr(key + ".running_mean"), arr(key + ".running_var"),
        )

    put_conv("conv1")
    put_bn("bn1")
    for stage_i, (blocks, _ch, _s) in enumerate(
        _RESNET_PLANS[model_name], start=1
    ):
        for b in range(blocks):
            pre = f"layer{stage_i}.{b}."
            put_conv(pre + "conv1")
            put_bn(pre + "bn1")
            put_conv(pre + "conv2")
            put_bn(pre + "bn2")
            if pre + "downsample.0.weight" in sd:
                put_conv(pre + "downsample.0")
                put_bn(pre + "downsample.1")
    out["fc.weight"] = arr("fc.weight").T  # (512, 1000)
    out["fc.bias"] = arr("fc.bias")
    return out


def random_init_params(model_name: str = "resnet18", seed: int = 18) -> dict:
    """Deterministic He-init fallback when no weights file is available
    (same shapes/keys as a converted checkpoint)."""
    rng = np.random.RandomState(seed)

    def conv(kh, kw, cin, cout):
        fan_in = kh * kw * cin
        return rng.normal(0, np.sqrt(2.0 / fan_in), (kh, kw, cin, cout)).astype(
            np.float32
        )

    out = {"conv1.weight": conv(7, 7, 3, 64),
           "bn1.scale": np.ones(64, np.float32),
           "bn1.bias": np.zeros(64, np.float32)}
    cin = 64
    for stage_i, (blocks, ch, _s) in enumerate(
        _RESNET_PLANS[model_name], start=1
    ):
        for b in range(blocks):
            pre = f"layer{stage_i}.{b}."
            out[pre + "conv1.weight"] = conv(3, 3, cin if b == 0 else ch, ch)
            out[pre + "bn1.scale"] = np.ones(ch, np.float32)
            out[pre + "bn1.bias"] = np.zeros(ch, np.float32)
            out[pre + "conv2.weight"] = conv(3, 3, ch, ch)
            out[pre + "bn2.scale"] = np.ones(ch, np.float32)
            out[pre + "bn2.bias"] = np.zeros(ch, np.float32)
            if b == 0 and cin != ch:
                out[pre + "downsample.0.weight"] = conv(1, 1, cin, ch)
                out[pre + "downsample.1.scale"] = np.ones(ch, np.float32)
                out[pre + "downsample.1.bias"] = np.zeros(ch, np.float32)
        cin = ch
    out["fc.weight"] = rng.normal(0, np.sqrt(1.0 / 512), (512, 1000)).astype(
        np.float32
    )
    out["fc.bias"] = np.zeros(1000, np.float32)
    return out


_PARAM_CACHE: dict = {}


def load_backbone(model_name: str = "resnet18"):
    """Returns (apply_fn, out_dim, is_pretrained). Weights resolution order:
    $ISAACLAB_TPU_VISION_WEIGHTS/<model_name>.npz, then
    isaaclab_tpu/data/<model_name>.npz, then deterministic random init."""
    if model_name in _PARAM_CACHE:
        return _PARAM_CACHE[model_name]
    candidates = []
    env_dir = os.environ.get("ISAACLAB_TPU_VISION_WEIGHTS")
    if env_dir:
        candidates.append(os.path.join(env_dir, f"{model_name}.npz"))
    candidates.append(
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "data", f"{model_name}.npz")
    )
    params, pretrained = None, False
    for c in candidates:
        if os.path.exists(c):
            with np.load(c) as z:
                params = {k: z[k] for k in z.files}
            pretrained = True
            break
    if params is None:
        params = random_init_params(model_name)
        # Reference behavior loads ImageNet-pretrained torchvision weights
        # (envs/mdp/observations.py:234); training on He-init features is a
        # functional divergence the user must not discover silently.
        import logging

        logging.getLogger(__name__).warning(
            "vision backbone '%s': NO pretrained weights found — falling back "
            "to deterministic He-init features. Frozen-backbone observations "
            "(image_features) will NOT match the reference's ImageNet "
            "features. Convert a torchvision checkpoint with "
            "tools/convert_vision_weights.py and set "
            "ISAACLAB_TPU_VISION_WEIGHTS (or drop the .npz into "
            "isaaclab_tpu/data/).",
            model_name,
        )

    def apply(x):
        return resnet_apply(params, x, model_name)

    _PARAM_CACHE[model_name] = (apply, 1000, pretrained)
    return _PARAM_CACHE[model_name]
