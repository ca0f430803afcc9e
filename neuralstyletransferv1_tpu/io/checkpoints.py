"""Checkpoint importers: reference-format torch state-dicts → JAX param trees.

Parity targets:
- robust load: ``weights_only`` retry, ``state_dict`` unwrap, legacy
  InstanceNorm running-stat dropping, tolerant of missing keys
  (reference: pipeline.py:554-569)
- arch auto-detect by key prefix: ``down1.`` ⇒ NST_Train variant
  (reference: pipeline.py:72-79)
- ReCoNet nested-Sequential key layout (reference: model.py:5-116)

torch is used *only* here, host-side, to deserialize the pickle format; all
weights become numpy → jnp arrays immediately. Conv weights are transposed
OIHW → HWIO (NHWC/TPU layout); ConvTranspose weights IOHW → HWOI.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "load_state_dict",
    "detect_transformer_arch",
    "import_transformer",
    "import_transformer_nst",
    "import_reconet",
]

_DROP_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")


def load_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch checkpoint into {key: float32 numpy}, reference-compat.

    Handles: weights_only load with unpickling fallback, an optional
    ``state_dict``/``model_state_dict`` wrapper, and drops legacy
    InstanceNorm running stats (reference: pipeline.py:554-569).
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for wrapper in ("state_dict", "model_state_dict"):
            if wrapper in obj and isinstance(obj[wrapper], dict):
                obj = obj[wrapper]
                break
    out: dict[str, np.ndarray] = {}
    for k, v in obj.items():
        if k.endswith(_DROP_SUFFIXES):
            continue
        k = k.removeprefix("module.")
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy().astype(np.float32)
        else:
            out[k] = np.asarray(v, dtype=np.float32)
    return out


def detect_transformer_arch(sd: dict[str, np.ndarray]) -> str:
    """'nst' if keys use the NST_Train ``down1.`` prefix, else 'johnson'
    (reference: pipeline.py:72-79)."""
    for k in sd:
        if k.startswith("down1."):
            return "nst"
    return "johnson"


def _conv(sd, prefix) -> dict:
    w = sd[f"{prefix}.weight"]  # OIHW
    p = {"w": np.transpose(w, (2, 3, 1, 0))}  # → HWIO
    if f"{prefix}.bias" in sd:
        p["b"] = sd[f"{prefix}.bias"]
    else:
        p["b"] = np.zeros(w.shape[0], np.float32)
    return p


def _conv_t(sd, prefix) -> dict:
    w = sd[f"{prefix}.weight"]  # IOHW (torch ConvTranspose2d)
    p = {"w": np.transpose(w, (2, 3, 1, 0))}  # → HW, Cout, Cin
    if f"{prefix}.bias" in sd:
        p["b"] = sd[f"{prefix}.bias"]
    else:
        p["b"] = np.zeros(w.shape[1], np.float32)
    return p


def _norm(sd, prefix) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def import_transformer(sd: dict[str, np.ndarray]) -> dict:
    """Johnson TransformerNet state-dict → param tree
    (keys ``conv1.conv2d.weight`` / ``in1.weight`` …)."""
    p: dict = {}
    for name in ("conv1", "conv2", "conv3", "deconv1", "deconv2", "deconv3"):
        p[name] = _conv(sd, f"{name}.conv2d")
    for name in ("in1", "in2", "in3", "in4", "in5"):
        p[name] = _norm(sd, name)
    for i in range(1, 6):
        p[f"res{i}"] = {
            "conv1": _conv(sd, f"res{i}.conv1.conv2d"),
            "in1": _norm(sd, f"res{i}.in1"),
            "conv2": _conv(sd, f"res{i}.conv2.conv2d"),
            "in2": _norm(sd, f"res{i}.in2"),
        }
    return p


def import_transformer_nst(sd: dict[str, np.ndarray]) -> dict:
    """NST_Train TransformerNet state-dict → param tree
    (keys ``down1.conv.weight`` / ``res1.conv1.weight`` / ``up1.conv.weight``)."""
    p: dict = {}
    for name in ("down1", "down2", "down3"):
        p[name] = {"conv": _conv(sd, f"{name}.conv"), "norm": _norm(sd, f"{name}.norm")}
    for i in range(1, 6):
        p[f"res{i}"] = {
            "conv1": _conv(sd, f"res{i}.conv1"),
            "norm1": _norm(sd, f"res{i}.norm1"),
            "conv2": _conv(sd, f"res{i}.conv2"),
            "norm2": _norm(sd, f"res{i}.norm2"),
        }
    for name in ("up1", "up2"):
        p[name] = {"conv": _conv_t(sd, f"{name}.conv"), "norm": _norm(sd, f"{name}.norm")}
    p["final"] = _conv(sd, "final")
    return p


def _reconet_cnl(sd, prefix, use_frn) -> dict:
    """ConvNormLayer: Sequential(ConvLayer, Norm[, Act]) (reference: model.py:18-40).

    ConvLayer itself is Sequential(ReflectionPad2d, Conv2d) so the conv lives
    at ``{prefix}.layers.0.layers.1``; the norm at ``{prefix}.layers.1``.
    """
    out = {
        "conv": _conv(sd, f"{prefix}.layers.0.layers.1"),
        "norm": _norm(sd, f"{prefix}.layers.1"),
    }
    if use_frn and f"{prefix}.layers.2.tau" in sd:
        out["norm"]["tau"] = sd[f"{prefix}.layers.2.tau"].reshape(-1)
    return out


def import_reconet(sd: dict[str, np.ndarray]) -> dict:
    """ReCoNet state-dict → param tree (reference: model.py:75-116)."""
    use_frn = any(".tau" in k for k in sd)
    enc: list = []
    for i in range(3):
        enc.append(_reconet_cnl(sd, f"encoder.layers.{i}", use_frn))
    for i in range(3, 7):
        # ResLayer.branch = Sequential(CNL, CNL) (reference: model.py:43-60)
        c1 = _reconet_cnl(sd, f"encoder.layers.{i}.branch.0", use_frn)
        c2 = _reconet_cnl(sd, f"encoder.layers.{i}.branch.1", use_frn)
        blk = {
            "conv1": c1["conv"],
            "norm1": c1["norm"],
            "conv2": c2["conv"],
            "norm2": c2["norm"],
            "act": None,
        }
        if use_frn:
            blk["act"] = {"tau": sd[f"encoder.layers.{i}.activation.tau"].reshape(-1)}
        enc.append(blk)
    dec: list = []
    # Decoder.layers = Sequential(Upsample, CNL, Upsample, CNL, ConvTanhLayer)
    dec.append(_reconet_cnl(sd, "decoder.layers.1", use_frn))
    dec.append(_reconet_cnl(sd, "decoder.layers.3", use_frn))
    dec.append({"conv": _conv(sd, "decoder.layers.4.layers.0.layers.1")})
    # FRN norm params are stored (1,C,1,1); flatten to (C,).
    def _flatten(t):
        if isinstance(t, dict):
            return {k: _flatten(v) for k, v in t.items()}
        if isinstance(t, list):
            return [_flatten(v) for v in t]
        if isinstance(t, np.ndarray) and t.ndim == 4:
            return t.reshape(-1) if t.shape[0] == 1 and t.shape[2] == 1 else t
        return t

    params = {"frn": use_frn, "encoder": enc, "decoder": dec}
    # Only norm scale/bias/tau need flattening; conv weights are already HWIO
    # with ndim 4 but never have the (1,C,1,1) shape, guarded above.
    return _flatten(params)
