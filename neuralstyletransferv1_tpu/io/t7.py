"""Torch7 ``.t7`` checkpoint reader (first-party, no torchfile dependency).

The reference runs legacy eccv16 ``.t7`` fast-style networks through OpenCV
DNN (reference: pipeline.py:445-478, 586). On TPU we instead parse the
serialized Lua-Torch graph and rebuild it as a JAX program.

Status: binary T7 deserializer implemented below; the nn-graph → JAX builder
recognizes the eccv16 Johnson-style layer set (SpatialConvolution,
SpatialBatchNormalization/InstanceNormalization, ReLU, SpatialFullConvolution,
Tanh, Sequential, padding modules). Checkpoints themselves are not present in
the mount, so construction is validated against synthetic T7 files in tests.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

TYPE_NIL = 0
TYPE_NUMBER = 1
TYPE_STRING = 2
TYPE_TABLE = 3
TYPE_TORCH = 4
TYPE_BOOLEAN = 5
TYPE_FUNCTION = 6
TYPE_RECUR_FUNCTION = 8
TYPE_LEGACY_RECUR_FUNCTION = 7

_STORAGE_DTYPES = {
    "torch.DoubleStorage": (np.float64, 8),
    "torch.FloatStorage": (np.float32, 4),
    "torch.LongStorage": (np.int64, 8),
    "torch.IntStorage": (np.int32, 4),
    "torch.ShortStorage": (np.int16, 2),
    "torch.CharStorage": (np.int8, 1),
    "torch.ByteStorage": (np.uint8, 1),
}


class TorchObject:
    """A deserialized Torch class instance (``torch.*`` / ``nn.*``)."""

    def __init__(self, typename: str, obj):
        self.torch_typename = typename
        self._obj = obj

    def __getattr__(self, k):
        try:
            return self._obj[k]
        except (KeyError, TypeError):
            raise AttributeError(k)

    def get(self, k, default=None):
        if isinstance(self._obj, dict):
            return self._obj.get(k, default)
        return default

    def __repr__(self):
        return f"TorchObject({self.torch_typename})"


class T7Reader:
    def __init__(self, fh):
        self.f = fh
        self.memo: dict[int, object] = {}

    def _read(self, fmt, n):
        return struct.unpack(fmt, self.f.read(n))

    def read_int(self) -> int:
        return self._read("<i", 4)[0]

    def read_long(self) -> int:
        return self._read("<q", 8)[0]

    def read_double(self) -> float:
        return self._read("<d", 8)[0]

    def read_boolean(self) -> bool:
        return self.read_int() == 1

    def read_string(self) -> str:
        n = self.read_int()
        return self.f.read(n).decode("latin-1")

    def read_obj(self):
        typeidx = self.read_int()
        if typeidx == TYPE_NIL:
            return None
        if typeidx == TYPE_NUMBER:
            return self.read_double()
        if typeidx == TYPE_BOOLEAN:
            return self.read_boolean()
        if typeidx == TYPE_STRING:
            return self.read_string()
        if typeidx in (TYPE_TABLE, TYPE_TORCH, TYPE_FUNCTION, TYPE_RECUR_FUNCTION, TYPE_LEGACY_RECUR_FUNCTION):
            index = self.read_int()
            if index in self.memo:
                return self.memo[index]
            if typeidx in (TYPE_FUNCTION, TYPE_RECUR_FUNCTION, TYPE_LEGACY_RECUR_FUNCTION):
                size = self.read_int()
                self.f.read(size)  # dumped bytecode, ignored
                upvalues = self.read_obj()
                obj = ("function", upvalues)
                self.memo[index] = obj
                return obj
            if typeidx == TYPE_TORCH:
                version = self.read_string()
                if version.startswith("V "):
                    typename = self.read_string()
                else:
                    typename = version
                obj = self._read_torch_object(typename, index)
                return obj
            # TYPE_TABLE
            size = self.read_int()
            table: dict = {}
            self.memo[index] = table
            for _ in range(size):
                k = self.read_obj()
                v = self.read_obj()
                table[k] = v
            return table
        raise ValueError(f"unknown T7 type id {typeidx}")

    def _read_torch_object(self, typename: str, index: int):
        if typename in _STORAGE_DTYPES:
            dtype, _ = _STORAGE_DTYPES[typename]
            size = self.read_long()
            data = np.frombuffer(self.f.read(size * np.dtype(dtype).itemsize), dtype=dtype)
            self.memo[index] = data
            return data
        if typename.endswith("Tensor"):
            ndim = self.read_int()
            shape = self._read("<%dq" % ndim, 8 * ndim) if ndim else ()
            strides = self._read("<%dq" % ndim, 8 * ndim) if ndim else ()
            offset = self.read_long() - 1
            placeholder = {}
            self.memo[index] = placeholder
            storage = self.read_obj()
            if storage is None or ndim == 0:
                arr = np.zeros(shape or (0,), np.float32)
            else:
                arr = np.lib.stride_tricks.as_strided(
                    storage[offset:],
                    shape=shape,
                    strides=[s * storage.dtype.itemsize for s in strides],
                ).copy()
            self.memo[index] = arr
            return arr
        # Generic nn.* class: its state is one serialized table.
        placeholder = TorchObject(typename, {})
        self.memo[index] = placeholder
        state = self.read_obj()
        placeholder._obj = state if state is not None else {}
        return placeholder


def load_t7(path: str):
    """Deserialize a binary .t7 file into python/numpy objects."""
    with open(path, "rb") as fh:
        return T7Reader(fh).read_obj()


# ---------------------------------------------------------------------------
# nn-graph → JAX stylizer
# ---------------------------------------------------------------------------

_SUPPORTED = {
    "nn.Sequential",
    "nn.SpatialConvolution",
    "nn.SpatialFullConvolution",
    "nn.SpatialBatchNormalization",
    "nn.InstanceNormalization",
    "nn.SpatialReflectionPadding",
    "nn.SpatialZeroPadding",
    "nn.ReLU",
    "nn.Tanh",
    "nn.Identity",
    "nn.MulConstant",
    "nn.TotalVariation",
    "nn.CAddTable",
    "nn.ConcatTable",
    "nn.SpatialUpSamplingNearest",
}


def _modules(seq: TorchObject):
    mods = seq.get("modules", {})
    if isinstance(mods, dict):
        return [mods[k] for k in sorted(mods, key=lambda x: float(x))]
    return list(mods)


def build_t7_layers(net: TorchObject) -> list[dict]:
    """Flatten a deserialized Lua-nn graph into a layer list our JAX
    executor understands. Raises on unsupported module types."""
    layers: list[dict] = []

    def walk(mod):
        t = mod.torch_typename
        if t == "nn.Sequential":
            for m in _modules(mod):
                walk(m)
            return
        if t == "nn.ConcatTable":
            outs = []
            for m in _modules(mod):
                sub: list[dict] = []
                layers_sub_builder(m, sub)
                outs.append(sub)
            layers.append({"op": "concat_table", "branches": outs})
            return
        if t == "nn.CAddTable":
            layers.append({"op": "add_table"})
            return
        if t == "nn.SpatialConvolution":
            layers.append(
                {
                    "op": "conv",
                    "w": np.transpose(np.asarray(mod.weight, np.float32), (2, 3, 1, 0)),
                    "b": np.asarray(mod.get("bias"), np.float32) if mod.get("bias") is not None else None,
                    "stride": (int(mod.get("dH", 1)), int(mod.get("dW", 1))),
                    "pad": (int(mod.get("padH", 0)), int(mod.get("padW", 0))),
                }
            )
            return
        if t == "nn.SpatialFullConvolution":
            layers.append(
                {
                    "op": "conv_transpose",
                    "w": np.transpose(np.asarray(mod.weight, np.float32), (2, 3, 1, 0)),
                    "b": np.asarray(mod.get("bias"), np.float32) if mod.get("bias") is not None else None,
                    "stride": int(mod.get("dH", 1)),
                    "pad": int(mod.get("padH", 0)),
                    "adj": int(mod.get("adjH", 0)),
                }
            )
            return
        if t in ("nn.SpatialBatchNormalization", "nn.InstanceNormalization"):
            layers.append(
                {
                    "op": "batchnorm" if t == "nn.SpatialBatchNormalization" else "instancenorm",
                    "weight": np.asarray(mod.get("weight"), np.float32) if mod.get("weight") is not None else None,
                    "bias": np.asarray(mod.get("bias"), np.float32) if mod.get("bias") is not None else None,
                    "running_mean": np.asarray(mod.get("running_mean"), np.float32)
                    if mod.get("running_mean") is not None
                    else None,
                    "running_var": np.asarray(mod.get("running_var"), np.float32)
                    if mod.get("running_var") is not None
                    else None,
                    "eps": float(mod.get("eps", 1e-5)),
                }
            )
            return
        if t == "nn.SpatialReflectionPadding":
            layers.append({"op": "reflect_pad", "pad": int(mod.get("pad_t", mod.get("pad_l", 0)))})
            return
        if t == "nn.SpatialZeroPadding":
            layers.append({"op": "zero_pad", "pad": int(mod.get("pad_t", mod.get("pad_l", 0)))})
            return
        if t == "nn.ReLU":
            layers.append({"op": "relu"})
            return
        if t == "nn.Tanh":
            layers.append({"op": "tanh"})
            return
        if t == "nn.MulConstant":
            layers.append({"op": "mul", "c": float(mod.get("constant_scalar", 1.0))})
            return
        if t in ("nn.Identity", "nn.TotalVariation"):
            return
        if t == "nn.SpatialUpSamplingNearest":
            layers.append({"op": "upsample", "factor": int(mod.get("scale_factor", 2))})
            return
        raise NotImplementedError(f"t7 module not supported yet: {t}")

    def layers_sub_builder(mod, out_list):
        saved = layers[:]
        del layers[:]
        walk(mod)
        out_list.extend(layers)
        del layers[:]
        layers.extend(saved)

    walk(net)
    return layers


def t7_apply(layers: list[dict], x):
    """Execute a flattened t7 layer list on an NHWC batch (jittable)."""
    import jax
    import jax.numpy as jnp

    from ..ops.conv import conv2d, conv_transpose2d_torch
    from ..ops.norm import instance_norm
    from ..ops.pad import reflect_pad_2d
    from ..ops.resize import upsample_nearest

    def run(layers, x):
        pending = None
        for l in layers:
            op = l["op"]
            if op == "conv":
                x = conv2d(x, jnp.asarray(l["w"]), jnp.asarray(l["b"]) if l["b"] is not None else None,
                           stride=l["stride"], padding=l["pad"])
            elif op == "conv_transpose":
                w = jnp.asarray(l["w"])  # (kh,kw,Cout,Cin) after build transpose? see build
                x = conv_transpose2d_torch(x, w, jnp.asarray(l["b"]) if l["b"] is not None else None,
                                           stride=l["stride"], padding=l["pad"], output_padding=l["adj"])
            elif op == "batchnorm":
                mean = jnp.asarray(l["running_mean"]) if l["running_mean"] is not None else 0.0
                var = jnp.asarray(l["running_var"]) if l["running_var"] is not None else 1.0
                y = (x - mean) * jax.lax.rsqrt(var + l["eps"])
                if l["weight"] is not None:
                    y = y * jnp.asarray(l["weight"])
                if l["bias"] is not None:
                    y = y + jnp.asarray(l["bias"])
                x = y
            elif op == "instancenorm":
                x = instance_norm(
                    x,
                    jnp.asarray(l["weight"]) if l["weight"] is not None else jnp.ones(x.shape[-1]),
                    jnp.asarray(l["bias"]) if l["bias"] is not None else jnp.zeros(x.shape[-1]),
                    eps=l["eps"],
                )
            elif op == "reflect_pad":
                x = reflect_pad_2d(x, l["pad"])
            elif op == "zero_pad":
                p = l["pad"]
                x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
            elif op == "relu":
                x = jax.nn.relu(x)
            elif op == "tanh":
                x = jnp.tanh(x)
            elif op == "mul":
                x = x * l["c"]
            elif op == "upsample":
                x = upsample_nearest(x, l["factor"])
            elif op == "concat_table":
                pending = [run(b, x) for b in l["branches"]]
            elif op == "add_table":
                # consumes the preceding ConcatTable's branch outputs
                x = pending[0]
                for o in pending[1:]:
                    x = x + o
                pending = None
            else:
                raise ValueError(op)
        return x

    return run(layers, x)


def load_torch7_model(path: str, io_preset: str = "auto"):
    """Load a .t7 stylizer into a StyleModel-compatible wrapper."""
    from ..engine.stylizer import StyleModel

    net = load_t7(path)
    if not isinstance(net, TorchObject):
        raise ValueError(f"{path}: not a torch nn module")
    layers = build_t7_layers(net)
    if io_preset == "auto":
        io_preset = "caffe_bgr"
    return StyleModel("t7", {"layers": layers}, io_preset, Path(path).stem, "torch7")
