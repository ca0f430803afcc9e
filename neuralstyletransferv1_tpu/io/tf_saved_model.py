"""TF SavedModel → JAX: variable reader + GraphDef executor.

The reference's magenta backend is the TF-Hub ``arbitrary-image-stylization
-v1-256/2`` SavedModel, driven through tensorflow_hub (reference:
pipeline.py:153-168; artifact at models/magenta/f843094219bf.../). This
module replaces the TF runtime: the SavedModel's function graph (2340 nodes
— InceptionV3→Mixed_6e style predictor, 20-residual conditional-IN transfer
net) is interpreted ONCE into a jittable JAX function, exactly — no
hand-transcribed architecture to drift.

Design mirrors io/t7.py and io/caffe.py: parse the serialized graph
first-party (protobuf via tensorflow.core.protobuf — TF is used only as a
proto/checkpoint *reader*, never as an executor), then evaluate the op
graph in jnp. Shape-arithmetic ops (Shape/StridedSlice/Pack and int Mul)
evaluate host-side so resize sizes stay static under jit.

Checkpoint key mapping: the TF2 object graph numbers variables
(``variables/N/.ATTRIBUTES/VARIABLE_VALUE``); the SavedModel's
object_graph_def recovers each number's semantic name
(e.g. ``transformer/contract/conv1/weights``).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

# Ops whose outputs are host-side shape arithmetic, never device tensors.
_HOST_OPS = {"Shape", "StridedSlice", "Pack"}


def _tf_protos():
    from tensorflow.core.protobuf import saved_model_pb2

    return saved_model_pb2


def load_saved_model_proto(model_dir: str | Path):
    saved_model_pb2 = _tf_protos()
    sm = saved_model_pb2.SavedModel()
    sm.ParseFromString((Path(model_dir) / "saved_model.pb").read_bytes())
    return sm.meta_graphs[0]


def checkpoint_name_map(meta_graph) -> dict[str, str]:
    """checkpoint key → semantic variable name, from object_graph_def."""
    og = meta_graph.object_graph_def
    root = og.nodes[0]
    out = {}

    def walk(idx, path):
        node = og.nodes[idx]
        if node.WhichOneof("kind") == "variable":
            # TF2 object-path checkpoint key convention
            out[f"{path}/.ATTRIBUTES/VARIABLE_VALUE"] = node.variable.name
        for child in node.children:
            walk(child.node_id, (path + "/" if path else "") + child.local_name)

    walk(0, "")
    return out


def load_variables(model_dir: str | Path) -> dict[str, np.ndarray]:
    """semantic name → array, read from the SavedModel's checkpoint."""
    import tensorflow as tf

    mg = load_saved_model_proto(model_dir)
    name_map = checkpoint_name_map(mg)
    rdr = tf.train.load_checkpoint(str(Path(model_dir) / "variables" / "variables"))
    out = {}
    for key, semantic in name_map.items():
        out[semantic] = np.asarray(rdr.get_tensor(key))
    return out


def _const_ndarray(node):
    from tensorflow.python.framework import tensor_util

    return tensor_util.MakeNdarray(node.attr["value"].tensor)


def _resolve_call_chain(meta_graph):
    """Find the serving function + ordered (placeholder/variable) arg names.

    Follows outer StatefulPartitionedCall → signature wrapper → inner call,
    so each function arg is matched to the outer graph's VarHandleOp name.
    """
    gd = meta_graph.graph_def
    funcs = {f.signature.name: f for f in gd.library.function}
    outer_call = next(n for n in gd.node if n.op == "StatefulPartitionedCall")
    outer_inputs = [i.split(":")[0] for i in outer_call.input]
    fname = outer_call.attr["f"].func.name
    fn = funcs[fname]
    # descend through wrapper calls until a function with real compute
    while True:
        calls = [n for n in fn.node_def if n.op == "StatefulPartitionedCall"]
        if len(calls) != 1 or len(fn.node_def) > 4:
            break
        call = calls[0]
        arg_names = [a.name for a in fn.signature.input_arg]
        pos = {name: i for i, name in enumerate(arg_names)}
        outer_inputs = [outer_inputs[pos[i.split(":")[0]]] for i in call.input]
        fn = funcs[call.attr["f"].func.name]
    return fn, outer_inputs


def _ref_node(ref: str) -> str:
    return ref.split(":")[0]


class TFGraphExecutor:
    """Jittable executor for a SavedModel's inference function."""

    def __init__(self, model_dir: str | Path, variables: dict[str, np.ndarray] | None = None):
        mg = load_saved_model_proto(model_dir)
        self.fn, self.arg_sources = _resolve_call_chain(mg)
        self.variables = variables if variables is not None else load_variables(model_dir)
        sig = mg.signature_def["serving_default"]
        # placeholder args (non-variable outer inputs)
        gd_nodes = {n.name: n for n in mg.graph_def.node}
        self.placeholder_args = [
            i for i, src in enumerate(self.arg_sources)
            if gd_nodes.get(src) is not None and gd_nodes[src].op == "Placeholder"
        ]
        self.output_refs = dict(self.fn.ret)

    def _run(self, placeholders: dict[int, jnp.ndarray]):
        """Evaluate the function graph; returns {ret_name: tensor}."""
        env: dict[str, object] = {}
        arg_names = [a.name for a in self.fn.signature.input_arg]
        for i, (arg, src) in enumerate(zip(arg_names, self.arg_sources)):
            if i in placeholders:
                env[arg] = placeholders[i]
            else:
                env[arg] = jnp.asarray(self.variables[src])

        for node in self.fn.node_def:
            op = node.op
            name = node.name
            ins = [env[_ref_node(i)] for i in node.input if not i.startswith("^")]
            if op == "Const":
                env[name] = _const_ndarray(node)
            elif op in ("Identity", "CheckNumerics", "StopGradient", "ReadVariableOp"):
                env[name] = ins[0]
            elif op == "NoOp":
                env[name] = None
            elif op == "Conv2D":
                strides = list(node.attr["strides"].list.i)
                pad = node.attr["padding"].s.decode()
                env[name] = jax.lax.conv_general_dilated(
                    ins[0], ins[1], window_strides=strides[1:3], padding=pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                ).astype(ins[0].dtype)
            elif op == "FusedBatchNormV3":
                x, scale, offset, mean, var = ins[:5]
                eps = node.attr["epsilon"].f
                env[name] = (x - mean) * jax.lax.rsqrt(var + eps) * scale + offset
            elif op == "BiasAdd":
                env[name] = ins[0] + ins[1]
            elif op == "Relu":
                env[name] = jax.nn.relu(ins[0])
            elif op == "Relu6":
                env[name] = jnp.clip(ins[0], 0.0, 6.0)
            elif op == "Sigmoid":
                env[name] = jax.nn.sigmoid(ins[0])
            elif op in ("MaxPool", "AvgPool"):
                ks = list(node.attr["ksize"].list.i)
                st = list(node.attr["strides"].list.i)
                pad = node.attr["padding"].s.decode()
                if op == "MaxPool":
                    env[name] = jax.lax.reduce_window(
                        ins[0], -jnp.inf, jax.lax.max, ks, st, pad)
                else:
                    s = jax.lax.reduce_window(ins[0], 0.0, jax.lax.add, ks, st, pad)
                    c = jax.lax.reduce_window(jnp.ones_like(ins[0]), 0.0, jax.lax.add, ks, st, pad)
                    env[name] = s / c
            elif op == "ConcatV2":
                axis = int(np.asarray(ins[-1]))
                env[name] = jnp.concatenate(ins[:-1], axis=axis)
            elif op == "Mean":
                axes = tuple(int(a) for a in np.ravel(np.asarray(ins[1])))
                env[name] = jnp.mean(ins[0], axis=axes,
                                     keepdims=node.attr["keep_dims"].b)
            elif op == "MirrorPad":
                pads = np.asarray(ins[1])
                env[name] = jnp.pad(ins[0], [(int(a), int(b)) for a, b in pads],
                                    mode="reflect")
            elif op == "ResizeNearestNeighbor":
                assert not node.attr["align_corners"].b
                assert not node.attr["half_pixel_centers"].b
                size = [int(v) for v in np.ravel(np.asarray(ins[1]))]
                x = ins[0]
                h_in, w_in = x.shape[1], x.shape[2]
                # TF legacy nearest: src = floor(dst * in/out), clamped
                ih = np.minimum((np.arange(size[0]) * h_in / size[0]).astype(np.int32), h_in - 1)
                iw = np.minimum((np.arange(size[1]) * w_in / size[1]).astype(np.int32), w_in - 1)
                env[name] = x[:, ih][:, :, iw]
            elif op == "AddV2":
                env[name] = ins[0] + ins[1]
            elif op == "Sub":
                env[name] = ins[0] - ins[1]
            elif op == "Mul":
                if all(isinstance(v, np.ndarray) or np.isscalar(v) for v in ins):
                    env[name] = np.multiply(ins[0], ins[1])
                else:
                    env[name] = ins[0] * ins[1]
            elif op == "Rsqrt":
                env[name] = jax.lax.rsqrt(ins[0])
            elif op == "SquaredDifference":
                env[name] = jnp.square(ins[0] - ins[1])
            elif op == "ExpandDims":
                env[name] = jnp.expand_dims(ins[0], int(np.asarray(ins[1])))
            elif op == "Squeeze":
                dims = tuple(node.attr["squeeze_dims"].list.i)
                env[name] = jnp.squeeze(ins[0], axis=dims if dims else None)
            elif op == "Shape":
                env[name] = np.asarray(ins[0].shape, np.int32)
            elif op == "StridedSlice":
                # shape-arithmetic only (1-D int arrays)
                arr = np.asarray(ins[0])
                b, e, s = (int(np.ravel(np.asarray(v))[0]) for v in ins[1:4])
                if node.attr["shrink_axis_mask"].i:
                    env[name] = arr[b]
                else:
                    env[name] = arr[b:e:s]
            elif op == "Pack":
                env[name] = np.stack([np.asarray(v) for v in ins])
            else:
                raise NotImplementedError(f"TF op {op} ({name})")
        return {ret: env[_ref_node(src)] for ret, src in self.output_refs.items()}

    def forward(self, content: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
        """(content NHWC [0,1], style NHWC [0,1]) → stylized NHWC [0,1]."""
        i_c, i_s = self.placeholder_args[0], self.placeholder_args[1]
        outs = self._run({i_c: content, i_s: style})
        return next(iter(outs.values()))
