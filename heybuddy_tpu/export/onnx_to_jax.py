"""
Generic ONNX-graph -> jittable JAX function converter.

This is the weight-import path for the reference's frozen models (the Google
speech-embedding conv net, reference ``embeddings.py:23-54``; the Silero VAD
LSTM, reference ``vad.py:9-23``; the torchaudio mel-spectrogram export,
reference ``spectrogram.py:16-21``): parse the ``.onnx`` with the in-repo
protobuf reader (``onnx_proto.py``), then interpret the node list with
``jax.numpy``/``lax`` ops so the whole graph becomes ONE jitted XLA program —
convolutions land on the MXU, elementwise chains fuse, and the function
composes with the rest of the JAX pipeline (vmap/grad/sharding).

Design notes:

* Initializer weights are passed as a params dict (argument, not baked
  constants) so XLA does not inline megabytes of weights into the program.
* Shape-carrying values (``Shape`` outputs, ``Reshape`` targets, axes, pads)
  are evaluated with *numpy* at trace time whenever every input is static, so
  the resulting program has fully static shapes — the TPU requirement.
* ``If`` nodes require a statically-known condition (e.g. the Silero
  sample-rate branch when sr is passed as a python int); data-dependent
  control flow is rejected loudly rather than mis-traced.

Coverage: the conv/LSTM/elementwise/shape op families the three frozen models
and common exporters use. Unsupported ops raise ``NotImplementedError`` naming
the op.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from heybuddy_tpu.export.onnx_proto import OnnxGraph, OnnxModel, parse_model

__all__ = ["OnnxJaxFunction", "load_onnx_function"]

Array = Any  # np.ndarray | jax.Array | tracer


_CAST_DTYPES = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    5: np.int16,
    6: np.int32,
    7: np.int64,
    9: np.bool_,
    10: np.float16,
    11: np.float64,
}


def _is_static(*values: Any) -> bool:
    return all(isinstance(v, (np.ndarray, np.generic, int, float, bool)) for v in values)


def _as_int_list(value: Any) -> List[int]:
    return [int(v) for v in np.asarray(value).reshape(-1)]


class OnnxJaxFunction:
    """
    A parsed ONNX graph as a pure JAX function ``fn(params, *inputs)``.

    ``params`` is the dict of initializer arrays (get the initial value from
    ``.params``); inputs follow ``.input_names`` order. Returns a list of
    outputs in ``.output_names`` order (or a single array if there is one
    output). Wrap with ``jax.jit`` for production use:

        fn = OnnxJaxFunction(parse_model(path))
        jitted = jax.jit(fn)
        out = jitted(fn.params, x)
    """

    def __init__(self, model: Union[OnnxModel, OnnxGraph]) -> None:
        self.graph = model.graph if isinstance(model, OnnxModel) else model
        # Float initializers are the model's weights and travel as the params
        # argument; integer/bool initializers are shape/index helpers that must
        # stay concrete under jit tracing (Reshape targets, axes, slice
        # bounds), so they live in the closure as numpy constants.
        self.params: Dict[str, np.ndarray] = {}
        self.constants: Dict[str, np.ndarray] = {}
        for t in self.graph.initializers:
            arr = np.asarray(t.array)
            if arr.dtype.kind in "iub":
                self.constants[t.name] = arr
            else:
                self.params[t.name] = arr
        self.input_names: List[str] = [
            i.name
            for i in self.graph.inputs
            if i.name not in self.params and i.name not in self.constants
        ]
        self.output_names: List[str] = [o.name for o in self.graph.outputs]

    @classmethod
    def from_file(cls, path: str) -> "OnnxJaxFunction":
        return cls(parse_model(path))

    # ------------------------------------------------------------- execution

    def __call__(self, params: Dict[str, Array], *inputs: Array) -> Any:
        if len(inputs) != len(self.input_names):
            raise ValueError(
                f"Expected {len(self.input_names)} inputs {self.input_names}, got {len(inputs)}"
            )
        values: Dict[str, Array] = dict(self.constants)
        values.update(params)
        for name, value in zip(self.input_names, inputs):
            values[name] = value
        self._run_graph(self.graph, values)
        outs = [values[name] for name in self.output_names]
        return outs[0] if len(outs) == 1 else outs

    def _run_graph(self, graph: OnnxGraph, values: Dict[str, Array]) -> None:
        for node in graph.nodes:
            args = [values[name] if name else None for name in node.inputs]
            results = self._execute(node, args, values)
            if not isinstance(results, (tuple, list)):
                results = (results,)
            for out_name, result in zip(node.outputs, results):
                if out_name:
                    values[out_name] = result

    # ------------------------------------------------------------------- ops

    def _execute(self, node: Any, args: List[Array], values: Dict[str, Array]) -> Any:
        import jax
        import jax.numpy as jnp

        op = node.op_type

        # ---- constants / shape machinery (kept static when possible) ----
        if op == "Constant":
            tensor = node.attr("value")
            if tensor is None:
                for alt in ("value_float", "value_int"):
                    v = node.attr(alt)
                    if v is not None:
                        return np.asarray(v)
                raise NotImplementedError("Constant without value tensor")
            return np.asarray(tensor.array)
        if op == "Shape":
            shape = np.asarray(np.shape(args[0]), dtype=np.int64)
            start = node.attr("start", 0)
            end = node.attr("end")
            return shape[start : None if end is None else end]
        if op == "ConstantOfShape":
            tensor = node.attr("value")
            fill = np.asarray(tensor.array).reshape(-1)[0] if tensor is not None else np.float32(0)
            return np.full(_as_int_list(args[0]), fill)
        if op == "Range":
            if not _is_static(*args):
                # jnp.arange on tracers raises a generic ConcretizationTypeError
                # deep in tracing; keep the module's loud-failure contract.
                raise NotImplementedError(
                    "Range with traced start/limit/delta (shape must be static)"
                )
            return np.arange(
                np.asarray(args[0]).item(), np.asarray(args[1]).item(), np.asarray(args[2]).item()
            )
        if op == "Cast":
            dtype = _CAST_DTYPES[int(node.attr("to", 1))]
            if _is_static(args[0]):
                return np.asarray(args[0]).astype(dtype)
            return args[0].astype(dtype)
        if op == "If":
            cond = args[0]
            if not _is_static(cond):
                raise NotImplementedError(
                    "If with a traced condition; pass the deciding input (e.g. sample "
                    "rate) as a static python/numpy value so the branch folds at trace time"
                )
            branch = node.attr("then_branch") if bool(np.asarray(cond).reshape(-1)[0]) else node.attr(
                "else_branch"
            )
            sub_values = dict(values)  # ONNX subgraphs capture the outer scope
            for t in branch.initializers:
                sub_values[t.name] = np.asarray(t.array)
            self._run_graph(branch, sub_values)
            return tuple(sub_values[o.name] for o in branch.outputs)

        # numpy fast-path for purely-static elementwise/shape arithmetic so
        # downstream Reshape/Slice targets stay concrete under tracing
        if op in _STATIC_SAFE_OPS and _is_static(*[a for a in args if a is not None]):
            return _STATIC_SAFE_OPS[op](node, [np.asarray(a) if a is not None else None for a in args])

        # ---- elementwise ----
        if op == "Add":
            return args[0] + args[1]
        if op == "Sub":
            return args[0] - args[1]
        if op == "Mul":
            return args[0] * args[1]
        if op == "Div":
            a, b = args[0], args[1]
            a_kind = np.asarray(a).dtype.kind if _is_static(a) else a.dtype.kind
            if a_kind in "iu":
                # ONNX integer Div truncates toward zero (C semantics);
                # true division would also change the dtype to float.
                return jax.lax.div(jnp.asarray(a), jnp.asarray(b))
            return a / b
        if op == "Pow":
            return args[0] ** args[1]
        if op == "Sqrt":
            return jnp.sqrt(args[0])
        if op == "Neg":
            return -args[0]
        if op == "Abs":
            return jnp.abs(args[0])
        if op == "Exp":
            return jnp.exp(args[0])
        if op == "Log":
            return jnp.log(args[0])
        if op == "Floor":
            return jnp.floor(args[0])
        if op == "Ceil":
            return jnp.ceil(args[0])
        if op == "Round":
            return jnp.round(args[0])
        if op == "Min":
            out = args[0]
            for a in args[1:]:
                out = jnp.minimum(out, a)
            return out
        if op == "Max":
            out = args[0]
            for a in args[1:]:
                out = jnp.maximum(out, a)
            return out
        if op == "Clip":
            lo = node.attr("min")
            hi = node.attr("max")
            if lo is None and len(args) > 1 and args[1] is not None:
                lo = args[1]
            if hi is None and len(args) > 2 and args[2] is not None:
                hi = args[2]
            return jnp.clip(args[0], lo, hi)
        if op == "Relu":
            return jax.nn.relu(args[0])
        if op == "LeakyRelu":
            return jax.nn.leaky_relu(args[0], node.attr("alpha", 0.01))
        if op == "Elu":
            return jax.nn.elu(args[0], node.attr("alpha", 1.0))
        if op == "Selu":
            return jax.nn.selu(args[0])
        if op == "Softplus":
            return jax.nn.softplus(args[0])
        if op == "Sigmoid":
            return jax.nn.sigmoid(args[0])
        if op == "HardSigmoid":
            alpha = node.attr("alpha", 0.2)
            beta = node.attr("beta", 0.5)
            return jnp.clip(alpha * args[0] + beta, 0.0, 1.0)
        if op == "Tanh":
            return jnp.tanh(args[0])
        if op == "Erf":
            return jax.scipy.special.erf(args[0])
        if op == "PRelu":
            return jnp.where(args[0] > 0, args[0], args[0] * args[1])
        if op == "Softmax":
            return jax.nn.softmax(args[0], axis=node.attr("axis", -1))
        if op == "LogSoftmax":
            return jax.nn.log_softmax(args[0], axis=node.attr("axis", -1))
        if op == "Where":
            return jnp.where(args[0], args[1], args[2])
        if op == "Equal":
            return args[0] == args[1]
        if op == "Greater":
            return args[0] > args[1]
        if op == "GreaterOrEqual":
            return args[0] >= args[1]
        if op == "Less":
            return args[0] < args[1]
        if op == "LessOrEqual":
            return args[0] <= args[1]
        if op == "Not":
            return jnp.logical_not(args[0])
        if op == "And":
            return jnp.logical_and(args[0], args[1])
        if op == "Or":
            return jnp.logical_or(args[0], args[1])

        # ---- linear algebra ----
        if op == "MatMul":
            return jnp.matmul(args[0], args[1])
        if op == "Gemm":
            a = args[0].T if node.attr("transA", 0) else args[0]
            b = args[1].T if node.attr("transB", 0) else args[1]
            out = node.attr("alpha", 1.0) * (a @ b)
            if len(args) > 2 and args[2] is not None:
                out = out + node.attr("beta", 1.0) * args[2]
            return out

        # ---- shape manipulation ----
        if op == "Reshape":
            target = args[1]
            if not _is_static(target):
                raise NotImplementedError("Reshape with traced target shape")
            shape = [
                int(np.shape(args[0])[i]) if int(s) == 0 and node.attr("allowzero", 0) == 0 else int(s)
                for i, s in enumerate(_as_int_list(target))
            ]
            return jnp.reshape(args[0], shape)
        if op == "Flatten":
            axis = int(node.attr("axis", 1))
            shape = np.shape(args[0])
            if axis < 0:  # legal since opset 11: relative to rank
                axis += len(shape)
            lead = int(np.prod(shape[:axis])) if axis > 0 else 1
            return jnp.reshape(args[0], (lead, -1))
        if op == "Transpose":
            perm = node.attr("perm")
            return jnp.transpose(args[0], perm)
        if op == "Squeeze":
            axes = node.attr("axes")
            if axes is None and len(args) > 1 and args[1] is not None:
                axes = _as_int_list(args[1])
            if axes is None:
                return jnp.squeeze(args[0])
            return jnp.squeeze(args[0], axis=tuple(int(a) for a in axes))
        if op == "Unsqueeze":
            axes = node.attr("axes")
            if axes is None:
                axes = _as_int_list(args[1])
            # Negative axes are relative to the OUTPUT rank (input rank +
            # len(axes)); normalizing per-insert mishandled multiple axes.
            out = args[0]
            out_rank = np.ndim(out) + len(list(axes))
            for a in sorted(int(x) % out_rank for x in axes):
                out = jnp.expand_dims(out, a)
            return out
        if op == "Concat":
            return jnp.concatenate([a for a in args if a is not None], axis=node.attr("axis", 0))
        if op == "Split":
            axis = node.attr("axis", 0)
            splits = node.attr("split")
            if splits is None and len(args) > 1 and args[1] is not None:
                splits = _as_int_list(args[1])
            dim = np.shape(args[0])[axis]
            if splits is None:
                n_out = max(len(node.outputs), node.attr("num_outputs", len(node.outputs)) or 1)
                size = -(-dim // n_out)
                splits = [size] * (n_out - 1) + [dim - size * (n_out - 1)]
            points = np.cumsum(splits)[:-1].tolist()
            return tuple(jnp.split(args[0], points, axis=axis))
        if op == "Slice":
            if node.attr("starts") is not None:  # opset < 10: attributes
                starts = node.attr("starts")
                ends = node.attr("ends")
                axes = node.attr("axes", list(range(len(starts))))
                steps = [1] * len(starts)
            else:
                if not _is_static(*[a for a in args[1:] if a is not None]):
                    raise NotImplementedError("Slice with traced indices")
                starts = _as_int_list(args[1])
                ends = _as_int_list(args[2])
                axes = _as_int_list(args[3]) if len(args) > 3 and args[3] is not None else list(
                    range(len(starts))
                )
                steps = _as_int_list(args[4]) if len(args) > 4 and args[4] is not None else [1] * len(
                    starts
                )
            slices: List[slice] = [slice(None)] * np.ndim(args[0])
            for s, e, a, st in zip(starts, ends, axes, steps):
                # clamp the INT64_MAX sentinels exporters use for "to the end"
                s = max(min(s, np.iinfo(np.int32).max), np.iinfo(np.int32).min)
                e = max(min(e, np.iinfo(np.int32).max), np.iinfo(np.int32).min)
                slices[int(a)] = slice(s, e, st)
            return args[0][tuple(slices)]
        if op == "Gather":
            axis = node.attr("axis", 0)
            idx = args[1]
            if _is_static(idx):
                idx = np.asarray(idx).astype(np.int64)
            return jnp.take(args[0], idx, axis=axis)
        if op == "GatherElements":
            return jnp.take_along_axis(
                args[0], args[1].astype(np.int64) if _is_static(args[1]) else args[1],
                axis=node.attr("axis", 0),
            )
        if op == "Expand":
            target = _as_int_list(args[1])
            shape = list(np.shape(args[0]))
            rank = max(len(target), len(shape))
            shape = [1] * (rank - len(shape)) + shape
            target = [1] * (rank - len(target)) + target
            out_shape = [max(s, t) for s, t in zip(shape, target)]
            return jnp.broadcast_to(jnp.reshape(args[0], shape), out_shape)
        if op == "Tile":
            return jnp.tile(args[0], _as_int_list(args[1]))
        if op == "Pad":
            mode = node.attr("mode", "constant")
            if isinstance(mode, bytes):
                mode = mode.decode()
            pads = node.attr("pads")
            if pads is None:
                if not _is_static(args[1]):
                    raise NotImplementedError("Pad with traced pads")
                pads = _as_int_list(args[1])
            rank = np.ndim(args[0])
            pairs = [(int(pads[i]), int(pads[i + rank])) for i in range(rank)]
            cval = 0.0
            if len(args) > 2 and args[2] is not None:
                cval = float(np.asarray(args[2]).reshape(-1)[0]) if _is_static(args[2]) else args[2]
            if mode == "constant":
                return jnp.pad(args[0], pairs, constant_values=cval)
            return jnp.pad(args[0], pairs, mode={"reflect": "reflect", "edge": "edge"}[mode])

        # ---- reductions ----
        if op in ("ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin", "ReduceProd"):
            axes = node.attr("axes")
            if axes is None and len(args) > 1 and args[1] is not None:
                axes = _as_int_list(args[1])
            if axes is not None and len(list(axes)) == 0:
                # Explicit empty axes = reduce ALL dims unless the graph opts
                # into noop semantics (axis=() would be a silent identity).
                axes = None if not node.attr("noop_with_empty_axes", 0) else []
                if axes == []:
                    return args[0]
            axes_t = tuple(int(a) for a in axes) if axes is not None else None
            keep = bool(node.attr("keepdims", 1))
            fn = {
                "ReduceMean": jnp.mean,
                "ReduceSum": jnp.sum,
                "ReduceMax": jnp.max,
                "ReduceMin": jnp.min,
                "ReduceProd": jnp.prod,
            }[op]
            return fn(args[0], axis=axes_t, keepdims=keep)
        if op == "ArgMax":
            out = jnp.argmax(args[0], axis=node.attr("axis", 0))
            return jnp.expand_dims(out, node.attr("axis", 0)) if node.attr("keepdims", 1) else out

        # ---- convolution / pooling / normalization ----
        if op == "Conv":
            return self._conv(node, args)
        if op == "ConvTranspose":
            raise NotImplementedError("ConvTranspose not needed by the frozen models")
        if op in ("MaxPool", "AveragePool"):
            return self._pool(node, args[0], op)
        if op == "GlobalAveragePool":
            spatial = tuple(range(2, np.ndim(args[0])))
            return jnp.mean(args[0], axis=spatial, keepdims=True)
        if op == "GlobalMaxPool":
            spatial = tuple(range(2, np.ndim(args[0])))
            return jnp.max(args[0], axis=spatial, keepdims=True)
        if op == "BatchNormalization":
            x, scale, bias, mean, var = args[:5]
            eps = node.attr("epsilon", 1e-5)
            shape = [1, -1] + [1] * (np.ndim(x) - 2)
            inv = 1.0 / jnp.sqrt(var + eps)
            return (x - mean.reshape(shape)) * (scale * inv).reshape(shape) + bias.reshape(shape)
        if op == "InstanceNormalization":
            x, scale, bias = args[:3]
            eps = node.attr("epsilon", 1e-5)
            spatial = tuple(range(2, np.ndim(x)))
            mean = jnp.mean(x, axis=spatial, keepdims=True)
            var = jnp.var(x, axis=spatial, keepdims=True)
            shape = [1, -1] + [1] * (np.ndim(x) - 2)
            return (x - mean) / jnp.sqrt(var + eps) * scale.reshape(shape) + bias.reshape(shape)
        if op == "LayerNormalization":
            x, scale = args[0], args[1]
            bias = args[2] if len(args) > 2 and args[2] is not None else None
            axis = node.attr("axis", -1)
            eps = node.attr("epsilon", 1e-5)
            axes = tuple(range(axis % np.ndim(x), np.ndim(x)))
            mean = jnp.mean(x, axis=axes, keepdims=True)
            var = jnp.var(x, axis=axes, keepdims=True)
            out = (x - mean) / jnp.sqrt(var + eps) * scale
            return out + bias if bias is not None else out

        # ---- recurrent ----
        if op == "LSTM":
            return self._lstm(node, args)
        if op == "GRU":
            raise NotImplementedError("GRU not needed by the frozen models")

        if op == "Identity":
            return args[0]
        if op == "Dropout":
            return args[0]

        raise NotImplementedError(f"ONNX op not supported by the JAX converter: {op}")

    # --------------------------------------------------------------- conv ops

    @staticmethod
    def _conv_padding(
        node: Any, x_spatial: Sequence[int], k_spatial: Sequence[int],
        strides: Sequence[int], dilations: Sequence[int],
    ) -> List[Tuple[int, int]]:
        auto_pad = node.attr("auto_pad", "NOTSET")
        if isinstance(auto_pad, bytes):
            auto_pad = auto_pad.decode()
        n = len(k_spatial)
        if auto_pad in ("NOTSET", "", None):
            pads = node.attr("pads", [0] * (2 * n))
            return [(int(pads[i]), int(pads[i + n])) for i in range(n)]
        if auto_pad == "VALID":
            return [(0, 0)] * n
        # SAME_UPPER / SAME_LOWER
        out = []
        for size, k, s, d in zip(x_spatial, k_spatial, strides, dilations):
            eff_k = (k - 1) * d + 1
            out_size = -(-size // s)
            total = max(0, (out_size - 1) * s + eff_k - size)
            if auto_pad == "SAME_UPPER":
                out.append((total // 2, total - total // 2))
            else:
                out.append((total - total // 2, total // 2))
        return out

    def _conv(self, node: Any, args: List[Array]) -> Array:
        import jax.numpy as jnp
        from jax import lax

        x, w = args[0], args[1]
        b = args[2] if len(args) > 2 and args[2] is not None else None
        n_spatial = np.ndim(w) - 2
        strides = [int(s) for s in node.attr("strides", [1] * n_spatial)]
        dilations = [int(d) for d in node.attr("dilations", [1] * n_spatial)]
        group = int(node.attr("group", 1))
        padding = self._conv_padding(
            node, np.shape(x)[2:], np.shape(w)[2:], strides, dilations
        )
        spatial_chars = "DHW"[-n_spatial:] if n_spatial <= 3 else None
        if spatial_chars is None:
            raise NotImplementedError(f"{n_spatial}-D convolution")
        dn = lax.conv_dimension_numbers(
            np.shape(x), np.shape(w),
            ("NC" + spatial_chars, "OI" + spatial_chars, "NC" + spatial_chars),
        )
        out = lax.conv_general_dilated(
            x, w, window_strides=strides, padding=padding,
            rhs_dilation=dilations, dimension_numbers=dn,
            feature_group_count=group,
        )
        if b is not None:
            out = out + jnp.reshape(b, (1, -1) + (1,) * n_spatial)
        return out

    def _pool(self, node: Any, x: Array, op: str) -> Array:
        import jax.numpy as jnp
        from jax import lax

        kernel = [int(k) for k in node.attr("kernel_shape")]
        n = len(kernel)
        strides = [int(s) for s in node.attr("strides", [1] * n)]
        dilations = [int(d) for d in node.attr("dilations", [1] * n)]
        if any(d != 1 for d in dilations):
            raise NotImplementedError("Pooling dilation")
        if node.attr("ceil_mode", 0):
            # Silently flooring would return a shorter output than the graph
            # specifies; fail loudly per the module contract.
            raise NotImplementedError("Pooling ceil_mode=1")
        padding = self._conv_padding(node, np.shape(x)[2:], kernel, strides, dilations)
        window = (1, 1) + tuple(kernel)
        strides_full = (1, 1) + tuple(strides)
        pads_full = ((0, 0), (0, 0)) + tuple(padding)
        if op == "MaxPool":
            return lax.reduce_window(
                x, -jnp.inf, lax.max, window, strides_full, pads_full
            )
        summed = lax.reduce_window(x, 0.0, lax.add, window, strides_full, pads_full)
        if node.attr("count_include_pad", 0):
            return summed / float(np.prod(kernel))
        ones = jnp.ones(np.shape(x), x.dtype if hasattr(x, "dtype") else jnp.float32)
        counts = lax.reduce_window(ones, 0.0, lax.add, window, strides_full, pads_full)
        return summed / counts

    # --------------------------------------------------------------- LSTM

    def _lstm(self, node: Any, args: List[Array]) -> Tuple[Array, Array, Array]:
        """
        ONNX LSTM (gate order i, o, f, c — NOT torch's i, f, g, o), forward or
        bidirectional, returning (Y [seq, dirs, batch, hidden], Y_h, Y_c).
        Used by the Silero VAD import (reference vad.py:22-23 h/c [2,1,64]).
        """
        import jax
        import jax.numpy as jnp

        x, w, r = args[0], args[1], args[2]
        n_dirs = np.shape(w)[0]
        hidden = int(node.attr("hidden_size", np.shape(r)[2]))
        seq_len, batch = np.shape(x)[0], np.shape(x)[1]
        b = args[3] if len(args) > 3 and args[3] is not None else None
        h0 = args[5] if len(args) > 5 and args[5] is not None else jnp.zeros(
            (n_dirs, batch, hidden), jnp.float32
        )
        c0 = args[6] if len(args) > 6 and args[6] is not None else jnp.zeros(
            (n_dirs, batch, hidden), jnp.float32
        )
        if len(args) > 4 and args[4] is not None:
            # Scanning the full padded length would silently corrupt Y/Y_h/Y_c
            # for every sequence shorter than the pad.
            raise NotImplementedError("LSTM sequence_lens input")
        if len(args) > 7 and args[7] is not None:
            raise NotImplementedError("LSTM peephole weights")
        direction = node.attr("direction", "forward")
        if isinstance(direction, bytes):
            direction = direction.decode()

        def run_direction(d: int, reverse: bool) -> Tuple[Array, Array, Array]:
            wd, rd = w[d], r[d]  # [4H, input], [4H, H]
            bias = (b[d][: 4 * hidden] + b[d][4 * hidden :]) if b is not None else 0.0

            def cell(carry: Tuple[Array, Array], xt: Array):
                h_prev, c_prev = carry
                gates = xt @ wd.T + h_prev @ rd.T + bias
                i, o, f, g = jnp.split(gates, 4, axis=-1)
                c_new = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
                h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
                return (h_new, c_new), h_new

            (h_fin, c_fin), ys = jax.lax.scan(
                cell, (h0[d], c0[d]), x, reverse=reverse
            )
            return ys, h_fin, c_fin

        if direction == "forward":
            ys, h_fin, c_fin = run_direction(0, False)
            return ys[:, None], h_fin[None], c_fin[None]
        if direction == "reverse":
            ys, h_fin, c_fin = run_direction(0, True)
            return ys[:, None], h_fin[None], c_fin[None]
        # bidirectional
        ys_f, h_f, c_f = run_direction(0, False)
        ys_b, h_b, c_b = run_direction(1, True)
        ys = jnp.stack([ys_f, ys_b], axis=1)
        return ys, jnp.stack([h_f, h_b]), jnp.stack([c_f, c_b])


# Ops safe to fold with numpy when every input is static (keeps shape
# arithmetic concrete through Reshape/Slice/Pad targets under jit tracing).
def _np_binop(fn: Callable[..., np.ndarray]) -> Callable[[Any, List[Optional[np.ndarray]]], np.ndarray]:
    return lambda node, args: fn(*[a for a in args if a is not None])


_STATIC_SAFE_OPS: Dict[str, Callable[[Any, List[Optional[np.ndarray]]], np.ndarray]] = {
    "Add": _np_binop(np.add),
    "Sub": _np_binop(np.subtract),
    "Mul": _np_binop(np.multiply),
    # ONNX integer Div truncates toward zero (C semantics), NOT numpy floor:
    # Div(-7, 2) must be -3, not -4.
    "Div": _np_binop(
        lambda a, b: np.trunc(np.true_divide(a, b)).astype(a.dtype)
        if a.dtype.kind in "iu" and b.dtype.kind in "iu"
        else a / b
    ),
    "Concat": lambda node, args: np.concatenate(
        [a for a in args if a is not None], axis=node.attr("axis", 0)
    ),
    "Gather": lambda node, args: np.take(
        args[0], args[1].astype(np.int64), axis=node.attr("axis", 0)
    ),
    "Squeeze": lambda node, args: np.squeeze(
        args[0],
        axis=tuple(
            int(a)
            for a in (
                node.attr("axes")
                if node.attr("axes") is not None
                else (args[1] if len(args) > 1 and args[1] is not None else [])
            )
        )
        or None,
    ),
    "Unsqueeze": lambda node, args: np.expand_dims(
        args[0],
        tuple(
            int(a)
            for a in (
                node.attr("axes") if node.attr("axes") is not None else args[1]
            )
        ),
    ),
    "Slice": lambda node, args: _np_slice(node, args),
}


def _np_slice(node: Any, args: List[Optional[np.ndarray]]) -> np.ndarray:
    if node.attr("starts") is not None:
        starts = node.attr("starts")
        ends = node.attr("ends")
        axes = node.attr("axes", list(range(len(starts))))
        steps = [1] * len(starts)
    else:
        starts = _as_int_list(args[1])
        ends = _as_int_list(args[2])
        axes = _as_int_list(args[3]) if len(args) > 3 and args[3] is not None else list(
            range(len(starts))
        )
        steps = _as_int_list(args[4]) if len(args) > 4 and args[4] is not None else [1] * len(starts)
    slices: List[slice] = [slice(None)] * np.ndim(args[0])
    for s, e, a, st in zip(starts, ends, axes, steps):
        s = max(min(s, np.iinfo(np.int32).max), np.iinfo(np.int32).min)
        e = max(min(e, np.iinfo(np.int32).max), np.iinfo(np.int32).min)
        slices[int(a)] = slice(s, e, st)
    return np.asarray(args[0])[tuple(slices)]


def load_onnx_function(path: str) -> OnnxJaxFunction:
    """Parse ``path`` and return the JAX function wrapper."""
    return OnnxJaxFunction.from_file(path)
