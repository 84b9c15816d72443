"""Minimal TensorFlow frozen-graph (.pb GraphDef) reader — no TF needed.

The reference evaluates trained DeepMD models from frozen TensorFlow
graphs (/root/reference/sclmd/deepmddriver.py:61-64 ``DeepPot(...pb)``).
This container has no TensorFlow, so reference users' trained .pb files
are ingested by parsing the protobuf WIRE FORMAT directly: a frozen
GraphDef stores every weight as a ``Const`` node whose ``value`` attr
holds a TensorProto. Only the handful of message fields a frozen
inference graph actually uses are implemented.

Wire schema (tensorflow/core/framework/{graph,node_def,tensor,...}.proto):

    GraphDef:        node = 1 (repeated NodeDef)
    NodeDef:         name = 1, op = 2, input = 3 (repeated), device = 4,
                     attr = 5 (map<string, AttrValue>)
    AttrValue:       list = 1, s = 2, i = 3, f = 4, b = 5, type = 6,
                     shape = 7, tensor = 8
    TensorProto:     dtype = 1, tensor_shape = 2, tensor_content = 4,
                     float_val = 5, double_val = 6, int_val = 7,
                     string_val = 8, int64_val = 10
    TensorShapeProto: dim = 2 (repeated Dim), Dim: size = 1, name = 2

Floats/doubles in ``tensor_content`` are little-endian (TF writes host
byte order; x86/ARM LE in practice).
"""

from __future__ import annotations

import numpy as np

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5

# TF DataType enum -> numpy dtype (the ones a DeepMD graph contains)
_DTYPES = {
    1: np.float32,      # DT_FLOAT
    2: np.float64,      # DT_DOUBLE
    3: np.int32,        # DT_INT32
    7: np.bytes_,       # DT_STRING
    9: np.int64,        # DT_INT64
    10: np.bool_,       # DT_BOOL
}


def _read_varint(buf: bytes, pos: int):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one message buffer.
    LEN fields yield bytes; varints ints; fixed32/64 raw bytes."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        fno, wt = key >> 3, key & 7
        if wt == _WT_VARINT:
            val, pos = _read_varint(buf, pos)
        elif wt == _WT_LEN:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == _WT_I64:
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == _WT_I32:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, val


def _parse_shape(buf: bytes):
    dims = []
    for fno, _, val in _fields(buf):
        if fno == 2:                       # Dim
            size = 0
            for f2, _, v2 in _fields(val):
                if f2 == 1:
                    # Dim.size is int64 (zigzag NOT used); varint
                    size = v2
            dims.append(int(size))
    return tuple(dims)


def _parse_tensor(buf: bytes):
    """TensorProto -> numpy array (or bytes list for DT_STRING)."""
    dtype_enum = 1
    shape = ()
    content = b""
    f32s, f64s, i32s, i64s, strs = [], [], [], [], []
    for fno, wt, val in _fields(buf):
        if fno == 1:
            dtype_enum = val
        elif fno == 2:
            shape = _parse_shape(val)
        elif fno == 4:
            content = val
        elif fno == 5:                     # float_val (packed or not)
            if wt == _WT_LEN:
                f32s.extend(np.frombuffer(val, "<f4").tolist())
            else:
                f32s.append(np.frombuffer(val, "<f4")[0])
        elif fno == 6:
            if wt == _WT_LEN:
                f64s.extend(np.frombuffer(val, "<f8").tolist())
            else:
                f64s.append(np.frombuffer(val, "<f8")[0])
        elif fno == 7:
            if wt == _WT_LEN:
                pos = 0
                while pos < len(val):
                    v, pos = _read_varint(val, pos)
                    i32s.append(v)
            else:
                i32s.append(val)
        elif fno == 8:
            strs.append(val)
        elif fno == 10:
            if wt == _WT_LEN:
                pos = 0
                while pos < len(val):
                    v, pos = _read_varint(val, pos)
                    i64s.append(v)
            else:
                i64s.append(val)
    np_dtype = _DTYPES.get(int(dtype_enum))
    if np_dtype is np.bytes_:
        return strs[0] if len(strs) == 1 and shape == () else strs
    if np_dtype is None:
        raise ValueError(f"unsupported TensorProto dtype {dtype_enum}")
    count = int(np.prod(shape)) if shape else 1
    if content:
        arr = np.frombuffer(content, np.dtype(np_dtype).newbyteorder("<"))
    elif f32s or f64s or i32s or i64s:
        arr = np.asarray(f32s or f64s or i32s or i64s, dtype=np_dtype)
        if arr.size == 1 and count > 1:    # splat-encoded constant
            arr = np.full(count, arr[0], dtype=np_dtype)
    else:
        arr = np.zeros(count, dtype=np_dtype)
    return arr.astype(np_dtype).reshape(shape)


def _parse_attr(buf: bytes):
    """AttrValue -> python value (tensor/np array, int, float, bytes)."""
    for fno, wt, val in _fields(buf):
        if fno == 8:
            return _parse_tensor(val)
        if fno == 2:
            return val                     # bytes
        if fno == 3:
            return int(val)
        if fno == 4:
            return float(np.frombuffer(val, "<f4")[0])
        if fno == 5:
            return bool(val)
        if fno == 6:
            return ("dtype", int(val))
    return None


def read_graph_consts(path_or_bytes):
    """Extract every Const node from a frozen GraphDef.

    Returns {node_name: value} where value is a numpy array (weights),
    bytes (string constants such as DeepMD's model_attr/tmap), or a
    scalar. Non-Const nodes are listed (name -> op) in the companion
    dict for graph-shape introspection.
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as fh:
            buf = fh.read()
    consts, ops = {}, {}
    for fno, _, node_buf in _fields(buf):
        if fno != 1:
            continue
        name, op = None, None
        attrs = {}
        for f2, _, v2 in _fields(node_buf):
            if f2 == 1:
                name = v2.decode("utf-8", "replace")
            elif f2 == 2:
                op = v2.decode("utf-8", "replace")
            elif f2 == 5:                  # attr map entry
                k, av = None, None
                for f3, _, v3 in _fields(v2):
                    if f3 == 1:
                        k = v3.decode("utf-8", "replace")
                    elif f3 == 2:
                        av = _parse_attr(v3)
                if k is not None:
                    attrs[k] = av
        if name is None:
            continue
        ops[name] = op
        if op == "Const" and "value" in attrs:
            consts[name] = attrs["value"]
    return consts, ops
