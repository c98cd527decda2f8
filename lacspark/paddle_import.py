"""Import adapter: a published LAC Paddle model directory →
:class:`lacspark.net.BiGruCrf` weights.

The reference ships its tagger as a Paddle inference model
(reference ``python/LAC/models.py:97`` loads it via
``fluid.io.load_inference_model``); this module maps that published
parameter layout into the npz weight schema ``net.BiGruCrf`` runs on,
so a user holding the real downloaded model dir can port it without
Paddle installed.

Parameter layout (reference ``python/LAC/nets.py:100-148``): fluid
auto-names layers in creation order, and ``lex_net`` creates, per
Bi-GRU layer i, the forward pre-projection ``fc_{2i}`` + forward
``gru_{2i}``, then the reverse ``fc_{2i+1}`` + ``gru_{2i+1}`` (built
with ``is_reverse=True``); after ``bigru_num`` layers comes the
emission ``fc_{2*bigru_num}``.  Explicitly named params: ``word_emb``
(the embedding table) and ``crfw`` (the ``[num_labels + 2,
num_labels]`` CRF parameter of ``linear_chain_crf`` /
``crf_decoding`` — row 0 holds the start weights, row 1 the stop
weights, rows 2+ the label-to-label transition matrix).

Gate layout and convention (PaddlePaddle ``fluid.layers.dynamic_gru``,
public docs + ``paddle/fluid/operators/gru_op``): the fc
pre-projection emits ``[x_u | x_r | x_c]`` thirds; the gru weight
``[H, 3H]`` holds ``[W_u | W_r | W_c]`` for the hidden state, and its
bias adds to the fc bias per gate.  Paddle's update gate keeps the
OLD state — ``h_t = u ⊙ h_{t-1} + (1 - u) ⊙ ĉ`` — while
``net.BiGruCrf`` uses the standard ``h_t = (1-z) ⊙ h_{t-1} + z ⊙ ĉ``;
the two are identical under ``z = 1 - u``, which for a sigmoid gate
is a pure sign flip of the u-block weights and bias
(``sigmoid(-a) = 1 - sigmoid(a)``).  The adapter applies that flip,
so imported models are bit-compatible with natively-constructed
weights (proved by the round-trip test in
``tests/test_paddle_import.py``).

File format: each param is one file in the model dir, serialized by
Paddle's ``SerializeToStream`` (``paddle/fluid/framework/
lod_tensor.cc``, public source): ``uint32`` LoD version, ``uint64``
lod_level plus per-level payloads (0 levels for params), then the
tensor stream — ``uint32`` version, ``int32`` proto length, a
``VarType.TensorDesc`` protobuf (``framework.proto``: field 1 =
data_type enum, FP32 = 5; field 2 = repeated int64 dims), then the
raw little-endian buffer.  ``write_paddle_tensor`` emits the same
bytes so tests can fabricate a model dir without Paddle.

Out of scope: the separate rank model directory — the reference's
rank training path is a stub (``models.py:376-379``) and this repo's
rank head is its own extension with a native weight schema.
"""

from __future__ import annotations

import os
import struct

import numpy as np

# VarType.Type values from paddle/fluid/framework/framework.proto
_DTYPE_FP32 = 5
_DTYPE_FP64 = 6
_DTYPE_INT64 = 3
_NP_DTYPES = {_DTYPE_FP32: np.dtype("<f4"), _DTYPE_FP64: np.dtype("<f8"),
              _DTYPE_INT64: np.dtype("<i8")}


def _encode_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _tensor_desc_bytes(dtype_enum: int, dims: tuple[int, ...]) -> bytes:
    # TensorDesc { data_type = 1 (varint); dims = 2 (repeated int64,
    # proto2 → unpacked: one tag per element) }
    out = bytearray(b"\x08" + _encode_varint(dtype_enum))
    for d in dims:
        out += b"\x10" + _encode_varint(d)
    return bytes(out)


def _parse_tensor_desc(buf: bytes) -> tuple[int, list[int]]:
    pos, dtype, dims = 0, None, []
    while pos < len(buf):
        tag, pos = _decode_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 0:
            dtype, pos = _decode_varint(buf, pos)
        elif field == 2 and wire == 0:
            d, pos = _decode_varint(buf, pos)
            dims.append(d)
        elif field == 2 and wire == 2:  # packed variant, be liberal
            ln, pos = _decode_varint(buf, pos)
            end = pos + ln
            while pos < end:
                d, pos = _decode_varint(buf, pos)
                dims.append(d)
        elif wire == 2:  # unknown length-delimited field: skip
            ln, pos = _decode_varint(buf, pos)
            pos += ln
        elif wire == 0:
            _, pos = _decode_varint(buf, pos)
        else:
            raise ValueError(f"unsupported wire type {wire} in TensorDesc")
    if dtype is None:
        raise ValueError("TensorDesc missing data_type")
    return dtype, dims


def read_paddle_tensor(data: bytes) -> np.ndarray:
    """Parse one SerializeToStream'd parameter file."""
    pos = 0
    (_lod_version,) = struct.unpack_from("<I", data, pos)
    pos += 4
    (lod_level,) = struct.unpack_from("<Q", data, pos)
    pos += 8
    for _ in range(lod_level):  # params carry no LoD; tolerate it anyway
        (nbytes,) = struct.unpack_from("<Q", data, pos)
        pos += 8 + nbytes
    (_tensor_version,) = struct.unpack_from("<I", data, pos)
    pos += 4
    (proto_len,) = struct.unpack_from("<i", data, pos)
    pos += 4
    dtype_enum, dims = _parse_tensor_desc(data[pos:pos + proto_len])
    pos += proto_len
    if dtype_enum not in _NP_DTYPES:
        raise ValueError(f"unsupported paddle dtype enum {dtype_enum}")
    dt = _NP_DTYPES[dtype_enum]
    n = int(np.prod(dims)) if dims else 1
    arr = np.frombuffer(data, dtype=dt, count=n, offset=pos)
    return arr.reshape(dims).copy()


def write_paddle_tensor(arr: np.ndarray) -> bytes:
    """Inverse of :func:`read_paddle_tensor` — byte-compatible with
    Paddle's own serialization, used by tests (and by
    :func:`save_paddle_dir`) to fabricate model dirs paddle-free."""
    arr = np.ascontiguousarray(arr)
    enum = {np.dtype("float32"): _DTYPE_FP32,
            np.dtype("float64"): _DTYPE_FP64,
            np.dtype("int64"): _DTYPE_INT64}[arr.dtype]
    desc = _tensor_desc_bytes(enum, arr.shape)
    return (struct.pack("<I", 0) + struct.pack("<Q", 0)
            + struct.pack("<I", 0) + struct.pack("<i", len(desc))
            + desc + arr.astype(arr.dtype.newbyteorder("<")).tobytes())


def load_paddle_params(model_dir: str) -> dict[str, np.ndarray]:
    """Every per-param file in a saved inference model dir (skips the
    ``__model__`` program description, any combined-format leftovers,
    and the non-tensor files real published dirs ship alongside the
    params — ``*.dic`` dictionaries, Paddle-Lite ``*.nb`` blobs,
    the Android layout keeps both next to the weights)."""
    out = {}
    for name in sorted(os.listdir(model_dir)):
        if name.startswith("__") or name.startswith("."):
            continue
        if name.endswith((".dic", ".nb", ".txt", ".ini", ".npz")):
            continue
        path = os.path.join(model_dir, name)
        if not os.path.isfile(path):
            continue
        with open(path, "rb") as fh:
            out[name] = read_paddle_tensor(fh.read())
    return out


def _gate_flip(mat3h: np.ndarray) -> np.ndarray:
    """[..., 3H] paddle (u | r | c) → native (z | r | c) with
    z = 1 - u (sign flip of the u block)."""
    h = mat3h.shape[-1] // 3
    out = mat3h.copy()
    out[..., :h] = -out[..., :h]
    return out


def paddle_params_to_weights(params: dict[str, np.ndarray]
                             ) -> dict[str, np.ndarray]:
    """Published LAC parameter names → BiGruCrf npz weight schema."""
    if "word_emb" not in params or "crfw" not in params:
        raise ValueError("not a LAC model dir: word_emb/crfw missing")
    n_gru = sum(1 for k in params if k.startswith("gru_")
                and k.endswith(".w_0"))
    if n_gru == 0 or n_gru % 2:
        raise ValueError(f"expected fw/bw gru pairs, found {n_gru}")
    n_layers = n_gru // 2
    w: dict[str, np.ndarray] = {
        "emb": params["word_emb"].astype(np.float32)}
    for i in range(n_layers):
        for direction, j in (("fw", 2 * i), ("bw", 2 * i + 1)):
            fc_w = params[f"fc_{j}.w_0"]
            fc_b = params[f"fc_{j}.b_0"].reshape(-1)
            gru_w = params[f"gru_{j}.w_0"]
            gru_b = params[f"gru_{j}.b_0"].reshape(-1)
            w[f"l{i}_{direction}_wx"] = _gate_flip(fc_w).astype(np.float32)
            w[f"l{i}_{direction}_wh"] = _gate_flip(gru_w).astype(np.float32)
            # per-gate biases add (fc pre-projection + gru internal),
            # then the u block flips with its weights
            w[f"l{i}_{direction}_b"] = _gate_flip(
                fc_b + gru_b).astype(np.float32)
    emis = f"fc_{2 * n_layers}"
    w["fc_w"] = params[f"{emis}.w_0"].astype(np.float32)
    w["fc_b"] = params[f"{emis}.b_0"].reshape(-1).astype(np.float32)
    crfw = params["crfw"].astype(np.float32)
    n_labels = crfw.shape[1]
    if crfw.shape[0] != n_labels + 2:
        raise ValueError(f"crfw shape {crfw.shape} != [L+2, L]")
    w["crf_start"] = crfw[0]
    w["crf_stop"] = crfw[1]
    w["crf_trans"] = crfw[2:]
    return w


def weights_to_paddle_params(w: dict[str, np.ndarray]
                             ) -> dict[str, np.ndarray]:
    """Inverse mapping (native npz schema → the published layout).
    The fc/gru bias split is not unique — the gru bias is set to zero
    and the whole per-gate bias carried by the fc, which Paddle's
    forward sums back together."""
    params: dict[str, np.ndarray] = {
        "word_emb": w["emb"].astype(np.float32)}
    n_layers = max(int(k[1]) for k in w if k.startswith("l")
                   and "_" in k) + 1
    for i in range(n_layers):
        for direction, j in (("fw", 2 * i), ("bw", 2 * i + 1)):
            params[f"fc_{j}.w_0"] = _gate_flip(
                w[f"l{i}_{direction}_wx"]).astype(np.float32)
            params[f"fc_{j}.b_0"] = _gate_flip(
                w[f"l{i}_{direction}_b"]).reshape(1, -1).astype(np.float32)
            params[f"gru_{j}.w_0"] = _gate_flip(
                w[f"l{i}_{direction}_wh"]).astype(np.float32)
            params[f"gru_{j}.b_0"] = np.zeros(
                (1, w[f"l{i}_{direction}_b"].size), dtype=np.float32)
    emis = f"fc_{2 * n_layers}"
    params[f"{emis}.w_0"] = w["fc_w"].astype(np.float32)
    params[f"{emis}.b_0"] = w["fc_b"].reshape(1, -1).astype(np.float32)
    params["crfw"] = np.concatenate(
        [w["crf_start"][None, :], w["crf_stop"][None, :],
         w["crf_trans"]]).astype(np.float32)
    return params


def save_paddle_dir(weights: dict[str, np.ndarray], path: str) -> None:
    """Write a Paddle-layout model dir from native weights (test
    fixtures; also a migration escape hatch back to the reference)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "__model__"), "wb") as fh:
        fh.write(b"")  # program desc not needed for the import path
    for name, arr in weights_to_paddle_params(weights).items():
        with open(os.path.join(path, name), "wb") as fh:
            fh.write(write_paddle_tensor(arr))


def paddle_dir_to_npz(model_dir: str, out_path: str) -> None:
    """One-call migration: published LAC Paddle model dir → the npz
    the engine loads (drop it in as resources/lac_weights.npz, or
    pass resource_dir_path to LacEngine)."""
    np.savez(out_path,
             **paddle_params_to_weights(load_paddle_params(model_dir)))
