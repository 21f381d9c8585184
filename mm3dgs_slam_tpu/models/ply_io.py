"""Binary PLY checkpoint I/O, byte-compatible with the reference schema.

Attribute layout (gaussian_model.py:205-257):
  x y z nx ny nz f_dc_{0..2} f_rest_{0..3R-1} opacity scale_{0..2}
  rot_{0..3} rgb_{0..2}           (all float32, little-endian binary)

Row interleaving runs through the native C++ codec (native/ply_codec.cpp,
multithreaded, bound via ctypes) when its shared library is built; a pure
numpy path is the fallback. The emitted format is standard
``binary_little_endian 1.0`` that plyfile/Open3D and the reference's own
loader (gaussian_model.py:266-363) read back.
"""
from __future__ import annotations

import ctypes
import os
import re

import numpy as np

_NATIVE = None


def _native():
    """Lazy-load native/libply_codec.so; None if unavailable."""
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE or None
    lib_path = os.path.join(
        os.path.dirname(__file__), "..", "..", "native", "libply_codec.so"
    )
    try:
        lib = ctypes.CDLL(os.path.abspath(lib_path))
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.ply_pack_rows.argtypes = [ctypes.c_int64] * 3 + [f32p] * 8
        lib.ply_unpack_rows.argtypes = [ctypes.c_int64] * 3 + [f32p] * 8
        lib.ply_row_stride.argtypes = [ctypes.c_int64] * 2
        lib.ply_row_stride.restype = ctypes.c_int64
        _NATIVE = lib
    except OSError:
        _NATIVE = False
    return _NATIVE or None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _attribute_names(n_rest: int) -> list[str]:
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(3 * n_rest)]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(3)]
    names += [f"rot_{i}" for i in range(4)]
    names += [f"rgb_{i}" for i in range(3)]
    return names


def save_ply(
    path: str,
    xyz: np.ndarray,            # [N, 3]
    features_dc: np.ndarray,    # [N, 1, 3]
    features_rest: np.ndarray,  # [N, R, 3]
    opacity: np.ndarray,        # [N, 1]
    scaling: np.ndarray,        # [N, 3]
    rotation: np.ndarray,       # [N, 4]
    rgb: np.ndarray,            # [N, 3]
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = xyz.shape[0]
    n_dc = features_dc.shape[1]
    n_rest = features_rest.shape[1]

    lib = _native()
    if lib is not None and n > 0:
        stride = lib.ply_row_stride(n_dc, n_rest)
        cols = np.empty((n, stride), dtype="<f4")
        args = [
            np.ascontiguousarray(a, dtype=np.float32)
            for a in (xyz, features_dc, features_rest, opacity, scaling,
                      rotation, rgb)
        ]
        lib.ply_pack_rows(n, n_dc, n_rest, *map(_f32p, args), _f32p(cols))
    else:
        # Channel-major flattening (torch .transpose(1,2).flatten(1)): for
        # [N, R, C] SH blocks the reference stores f_*_{c*R + r}.
        f_dc = np.transpose(features_dc, (0, 2, 1)).reshape(n, 3 * n_dc)
        f_rest = np.transpose(features_rest, (0, 2, 1)).reshape(n, 3 * n_rest)
        cols = np.concatenate(
            [xyz, np.zeros_like(xyz), f_dc, f_rest, opacity, scaling,
             rotation, rgb],
            axis=1,
        ).astype("<f4")

    names = _attribute_names(n_rest)
    assert cols.shape[1] == len(names), (cols.shape, len(names))

    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {a}" for a in names]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(np.ascontiguousarray(cols).tobytes())


def load_ply(path: str) -> dict:
    """Read a (reference-schema) binary-little-endian PLY into arrays.

    Returns dict with xyz, features_dc [N,1,3], features_rest [N,R,3],
    opacity [N,1], scaling [N,3], rotation [N,4], rgb [N,3].
    """
    with open(path, "rb") as f:
        data = f.read()
    head_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:head_end].decode("ascii").splitlines()
    assert header[0].strip() == "ply"
    fmt = [l for l in header if l.startswith("format")][0]
    n = int([l for l in header if l.startswith("element vertex")][0].split()[-1])
    props = [l.split()[-1] for l in header if l.startswith("property")]
    types = [l.split()[1] for l in header if l.startswith("property")]
    assert all(t in ("float", "float32") for t in types), "only float32 PLY supported"

    if "binary_little_endian" in fmt:
        arr = np.frombuffer(data[head_end:], dtype="<f4", count=n * len(props))
        arr = arr.reshape(n, len(props))
    else:  # ascii fallback
        arr = np.loadtxt(
            data[head_end:].decode("ascii").splitlines(), dtype=np.float32
        ).reshape(n, len(props))

    col = {name: arr[:, i] for i, name in enumerate(props)}

    def block(prefix):
        names = sorted(
            (p for p in props if re.fullmatch(rf"{prefix}_\d+", p)),
            key=lambda s: int(s.split("_")[-1]),
        )
        return np.stack([col[p] for p in names], axis=1) if names else None

    xyz = np.stack([col["x"], col["y"], col["z"]], axis=1)
    f_dc = block("f_dc")          # [N, 3]
    f_rest_flat = block("f_rest")  # [N, 3R]
    n_rest = f_rest_flat.shape[1] // 3 if f_rest_flat is not None else 0
    # invert channel-major flattening: [N, 3, R] -> [N, R, 3]
    features_dc = f_dc.reshape(n, 3, 1).transpose(0, 2, 1)
    if n_rest:
        features_rest = f_rest_flat.reshape(n, 3, n_rest).transpose(0, 2, 1)
    else:
        features_rest = np.zeros((n, 0, 3), np.float32)

    return {
        "xyz": xyz,
        "features_dc": features_dc,
        "features_rest": features_rest,
        "opacity": col["opacity"][:, None],
        "scaling": block("scale"),
        "rotation": block("rot"),
        "rgb": block("rgb") if "rgb_0" in col else np.zeros((n, 3), np.float32),
    }
