"""Orbax checkpoint backend for ModelCollection blobs.

The npz backend is perfect for small collections; orbax
(``orbax.checkpoint``) is the production option — async-capable,
content-addressed, and sharded-array-aware, the JAX ecosystem's standard
replacement for the reference's pickles (SURVEY §5.4).

Orbax's StandardCheckpointer stores numeric arrays; datetime64 and unicode
blobs are transported as raw byte views with a dtype sidecar, restored
exactly on load.
"""

from __future__ import annotations

import typing as tp

import numpy as np

_SEP = "__SLASH__"  # orbax tree keys cannot contain '/'


def _encode(v: np.ndarray) -> tp.Dict[str, np.ndarray]:
    v = np.asarray(v)
    if v.dtype.kind in "Mm":  # datetime64 / timedelta64
        return {"b": v.view(np.int64), "dtype": _str_arr(str(v.dtype)), "kind": _str_arr("dt")}
    if v.dtype.kind in "US":  # unicode / bytes
        return {"b": np.frombuffer(v.tobytes(), np.uint8).copy(),
                "dtype": _str_arr(str(v.dtype)),
                "shape": np.array(v.shape, np.int64),
                "kind": _str_arr("str")}
    return {"b": v, "kind": _str_arr("num")}


def _decode(d: tp.Dict[str, np.ndarray]) -> np.ndarray:
    kind = _arr_str(d["kind"])
    if kind == "dt":
        return np.asarray(d["b"]).view(_arr_str(d["dtype"]))
    if kind == "str":
        dt = np.dtype(_arr_str(d["dtype"]))
        flat = np.frombuffer(np.asarray(d["b"], np.uint8).tobytes(), dt)
        return flat.reshape(tuple(np.asarray(d["shape"])))
    return np.asarray(d["b"])


def _str_arr(s: str) -> np.ndarray:
    return np.frombuffer(s.encode(), np.uint8).copy()


def _arr_str(a: np.ndarray) -> str:
    return np.asarray(a, np.uint8).tobytes().decode()


def save_blobs(path: str, blobs: tp.Dict[str, np.ndarray]) -> None:
    import orbax.checkpoint as ocp

    tree = {k.replace("/", _SEP): _encode(v) for k, v in blobs.items()}
    with ocp.StandardCheckpointer() as ckptr:
        import os

        ckptr.save(os.path.abspath(path), tree, force=True)


def load_blobs(path: str) -> tp.Dict[str, np.ndarray]:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        import os

        tree = ckptr.restore(os.path.abspath(path))
    return {k.replace(_SEP, "/"): _decode(v) for k, v in tree.items()}
