"""ctypes bindings for the native table-generation runtime.

Builds ``libtablegen.so`` from ``tablegen.cpp`` on first use (g++ is part
of the toolchain); falls back to the pure-Python table builders when the
compiler or library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_HERE, "libtablegen.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_HERE, "tablegen.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH, src],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        os.path.join(_HERE, "tablegen.cpp")
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.pps_build_level.restype = ctypes.c_void_p
    lib.pps_build_level.argtypes = [
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_int32,
    ]
    for name in ("pps_num_patches", "pps_num_ifaces", "pps_num_contribs"):
        getattr(lib, name).restype = ctypes.c_int64
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    for name in (
        "pps_copy_ids", "pps_copy_starts", "pps_copy_spacings",
        "pps_copy_refine_level", "pps_copy_parent_id", "pps_copy_orth_on_parent",
        "pps_copy_neumann", "pps_copy_nbr_type", "pps_copy_nbr_slot",
        "pps_copy_coarse_orth", "pps_copy_fine_nbr_slots",
        "pps_copy_iface_side_idx", "pps_copy_iface_side_mask",
        "pps_copy_contrib_patch", "pps_copy_contrib_side",
        "pps_copy_contrib_iface", "pps_copy_contrib_case",
    ):
        getattr(lib, name).restype = None
        getattr(lib, name).argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.pps_free.restype = None
    lib.pps_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def build_level_native(tree, tree_level: int, n: int, neumann: bool):
    """Run the native level extraction + interface enumeration.

    Returns ``(PatchLevel, IfaceTables)`` or ``None`` if the native library
    is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    from ..domain import PatchLevel
    from ..iface import IfaceTables, case_templates

    D = tree.D
    S, O, half = 2 * D, 1 << D, 1 << (D - 1)
    N = len(tree.nodes)
    order = sorted(tree.nodes)
    ids = np.array(order, dtype=np.int64)
    level_arr = np.array([tree.nodes[i].level for i in order], dtype=np.int32)
    parent = np.array([tree.nodes[i].parent for i in order], dtype=np.int64)
    starts = np.ascontiguousarray(
        np.stack([tree.nodes[i].starts for i in order]), dtype=np.float64
    )
    lengths = np.ascontiguousarray(
        np.stack([tree.nodes[i].lengths for i in order]), dtype=np.float64
    )
    nbr_id = np.ascontiguousarray(
        np.stack([tree.nodes[i].nbr_id for i in order]), dtype=np.int64
    )
    child_id = np.ascontiguousarray(
        np.stack([tree.nodes[i].child_id for i in order]), dtype=np.int64
    )

    h = lib.pps_build_level(
        N, D, n, _ptr(ids), _ptr(level_arr), _ptr(parent), _ptr(starts),
        _ptr(lengths), _ptr(nbr_id), _ptr(child_id), tree_level, int(neumann),
    )
    try:
        P = lib.pps_num_patches(h)
        NIf = lib.pps_num_ifaces(h)
        C = lib.pps_num_contribs(h)

        def grab(fn, shape, dtype):
            out = np.empty(shape, dtype=dtype)
            getattr(lib, fn)(h, _ptr(out))
            return out

        pl = PatchLevel(
            D=D,
            n=n,
            tree_level=tree_level,
            ids=grab("pps_copy_ids", (P,), np.int64),
            starts=grab("pps_copy_starts", (P, D), np.float64),
            spacings=grab("pps_copy_spacings", (P, D), np.float64),
            refine_level=grab("pps_copy_refine_level", (P,), np.int32),
            parent_id=grab("pps_copy_parent_id", (P,), np.int64),
            orth_on_parent=grab("pps_copy_orth_on_parent", (P,), np.int32),
            neumann=grab("pps_copy_neumann", (P, S), np.uint8).astype(bool),
            nbr_type=grab("pps_copy_nbr_type", (P, S), np.int8),
            nbr_slot=grab("pps_copy_nbr_slot", (P, S), np.int64),
            coarse_orth=grab("pps_copy_coarse_orth", (P, S), np.int32),
            fine_nbr_slots=grab(
                "pps_copy_fine_nbr_slots", (P, S, half), np.int64
            ),
        )
        _, W, Src = case_templates(D, n)
        tables = IfaceTables(
            num_ifaces=int(NIf),
            m=n ** (D - 1),
            iface_side_idx=grab("pps_copy_iface_side_idx", (P, S), np.int32),
            iface_side_mask=grab(
                "pps_copy_iface_side_mask", (P, S), np.uint8
            ).astype(bool),
            contrib_patch=grab("pps_copy_contrib_patch", (C,), np.int32),
            contrib_side=grab("pps_copy_contrib_side", (C,), np.int32),
            contrib_iface=grab("pps_copy_contrib_iface", (C,), np.int32),
            contrib_case=grab("pps_copy_contrib_case", (C,), np.int32),
            case_w=W,
            case_src=Src,
        )
        return pl, tables
    finally:
        lib.pps_free(h)
