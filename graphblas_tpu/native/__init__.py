"""Native (C++) runtime components, loaded via ctypes.

Build-on-first-use with g++ (no pybind11 in the image; plain C ABI).  The
compiled library is cached next to the source keyed by a source hash.
"""

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_BUILD_ERROR = None


def _build_lib():
    src = os.path.join(_HERE, "router.cpp")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get("GRAPHBLAS_TPU_CACHE", os.path.expanduser("~/.cache/graphblas_tpu"))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"libgbtpu_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", "-pthread", src, "-o", tmp]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)
    lib = ctypes.CDLL(so_path)
    lib.gbtpu_euler_color.restype = ctypes.c_int
    lib.gbtpu_euler_color.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.gbtpu_euler_color2.restype = ctypes.c_int
    lib.gbtpu_euler_color2.argtypes = list(lib.gbtpu_euler_color.argtypes)
    lib.gbtpu_euler_color3.restype = ctypes.c_int
    lib.gbtpu_euler_color3.argtypes = list(lib.gbtpu_euler_color.argtypes)
    lib.gbtpu_euler_color_batched.restype = ctypes.c_int
    lib.gbtpu_euler_color_batched.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.gbtpu_counting_sort.restype = ctypes.c_int
    lib.gbtpu_counting_sort.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.gbtpu_build_network.restype = ctypes.c_int
    lib.gbtpu_build_network.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_int32),
    ]
    return lib


def get_lib():
    """The compiled native library, or None if unavailable."""
    global _LIB, _BUILD_ERROR
    if _LIB is not None or _BUILD_ERROR is not None:
        return _LIB
    with _LOCK:
        if _LIB is None and _BUILD_ERROR is None:
            try:
                _LIB = _build_lib()
            except Exception as exc:  # pragma: no cover - compiler missing
                _BUILD_ERROR = exc
    return _LIB


def euler_color(in_rows, out_rows, R, k=128):
    """Proper k-edge-coloring of the k-regular bipartite multigraph given by
    parallel arrays (in_rows, out_rows).  Falls back to a (slow) pure-Python
    implementation when no C++ toolchain is available."""
    in_rows = np.ascontiguousarray(in_rows, np.int32)
    out_rows = np.ascontiguousarray(out_rows, np.int32)
    E = len(in_rows)
    colors = np.empty(E, np.int32)
    lib = get_lib()
    if lib is not None:
        # successor-pairing split with K interleaved orbit walkers
        # (euler_color3): hides the DRAM latency of the dependent-load chain
        # that dominates full-size colorings; same proper-coloring contract
        rc = lib.gbtpu_euler_color3(
            in_rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            E,
            int(R),
            int(k),
            colors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise RuntimeError(f"gbtpu_euler_color failed with code {rc}")
        return colors
    return _euler_color_python(in_rows, out_rows, int(R), int(k))


def _euler_color_python(in_rows, out_rows, R, k):
    """Pure-Python fallback (slow; fine for tests)."""
    E = len(in_rows)
    colors = np.zeros(E, np.int32)

    def split(edge_ids):
        # adjacency lists
        adj = {}
        for t, e in enumerate(edge_ids):
            adj.setdefault(int(in_rows[e]), []).append(t)
            adj.setdefault(R + int(out_rows[e]), []).append(t)
        used = [False] * len(edge_ids)
        ptr = dict.fromkeys(adj, 0)
        bits = np.zeros(len(edge_ids), np.uint8)
        for v0 in list(adj):
            if ptr[v0] >= len(adj[v0]):
                continue
            vstack, estack, circuit = [v0], [-1], []
            while vstack:
                v = vstack[-1]
                p = ptr[v]
                lst = adj[v]
                while p < len(lst) and used[lst[p]]:
                    p += 1
                ptr[v] = p
                if p == len(lst):
                    vstack.pop()
                    t = estack.pop()
                    if t >= 0:
                        circuit.append(t)
                else:
                    t = lst[p]
                    used[t] = True
                    e = edge_ids[t]
                    other = R + int(out_rows[e]) if v < R else int(in_rows[e])
                    vstack.append(other)
                    estack.append(t)
            bit = 0
            for t in reversed(circuit):
                bits[t] = bit
                bit ^= 1
        return bits

    classes = [np.arange(E, dtype=np.int64)]
    level = 0
    kk = k
    while kk > 1:
        nxt = []
        for cls in classes:
            bits = split(cls)
            colors[cls[bits == 1]] |= 1 << level
            nxt.append(cls[bits == 0])
            nxt.append(cls[bits == 1])
        classes = nxt
        kk //= 2
        level += 1
    return colors


def build_network(perm, L, m):
    """Fused native Benes-network build: returns (s_tables, rsel) numpy
    arrays for ``ops.permute.build_permutation_plan``, or None when the
    native library is unavailable (caller falls back to the numpy path).
    s_tables: (2L+2, r, 128) int8 — forward S for lvl 0..L then backward
    S_post for lvl L..0.  rsel: (m, 128**L, 128) int32 (src_top)."""
    lib = get_lib()
    if lib is None:
        return None
    perm = np.ascontiguousarray(perm, np.int32)
    n = len(perm)
    r = n // 128
    s_tables = np.empty((2 * L + 2, r, 128), np.int8)
    rsel = np.empty((m, 128**L, 128), np.int32)
    rc = lib.gbtpu_build_network(
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        s_tables.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        rsel.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"gbtpu_build_network failed with code {rc}")
    return s_tables, rsel


def counting_sort(keys, n):
    """Stable counting sort permutation of int keys in [0, n)."""
    keys = np.ascontiguousarray(keys, np.int32)
    E = len(keys)
    if E and (int(keys.min()) < 0 or int(keys.max()) >= n):
        # the C++ sort indexes its count table by key: out-of-range keys
        # would corrupt the heap (segfault), so validate here
        raise IndexError(
            f"counting_sort keys out of range [0, {n}): min={int(keys.min())}, max={int(keys.max())}"
        )
    perm = np.empty(E, np.int64)
    lib = get_lib()
    if lib is not None:
        lib.gbtpu_counting_sort(
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            E,
            int(n),
            perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return perm
    return np.argsort(keys, kind="stable").astype(np.int64)


def euler_color_batched(in_rows_local, out_rows_grouped, seglen, Rs, k=128):
    """Color ``len(out_rows_grouped)//seglen`` independent subproblems in one
    native call (in_rows pattern shared across groups)."""
    in_rows_local = np.ascontiguousarray(in_rows_local, np.int32)
    out_rows_grouped = np.ascontiguousarray(out_rows_grouped, np.int32)
    E = len(out_rows_grouped)
    n_groups = E // seglen
    colors = np.empty(E, np.int32)
    lib = get_lib()
    if lib is not None:
        rc = lib.gbtpu_euler_color_batched(
            in_rows_local.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_rows_grouped.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            int(seglen),
            int(n_groups),
            int(Rs),
            int(k),
            colors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise RuntimeError(f"gbtpu_euler_color_batched failed with code {rc}")
        return colors
    for g in range(n_groups):
        seg = slice(g * seglen, (g + 1) * seglen)
        colors[seg] = _euler_color_python(in_rows_local, out_rows_grouped[seg], int(Rs), int(k))
    return colors
