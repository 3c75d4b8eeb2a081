"""Minimal PLY reader/writer (ascii + binary_little_endian), numpy-only.

Reference analog: the ply_utils submodule (tinyply-based; SURVEY.md §2.2) used
for point-cloud priors (``as_occ_prior.ply``), mesh export, and the
3DGS-layout splat dump (neural_gaussian.cpp:928-1026). plyfile isn't in this
environment, so this is a self-contained implementation.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

_PLY_TO_NP = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}
_NP_TO_PLY = {
    "int8": "char", "uint8": "uchar", "int16": "short", "uint16": "ushort",
    "int32": "int", "uint32": "uint", "float32": "float", "float64": "double",
}


def read_ply(path: os.PathLike) -> Dict[str, np.ndarray]:
    """Returns {element_name.property: array}; vertex properties as columns,
    plus 'face' -> [F, 3] int32 when a triangle face element exists."""
    with open(path, "rb") as f:
        line = f.readline().strip()
        if line != b"ply":
            raise ValueError(f"not a PLY file: {path}")
        fmt = None
        elements: List[Tuple[str, int, list]] = []  # (name, count, props)
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unexpected EOF in header")
            tok = line.strip().split()
            if not tok:
                continue
            if tok[0] == b"format":
                fmt = tok[1].decode()
            elif tok[0] == b"element":
                elements.append((tok[1].decode(), int(tok[2]), []))
            elif tok[0] == b"property":
                if tok[1] == b"list":
                    elements[-1][2].append(
                        ("list", tok[2].decode(), tok[3].decode(),
                         tok[4].decode())
                    )
                else:
                    elements[-1][2].append(
                        ("scalar", tok[1].decode(), tok[2].decode())
                    )
            elif tok[0] == b"end_header":
                break

        out: Dict[str, np.ndarray] = {}
        for name, count, props in elements:
            if any(p[0] == "list" for p in props):
                # list element (faces): assume one list property, uniform len 3
                if fmt == "ascii":
                    rows = []
                    for _ in range(count):
                        vals = f.readline().split()
                        n = int(vals[0])
                        rows.append([int(v) for v in vals[1 : 1 + n]])
                    faces = np.asarray(rows, dtype=np.int32)
                else:
                    _, cnt_t, idx_t, _ = props[0]
                    cnt_dt = np.dtype("<" + _PLY_TO_NP[cnt_t])
                    idx_dt = np.dtype("<" + _PLY_TO_NP[idx_t])
                    faces = np.empty((count, 3), dtype=np.int32)
                    # peek first count to verify triangles, then bulk read
                    raw = f.read(
                        count * (cnt_dt.itemsize + 3 * idx_dt.itemsize)
                    )
                    rec = np.dtype(
                        [("n", cnt_dt), ("v", idx_dt, (3,))]
                    )
                    arr = np.frombuffer(raw, dtype=rec, count=count)
                    if not np.all(arr["n"] == 3):
                        raise ValueError("only triangle faces supported")
                    faces = arr["v"].astype(np.int32)
                out[name] = faces
            else:
                dtypes = [
                    (p[2], ("<" if fmt != "ascii" else "") + _PLY_TO_NP[p[1]])
                    for p in props
                ]
                if fmt == "ascii":
                    data = np.loadtxt(
                        [f.readline() for _ in range(count)],
                        dtype=np.dtype(dtypes), ndmin=1,
                    )
                else:
                    rec = np.dtype(dtypes)
                    data = np.frombuffer(
                        f.read(count * rec.itemsize), dtype=rec, count=count
                    )
                for p in props:
                    out[f"{name}.{p[2]}"] = np.ascontiguousarray(data[p[2]])
    return out


def read_ply_xyz(path: os.PathLike) -> np.ndarray:
    d = read_ply(path)
    return np.stack(
        [d["vertex.x"], d["vertex.y"], d["vertex.z"]], axis=-1
    ).astype(np.float32)


def write_ply(
    path: os.PathLike,
    vertex_props: Dict[str, np.ndarray],
    faces: Optional[np.ndarray] = None,
    ascii_fmt: bool = False,
) -> None:
    """``vertex_props``: ordered {name: [N] or [N, k]} (k columns expand to
    name_0..name_{k-1} unless name in (x,y,z-style triples given separately)).
    """
    cols: List[Tuple[str, np.ndarray]] = []
    n = None
    for name, arr in vertex_props.items():
        arr = np.asarray(arr)
        if n is None:
            n = arr.shape[0]
        if arr.ndim == 1:
            cols.append((name, arr))
        else:
            flat = arr.reshape(n, -1)
            if flat.shape[1] == 1:
                cols.append((name, flat[:, 0]))
            else:
                for k in range(flat.shape[1]):
                    cols.append((f"{name}_{k}", flat[:, k]))

    header = ["ply"]
    header.append(
        "format ascii 1.0" if ascii_fmt else "format binary_little_endian 1.0"
    )
    header.append(f"element vertex {n}")
    for name, arr in cols:
        header.append(f"property {_NP_TO_PLY[arr.dtype.name]} {name}")
    if faces is not None:
        header.append(f"element face {len(faces)}")
        header.append("property list uchar int vertex_indices")
    header.append("end_header")

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if ascii_fmt:
            mat = np.column_stack([c[1].astype(np.float64) for c in cols])
            np.savetxt(f, mat, fmt="%.8g")
            if faces is not None:
                ff = np.column_stack(
                    [np.full(len(faces), 3, np.int64), faces]
                )
                np.savetxt(f, ff, fmt="%d")
        else:
            rec = np.dtype([(name, "<" + arr.dtype.str[1:]) for name, arr in cols])
            out = np.empty(n, dtype=rec)
            for name, arr in cols:
                out[name] = arr
            f.write(out.tobytes())
            if faces is not None:
                frec = np.dtype([("n", "u1"), ("v", "<i4", (3,))])
                fo = np.empty(len(faces), dtype=frec)
                fo["n"] = 3
                fo["v"] = np.asarray(faces, np.int32)
                f.write(fo.tobytes())


def write_ply_xyz(path, xyz: np.ndarray, colors: Optional[np.ndarray] = None):
    xyz = np.asarray(xyz, np.float32)
    props = {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2]}
    if colors is not None:
        c = np.asarray(colors)
        if c.dtype != np.uint8:
            c = (np.clip(c, 0, 1) * 255).astype(np.uint8)
        props.update({"red": c[:, 0], "green": c[:, 1], "blue": c[:, 2]})
    write_ply(path, props)
