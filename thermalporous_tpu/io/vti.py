"""VTK ImageData (.vti/.pvd) output for structured-grid fields.

Replaces the reference's Firedrake ``File(...).write(...)`` VTK output
(SURVEY.md §5.4): on a structured grid the natural VTK container is
ImageData (regular cell data), not unstructured meshes — files are a
header plus raw cell arrays.  Writes raw-appended binary (no base64 bloat);
readable by ParaView/VisIt.

A native C++ fast path (``thermalporous_tpu.io.native``) is used when the
shared library is built; this module is the always-available pure-Python
fallback with identical output.
"""

from __future__ import annotations

import os
import struct
import xml.sax.saxutils as sax

import numpy as np

from thermalporous_tpu.core.grid import Grid

_VTK_TYPES = {
    np.dtype("float32"): "Float32",
    np.dtype("float64"): "Float64",
    np.dtype("int32"): "Int32",
    np.dtype("int64"): "Int64",
}


def _to_vtk_order(a: np.ndarray) -> np.ndarray:
    """Our [ix, iy(, iz)] layout → VTK's x-fastest C-ravel order."""
    if a.ndim == 2:
        a = a[:, :, None]
    return np.ascontiguousarray(a.transpose(2, 1, 0))


def write_vti(
    path: str,
    grid: Grid,
    cell_fields: dict[str, np.ndarray],
    origin: tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> str:
    """Write cell-centred fields to a .vti file (raw appended binary)."""
    shape = grid.shape if grid.dim == 3 else (*grid.shape, 1)
    spacing = (
        grid.spacing if grid.dim == 3 else (*grid.spacing, grid.thickness)
    )
    nx, ny, nz = shape

    arrays = []
    offset = 0
    header_parts = []
    for name, arr in cell_fields.items():
        a = np.asarray(arr)
        if a.shape != grid.shape:
            raise ValueError(f"field {name!r} has shape {a.shape}, want {grid.shape}")
        a = _to_vtk_order(a)
        if a.dtype not in _VTK_TYPES:
            a = a.astype(np.float64)
        vtk_type = _VTK_TYPES[a.dtype]
        raw = a.tobytes()
        header_parts.append(
            f'        <DataArray type="{vtk_type}" Name="{sax.escape(name)}" '
            f'format="appended" offset="{offset}"/>'
        )
        arrays.append(raw)
        offset += 8 + len(raw)  # uint64 byte-count prefix + payload

    first = next(iter(cell_fields)) if cell_fields else ""
    xml = [
        '<?xml version="1.0"?>',
        '<VTKFile type="ImageData" version="1.0" byte_order="LittleEndian" '
        'header_type="UInt64">',
        f'  <ImageData WholeExtent="0 {nx} 0 {ny} 0 {nz}" '
        f'Origin="{origin[0]} {origin[1]} {origin[2]}" '
        f'Spacing="{spacing[0]} {spacing[1]} {spacing[2]}">',
        f'    <Piece Extent="0 {nx} 0 {ny} 0 {nz}">',
        f'      <CellData Scalars="{sax.escape(first)}">',
        *header_parts,
        "      </CellData>",
        "    </Piece>",
        "  </ImageData>",
        '  <AppendedData encoding="raw">',
    ]
    header = ("\n".join(xml) + "\n_").encode()
    footer = b"\n  </AppendedData>\n</VTKFile>\n"

    from thermalporous_tpu.io import native

    if native.write_vti_raw(path, header, arrays, footer):
        return path
    with open(path, "wb") as f:  # pure-Python fallback (identical bytes)
        f.write(header)
        for raw in arrays:
            f.write(struct.pack("<Q", len(raw)))
            f.write(raw)
        f.write(footer)
    return path


class PVDWriter:
    """Time-series collection: one .pvd index + a .vti per snapshot.

    The structured-output counterpart of the reference's ``File("x.pvd")``.
    """

    def __init__(self, directory: str, name: str, grid: Grid):
        self.directory = directory
        self.name = name
        self.grid = grid
        self.entries: list[tuple[float, str]] = []
        os.makedirs(directory, exist_ok=True)

    def write(self, t: float, cell_fields: dict[str, np.ndarray]) -> str:
        fname = f"{self.name}_{len(self.entries):05d}.vti"
        write_vti(os.path.join(self.directory, fname), self.grid, cell_fields)
        self.entries.append((t, fname))
        self._write_pvd()
        return fname

    def _write_pvd(self):
        lines = [
            '<?xml version="1.0"?>',
            '<VTKFile type="Collection" version="1.0" byte_order="LittleEndian">',
            "  <Collection>",
        ]
        for t, fname in self.entries:
            lines.append(
                f'    <DataSet timestep="{t}" group="" part="0" file="{fname}"/>'
            )
        lines += ["  </Collection>", "</VTKFile>", ""]
        with open(os.path.join(self.directory, f"{self.name}.pvd"), "w") as f:
            f.write("\n".join(lines))


def state_fields(model, u) -> dict[str, np.ndarray]:
    """Standard named fields from a stacked state array."""
    names = ["pressure", "temperature", "saturation_w"][: u.shape[0]]
    return {n: np.asarray(u[i]) for i, n in enumerate(names)}
