"""Native C++ IO runtime: parity with the pure-Python fallbacks."""

import numpy as np
import pytest

from thermalporous_tpu.core import Grid
from thermalporous_tpu.io import native, write_vti

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain not available"
)


def test_parse_floats_matches_numpy(tmp_path, rng):
    vals = rng.uniform(1e-6, 1e6, 5000)
    path = tmp_path / "vals.dat"
    path.write_text("\n".join(" ".join(f"{v:.8e}" for v in vals[i : i + 7])
                              for i in range(0, vals.size, 7)))
    a = native.parse_floats(str(path), vals.size + 10)
    b = np.fromfile(str(path), sep=" ")
    np.testing.assert_array_equal(a, b)


def test_parse_floats_missing_file():
    with pytest.raises(IOError):
        native.parse_floats("/nonexistent/file.dat", 10)


def test_vti_native_byte_identical(tmp_path, rng):
    g = Grid(shape=(7, 9), spacing=(1.0, 2.0))
    fields = {"p": rng.standard_normal(g.shape), "T": rng.standard_normal(g.shape)}
    nat = tmp_path / "nat.vti"
    py = tmp_path / "py.vti"
    write_vti(str(nat), g, fields)

    saved = (native._lib, native._load_attempted)
    try:
        native._lib, native._load_attempted = None, True  # force Python path
        write_vti(str(py), g, fields)
    finally:
        native._lib, native._load_attempted = saved

    assert nat.read_bytes() == py.read_bytes()
