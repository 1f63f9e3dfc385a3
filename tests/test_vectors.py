"""functions/vectors.py: Arrow list<float> <-> numpy matrix kernels."""

import numpy as np
import pyarrow as pa
import pytest

from opentapioca_ray.functions.vectors import list_to_matrix, matrix_to_list


def test_list_to_matrix_roundtrip():
    mat = np.arange(12, dtype=np.float64).reshape(4, 3)
    col = matrix_to_list(mat)
    assert col.type == pa.list_(pa.float64())
    back = list_to_matrix(col)
    np.testing.assert_array_equal(back, mat)


def test_list_to_matrix_matches_pylist_path():
    rng = np.random.RandomState(7)
    mat = rng.randn(50, 16)
    col = pa.array([list(r) for r in mat], type=pa.list_(pa.float64()))
    np.testing.assert_allclose(list_to_matrix(col), mat)


def test_chunked_and_sliced_input():
    mat = np.arange(20, dtype=np.float64).reshape(5, 4)
    col = pa.chunked_array(
        [matrix_to_list(mat[:2]), matrix_to_list(mat[2:])]
    )
    np.testing.assert_array_equal(list_to_matrix(col), mat)
    # a slice must respect offsets, not read the whole values buffer
    sliced = matrix_to_list(mat).slice(1, 3)
    np.testing.assert_array_equal(list_to_matrix(sliced), mat[1:4])


def test_fixed_size_list():
    mat = np.arange(6, dtype=np.float32).reshape(2, 3)
    col = pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel()), 3)
    out = list_to_matrix(col)
    assert out.dtype == np.float64
    np.testing.assert_array_equal(out, mat.astype(np.float64))


def test_empty_and_ragged():
    assert list_to_matrix(pa.array([], type=pa.list_(pa.float64()))).shape == (0, 0)
    ragged = pa.array([[1.0, 2.0], [3.0]], type=pa.list_(pa.float64()))
    with pytest.raises(ValueError):
        list_to_matrix(ragged)
    with_null = pa.array([[1.0, 2.0], None], type=pa.list_(pa.float64()))
    with pytest.raises(ValueError):
        list_to_matrix(with_null)
