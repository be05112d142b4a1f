"""Property-style fuzz of the `.pt` codec (io/torch_compat.py): every
(writer x reader) pair must roundtrip bit-exactly across the dtype x
shape x nesting matrix, because this codec carries the reference's
entire artifact contract (ref:bayesvlm/hessians.py:137-167,203-217 —
Hessian factors, feature caches, projection checkpoints) and round 3
found a latent writer bug only by review. Writers: the real torch.save
path and the hand-rolled no-torch zipfile writer. Readers: the
pure-NumPy unpickler and torch.load(weights_only=True)."""

import numpy as np
import pytest

from bayesvlm_tpu.io import torch_compat as tc

DTYPES = [np.float32, np.float64, np.float16, np.int64, np.int32,
          np.int16, np.int8, np.uint8, np.bool_]
SHAPES = [(), (0,), (1,), (7,), (3, 5), (2, 3, 4), (0, 4)]


def _make(dtype, shape, seed=0):
    rng = np.random.default_rng(seed)
    if dtype == np.bool_:
        return rng.integers(0, 2, size=shape).astype(np.bool_)
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        return rng.integers(info.min, info.max, size=shape,
                            dtype=np.int64).astype(dtype)
    return rng.normal(size=shape).astype(dtype)


def _writers():
    out = [("numpy", tc._save_pt_numpy)]
    if tc._HAS_TORCH:
        import torch

        out.append(("torch", lambda a, p: torch.save(
            torch.from_numpy(a.copy()), p)))
    return out


def _readers():
    out = [("numpy", tc._load_pt_numpy)]
    if tc._HAS_TORCH:
        out.append(("torch", tc.load_pt_array))
    return out


@pytest.mark.parametrize("dtype", DTYPES, ids=lambda d: np.dtype(d).name)
@pytest.mark.parametrize("shape", SHAPES, ids=str)
def test_single_tensor_matrix(tmp_path, dtype, shape):
    arr = _make(dtype, shape)
    for wname, write in _writers():
        path = tmp_path / f"{wname}.pt"
        write(arr, path)
        for rname, read in _readers():
            back = read(path)
            assert back.dtype == arr.dtype, (wname, rname)
            assert back.shape == arr.shape, (wname, rname)
            np.testing.assert_array_equal(back, arr, err_msg=f"{wname}->{rname}")


def test_bf16_read_widens_to_fp32(tmp_path):
    # NumPy has no bf16, so only torch can WRITE it; both readers must
    # widen to fp32 with the exact bit pattern (u16 << 16)
    torch = pytest.importorskip("torch")
    t = torch.randn(5, 3, dtype=torch.bfloat16)
    path = tmp_path / "bf16.pt"
    torch.save(t, path)
    expected = t.float().numpy()
    np.testing.assert_array_equal(tc._load_pt_numpy(path), expected)
    np.testing.assert_array_equal(tc.load_pt_array(path), expected)


@pytest.mark.parametrize("nest", ["flat", "nested"])
def test_state_dict_roundtrip(tmp_path, nest):
    state = {
        "weight": _make(np.float32, (4, 6), 1),
        "bias": _make(np.float16, (4,), 2),
        "steps": _make(np.int64, (), 3),
        "mask": _make(np.bool_, (6,), 4),
        "empty": _make(np.float32, (0, 4), 5),
    }
    if nest == "nested":
        state = {"layer0": dict(state), "meta": {"count": state["steps"]}}

    def _check(got, want, where):
        assert set(got) == set(want), where
        for k in want:
            if isinstance(want[k], dict):
                _check(got[k], want[k], f"{where}.{k}")
            else:
                assert got[k].dtype == want[k].dtype, f"{where}.{k}"
                np.testing.assert_array_equal(got[k], want[k],
                                              err_msg=f"{where}.{k}")

    # no-torch writer path
    np_path = tmp_path / "np.pt"
    tc._save_pt_numpy_dict(state, np_path)
    _check(tc._load_pt_numpy(np_path), state, "numpy->numpy")
    # public writer (torch path when torch importable)
    pub_path = tmp_path / "pub.pt"
    tc.save_pt_state_dict(state, pub_path)
    _check(tc.load_pt_array(pub_path), state, "save->load")
    _check(tc._load_pt_numpy(pub_path), state, "save->numpy")
    if tc._HAS_TORCH:
        import torch

        t = torch.load(np_path, map_location="cpu", weights_only=True)
        _check(tc._torch_to_numpy(t), state, "numpy->torch.load")


def test_shared_storage_views(tmp_path):
    # torch.save deduplicates storage: a tensor and its views share one
    # storage record with differing offset/stride. The NumPy reader must
    # reconstruct each view independently.
    torch = pytest.importorskip("torch")
    base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    views = {
        "base": base,
        "row": base[1],                 # offset 6, shape (6,)
        "col": base[:, 2],              # stride (6,), offset 2
        "trans": base.t(),              # stride-swapped
        "slice": base[1:3, 1:4],        # offset + both strides
    }
    path = tmp_path / "views.pt"
    torch.save(views, path)
    got = tc._load_pt_numpy(path)
    for k, v in views.items():
        np.testing.assert_array_equal(got[k], v.numpy(), err_msg=k)


def test_noncontiguous_input_to_writers(tmp_path):
    # writers must contiguous-ify transposed/sliced inputs
    arr = _make(np.float32, (6, 8), 7)[::2, 1::3].T
    assert not arr.flags["C_CONTIGUOUS"]
    tc.save_pt_array(arr, tmp_path / "a.pt")
    np.testing.assert_array_equal(tc.load_pt_array(tmp_path / "a.pt"), arr)
    tc._save_pt_numpy(arr, tmp_path / "b.pt")
    np.testing.assert_array_equal(tc._load_pt_numpy(tmp_path / "b.pt"), arr)


def test_unknown_storage_type_raises():
    """persistent_load must refuse storage types outside _DTYPE_MAP instead
    of silently reinterpreting the raw bytes as float32."""
    import pickle

    import pytest

    from bayesvlm_tpu.io.torch_compat import _PtUnpickler

    pid = ("storage", "ComplexFloatStorage", "0", "cpu", 4)
    with pytest.raises(pickle.UnpicklingError, match="ComplexFloatStorage"):
        _PtUnpickler.persistent_load(object(), pid)
