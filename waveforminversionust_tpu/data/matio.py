"""MATLAB ``.mat`` I/O without external mat-file packages.

The reference loads its acquisition data with ``mat73`` (reference:
fwi_script.py:18, fwi_loss_function.py:137); ``RecordedData.mat`` is a MATLAB
v7.3 file, i.e. HDF5 with MATLAB attributes, and ``REC.mat`` is a classic v5
file. This module reads both (h5py for v7.3, scipy.io for v5) and writes
v7.3-compatible files so MATLAB can load framework outputs.
"""

from __future__ import annotations

import numpy as np

try:
    import h5py
    _HAVE_H5PY = True
except ImportError:  # pragma: no cover
    _HAVE_H5PY = False


def _is_hdf5(path: str) -> bool:
    # MATLAB v7.3 files carry a 512-byte userblock, so the HDF5 signature
    # sits at offset 512, not 0; h5py.is_hdf5 scans the legal offsets.
    if _HAVE_H5PY:
        return bool(h5py.is_hdf5(path))
    sig = b"\x89HDF\r\n\x1a\n"
    with open(path, "rb") as fh:
        head = fh.read(1024 + 8)
    return any(head[o:o + 8] == sig for o in (0, 512, 1024))


def _from_h5(node):
    data = np.asarray(node)
    if data.dtype.names and set(data.dtype.names) >= {"real", "imag"}:
        data = data["real"] + 1j * data["imag"]
    # MATLAB v7.3 stores arrays transposed (column-major on disk).
    return data.T


def load_mat(path: str) -> dict:
    """Load a .mat file (v7.3/HDF5 or classic v5) into {name: ndarray}.

    Matrices come back in MATLAB's logical orientation (e.g. the reference's
    ``REC_DATA`` as (256, 256) [tx, rx], ``C`` as (801, 801)).
    """
    if _is_hdf5(path):
        if not _HAVE_H5PY:  # pragma: no cover
            raise RuntimeError("h5py required for MATLAB v7.3 files")
        out = {}
        with h5py.File(path, "r") as fh:
            for key in fh.keys():
                if key.startswith("#"):
                    continue
                node = fh[key]
                if isinstance(node, h5py.Dataset):
                    out[key] = _from_h5(node)
        return out
    from scipy.io import loadmat as scipy_loadmat
    raw = scipy_loadmat(path)
    return {k: v for k, v in raw.items() if not k.startswith("__")}


def save_mat(path: str, arrays: dict) -> None:
    """Write a MATLAB v7.3-compatible (HDF5) .mat file.

    Numeric arrays only; complex data is stored as MATLAB's compound
    real/imag dtype; arrays are transposed to column-major as MATLAB expects.
    """
    if not _HAVE_H5PY:  # pragma: no cover
        raise RuntimeError("h5py required to write MATLAB v7.3 files")
    userblock = 512
    with h5py.File(path, "w", userblock_size=userblock) as fh:
        for name, value in arrays.items():
            value = np.asarray(value)
            if value.ndim == 0:
                value = value.reshape(1, 1)
            elif value.ndim == 1:
                value = value.reshape(-1, 1)
            matlab_class = {
                "f8": b"double", "f4": b"single",
                "i4": b"int32", "i8": b"int64",
            }.get(value.dtype.str[1:], b"double")
            if np.iscomplexobj(value):
                comp = np.empty(value.T.shape,
                                dtype=[("real", "<f8"), ("imag", "<f8")])
                comp["real"] = value.T.real
                comp["imag"] = value.T.imag
                ds = fh.create_dataset(name, data=comp)
                matlab_class = b"double"
            else:
                ds = fh.create_dataset(name, data=value.T.astype(np.float64)
                                       if value.dtype.kind == "f" else value.T)
            ds.attrs["MATLAB_class"] = np.bytes_(matlab_class)
    # MATLAB v7.3 magic header in the HDF5 userblock.
    header = ("MATLAB 7.3 MAT-file, written by waveforminversionust_tpu"
              .encode().ljust(116, b" ")
              + b"\x00" * 8 + np.uint16(0x0200).tobytes() + b"HM")
    with open(path, "r+b") as fh:
        fh.write(header[:128])


def load_recorded_dataset(path: str):
    """Load a RecordedData.mat-schema dataset (reference: SimulateData.m:62-63)
    into a :class:`~waveforminversionust_tpu.data.synthesize.RingDataset`."""
    from .synthesize import RingDataset
    raw = load_mat(path)
    return RingDataset(
        x=np.asarray(raw["x"]).ravel(),
        y=np.asarray(raw["y"]).ravel(),
        c=np.asarray(raw["C"]),
        x_circ=np.asarray(raw["x_circ"]).ravel(),
        y_circ=np.asarray(raw["y_circ"]).ravel(),
        f=float(np.asarray(raw["f"]).ravel()[0]),
        rec_data=np.asarray(raw["REC_DATA"]).astype(np.complex64),
    )


def save_recorded_dataset(path: str, ds) -> None:
    """Write a RingDataset in the reference RecordedData.mat schema."""
    save_mat(path, {
        "x": ds.x.reshape(-1, 1), "y": ds.y.reshape(-1, 1), "C": ds.c,
        "x_circ": ds.x_circ.reshape(-1, 1), "y_circ": ds.y_circ.reshape(-1, 1),
        "f": np.float64(ds.f), "REC_DATA": ds.rec_data.astype(np.complex128),
    })
