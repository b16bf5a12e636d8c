"""h5py reader/writer for pandas *fixed-format* HDF5 DataFrames.

MIMIC-Extract ships ``all_hourly_data.h5`` written by ``DataFrame.to_hdf``
in pandas' default fixed format, and ``pd.read_hdf`` refuses to open it
without the optional ``pytables`` dependency.  This module re-implements
just enough of the fixed-format layout (pandas ``io/pytables.py``
``BlockManagerFixed``/``GenericFixed``) on top of ``h5py`` to ingest those
frames — plain or MultiIndex axes, dtype-blocked values, byte-encoded
strings — so the MIMIC pipeline (reference
``src/fdiff/utils/preprocessing.py:83-180``) runs on boxes without
pytables.  The writer emits the same layout; it exists so tests can build
schema-accurate ``.h5`` fixtures here (pandas cannot write HDF without
pytables either) and round-trips through ``pd.read_hdf`` where pytables
*is* installed.

Layout summary (per frame stored at group ``/<key>``):

* group attrs: ``pandas_type=b"frame"``, ``nblocks``,
  ``axis{0,1}_variety`` ∈ {``regular``, ``multi``} (+ ``..._nlevels``);
* ``axis0`` = columns, ``axis1`` = index; a regular axis is one dataset
  with ``kind``/``name`` attrs, a multi axis is ``{key}_level{i}`` +
  ``{key}_label{i}`` (codes) datasets per level;
* per dtype-block ``i``: ``block{i}_items`` (an axis over the block's
  columns) and ``block{i}_values`` stored ``(n_items, n_rows)`` with
  ``transposed=True``;
* strings are stored as fixed-width ``S`` bytes (UTF-8).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any

import numpy as np
import pandas as pd

__all__ = ["read_fixed_frame", "write_fixed_frame"]


def _dec(value: Any) -> Any:
    """Decode an h5py attribute value: bytes → str (pytables stores Python
    objects such as a ``None`` index name as pickle bytes — unpickle those)."""
    if isinstance(value, np.generic):
        value = value.item()
    if isinstance(value, bytes):
        if value.startswith(b"\x80"):  # pickle protocol ≥ 2 opcode
            try:
                return pickle.loads(value)
            except Exception:
                return None
        return value.decode("utf-8")
    return value


def _decode_strings(values: np.ndarray) -> np.ndarray:
    if values.dtype.kind == "S":
        return np.char.decode(values, "utf-8").astype(object)
    return values


def _read_dataset(group: Any, key: str) -> tuple[np.ndarray, dict]:
    ds = group[key]
    return _decode_strings(ds[()]), dict(ds.attrs)


def _read_axis(group: Any, key: str) -> pd.Index:
    variety = _dec(group.attrs.get(f"{key}_variety", b"regular"))
    if variety == "multi":
        nlevels = int(group.attrs[f"{key}_nlevels"])
        levels, codes, names = [], [], []
        for i in range(nlevels):
            vals, attrs = _read_dataset(group, f"{key}_level{i}")
            name = _dec(attrs.get("name"))
            levels.append(pd.Index(vals, name=name))
            names.append(name)
            codes.append(_read_dataset(group, f"{key}_label{i}")[0])
        return pd.MultiIndex(levels=levels, codes=codes, names=names)
    vals, attrs = _read_dataset(group, key)
    name = _dec(attrs.get("name"))
    return pd.Index(vals, name=name if isinstance(name, str) else None)


def read_fixed_frame(path: Path | str, key: str) -> pd.DataFrame:
    """Read a fixed-format pandas DataFrame from ``path`` group ``key``."""
    import h5py

    with h5py.File(path, "r") as f:
        group = f[key]
        pandas_type = _dec(group.attrs.get("pandas_type", b""))
        if pandas_type != "frame":
            raise ValueError(
                f"{path}:{key} is pandas_type={pandas_type!r}, expected a "
                "fixed-format 'frame' (table-format frames need pytables)"
            )
        columns = _read_axis(group, "axis0")
        index = _read_axis(group, "axis1")
        parts = []
        for i in range(int(group.attrs["nblocks"])):
            items = _read_axis(group, f"block{i}_items")
            vals, attrs = _read_dataset(group, f"block{i}_values")
            if attrs.get("transposed", False):
                vals = vals.T
            parts.append(pd.DataFrame(vals, index=index, columns=items))
    df = pd.concat(parts, axis=1)
    df = df.reindex(columns=columns)
    df.columns = columns  # reindex drops MultiIndex level names
    return df


def _write_axis(group: Any, key: str, index: pd.Index) -> None:
    if isinstance(index, pd.MultiIndex):
        group.attrs[f"{key}_variety"] = np.bytes_("multi")
        group.attrs[f"{key}_nlevels"] = index.nlevels
        for i in range(index.nlevels):
            level = np.asarray(index.levels[i])
            ds = group.create_dataset(f"{key}_level{i}", data=_encode(level))
            name = index.names[i]
            ds.attrs["kind"] = np.bytes_(
                "string" if level.dtype.kind in "OSU" else "integer"
            )
            if name is not None:
                ds.attrs["name"] = np.bytes_(str(name))
            group.create_dataset(
                f"{key}_label{i}", data=np.asarray(index.codes[i])
            )
        return
    group.attrs[f"{key}_variety"] = np.bytes_("regular")
    values = np.asarray(index)
    ds = group.create_dataset(key, data=_encode(values))
    ds.attrs["kind"] = np.bytes_(
        "string" if values.dtype.kind in "OSU" else "integer"
    )
    if index.name is not None:
        ds.attrs["name"] = np.bytes_(str(index.name))


def _encode(values: np.ndarray) -> np.ndarray:
    if values.dtype.kind in "OU":
        return np.char.encode(values.astype(str), "utf-8")
    return values


def write_fixed_frame(
    df: pd.DataFrame, path: Path | str, key: str, mode: str = "a"
) -> None:
    """Write ``df`` to ``path`` group ``key`` in pandas fixed format."""
    import h5py

    with h5py.File(path, mode) as f:
        if key in f:
            del f[key]
        group = f.create_group(key)
        group.attrs["pandas_type"] = np.bytes_("frame")
        group.attrs["pandas_version"] = np.bytes_("0.15.2")
        group.attrs["encoding"] = np.bytes_("UTF-8")
        group.attrs["errors"] = np.bytes_("strict")
        group.attrs["ndim"] = 2
        _write_axis(group, "axis0", df.columns)
        _write_axis(group, "axis1", df.index)

        # One block per distinct dtype, mirroring the BlockManager layout.
        by_dtype: dict[np.dtype, list[int]] = {}
        for pos, dtype in enumerate(df.dtypes):
            by_dtype.setdefault(np.dtype(dtype), []).append(pos)
        group.attrs["nblocks"] = len(by_dtype)
        for i, (dtype, locs) in enumerate(by_dtype.items()):
            _write_axis(group, f"block{i}_items", df.columns[locs])
            values = df.iloc[:, locs].to_numpy(dtype=dtype).T
            ds = group.create_dataset(
                f"block{i}_values", data=_encode(values)
            )
            ds.attrs["transposed"] = True
