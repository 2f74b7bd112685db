"""HDF5 output and first-class checkpoint/restore.

The snapshot/diagnostics layout matches the reference
(``niwqg/Saving.py:6-101``): ``setup.h5`` with grid arrays, per-snapshot
``snapshots/{t:015.0f}.h5`` files with the requested fields, and a final
``diagnostics.h5`` with one dataset per accumulated series.

Checkpoint/restore is new: the reference can only re-seed q/phi from a
snapshot, losing the clock, budget accumulators and diagnostics
(SURVEY.md §5). ``save_checkpoint``/``load_checkpoint`` round-trip the full
state pytree (complex pairs stored as stacked re/im), the step counter, and
the accumulated diagnostic series.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import h5py
import numpy as np

from .carray import C


def _file_exist(fno: str, overwrite: bool = True):
    """``niwqg/Saving.py:23-36``."""
    if os.path.exists(fno):
        if overwrite:
            os.remove(fno)
        else:
            raise IOError("File exists: {0}".format(fno))


class Saver:
    """Per-model output manager (path layout as ``niwqg/Saving.py``).

    ``snapshot_format='h5'`` reproduces the reference's blocking
    one-file-per-snapshot HDF5 layout; ``'npy-async'`` streams each field
    as ``snapshots/{t}.{field}.npy`` through the native C++ background
    writer (``io_native.AsyncSnapshotWriter``) so the step loop never
    waits on disk.
    """

    def __init__(self, path: str, save_to_disk: bool, overwrite: bool = True,
                 snapshot_format: str = "h5"):
        self.path = path
        self.save_to_disk = save_to_disk
        self.overwrite = overwrite
        self.snapshot_format = snapshot_format
        self._async_writer = None
        self._last_stem = None
        if save_to_disk:
            # exist_ok on BOTH levels: a pre-existing output/ without
            # snapshots/ previously skipped creation entirely and every
            # snapshot write then failed (review r5)
            os.makedirs(os.path.join(path, "snapshots"), exist_ok=True)
        if save_to_disk and snapshot_format == "npy-async":
            from .io_native import AsyncSnapshotWriter

            self._async_writer = AsyncSnapshotWriter(n_threads=2)

    def save_setup(self, model):
        if not self.save_to_disk:
            return
        fno = os.path.join(self.path, "setup.h5")
        _file_exist(fno, overwrite=self.overwrite)
        g = model.grid
        with h5py.File(fno, "w") as h5file:
            h5file.create_dataset("grid/nx", data=g.nx, dtype=int)
            h5file.create_dataset("grid/x", data=g.x_np)
            h5file.create_dataset("grid/y", data=g.y_np)
            h5file.create_dataset("grid/wv", data=g.wv_np)
            h5file.create_dataset("grid/k", data=g.kk_np)
            h5file.create_dataset("grid/l", data=g.ll_np)

    def save_snapshot(self, model, fields: List[str]):
        """Write one snapshot named by zero-padded time
        (``niwqg/Saving.py:59-86``). Caller handles cadence."""
        if not self.save_to_disk:
            return
        t = float(np.asarray(model.t))
        stem = "{:015.0f}".format(t)  # reference naming (Saving.py:72)
        if stem == self._last_stem:
            # dt < 1 (nondimensional time units): successive snapshots
            # round to the same integer stem and overwrite each other —
            # a reference-layout limitation worth shouting about
            import logging

            logging.getLogger(__name__).warning(
                "snapshot stem %s repeats (dt < 1 time unit between "
                "snapshots?) — overwriting the previous snapshot file",
                stem)
        self._last_stem = stem
        if self._async_writer is not None:
            for field in fields:
                fno = os.path.join(self.path, "snapshots",
                                   f"{stem}.{field}.npy")
                self._async_writer.submit_npy(
                    fno, np.asarray(model.get_field(field))
                )
            return
        fno = os.path.join(self.path, "snapshots", stem + ".h5")
        _file_exist(fno)
        with h5py.File(fno, "w") as h5file:
            for field in fields:
                h5file.create_dataset(field, data=model.get_field(field))

    def save_diagnostics(self, diagnostics: Dict[str, dict]):
        """``niwqg/Saving.py:88-101``."""
        if not self.save_to_disk:
            return
        self.drain()  # flush queued snapshot writes + surface errors
        fno = os.path.join(self.path, "diagnostics.h5")
        _file_exist(fno, overwrite=self.overwrite)
        with h5py.File(fno, "w") as h5file:
            for key, entry in diagnostics.items():
                h5file.create_dataset(key, data=entry["value"])

    def drain(self):
        if self._async_writer is not None:
            self._async_writer.drain()
            n = self._async_writer.errors()
            if n:
                raise IOError(
                    f"{n} async snapshot write(s) failed (disk full / "
                    f"unwritable path?) — output under {self.path!r} is "
                    f"incomplete")


# ----------------------------------------------------------------------
# checkpoint / restore (new capability; SURVEY.md §5 resume gap)
# ----------------------------------------------------------------------
def _write_tree(h5group, name: str, value):
    if value is None:  # optional state slot (e.g. Derived.p, spectral mode)
        return
    if isinstance(value, C):
        h5group.create_dataset(
            name, data=np.stack([np.asarray(value.re), np.asarray(value.im)])
        )
        h5group[name].attrs["kind"] = "cpair"
    else:
        h5group.create_dataset(name, data=np.asarray(value))
        h5group[name].attrs["kind"] = "array"


def save_checkpoint(path: str, model, extra: Optional[Dict] = None):
    """Write the full model state (+ diagnostic series) to one HDF5 file."""
    state = model.state
    fields = state._asdict()
    with h5py.File(path, "w") as f:
        sgrp = f.create_group("state")
        for name, value in fields.items():
            if hasattr(value, "_asdict"):  # nested NamedTuple (Derived)
                sub = sgrp.create_group(name)
                for n2, v2 in value._asdict().items():
                    _write_tree(sub, n2, v2)
            else:
                _write_tree(sgrp, name, value)
        dgrp = f.create_group("diagnostics")
        for name, series in model._diag_acc.series.items():
            if series:
                dgrp.create_dataset(name, data=np.hstack([np.asarray(v) for v in series]))
        f.attrs["model"] = model.model
        f.attrs["nx"] = model.nx
        if extra:
            egrp = f.create_group("extra")
            for k, v in extra.items():
                egrp.create_dataset(k, data=np.asarray(v))


def _read_value(ds, dtype):
    data = np.asarray(ds)
    if ds.attrs.get("kind") == "cpair":
        import jax.numpy as jnp

        return C(jnp.asarray(data[0].astype(dtype)),
                 jnp.asarray(data[1].astype(dtype)))
    import jax.numpy as jnp

    if data.ndim == 0 and data.dtype.kind == "i":
        return jnp.asarray(data)
    return jnp.asarray(data.astype(dtype) if data.dtype.kind == "f" else data)


def load_checkpoint(path: str, model):
    """Restore state + diagnostics into ``model`` (in place)."""
    dtype = model.kernel.dtype
    state_cls = type(model.state)
    with h5py.File(path, "r") as f:
        sgrp = f["state"]
        kwargs = {}
        for name in state_cls._fields:
            node = sgrp[name]
            if isinstance(node, h5py.Group):
                sub_cls = type(getattr(model.state, name))
                sub_kwargs = {
                    n2: (_read_value(node[n2], dtype) if n2 in node else None)
                    for n2 in sub_cls._fields
                }
                kwargs[name] = sub_cls(**sub_kwargs)
            else:
                kwargs[name] = _read_value(node, dtype)
        state = state_cls(**kwargs)
        # normalize the optional Derived.p slot to the loading kernel's
        # convention (a checkpoint may come from the other budget mode;
        # scan carries require a consistent pytree structure)
        if hasattr(state, "d"):
            drop_p = getattr(model.kernel, "_drop_p", False)
            if drop_p and state.d.p is not None:
                state = state._replace(d=state.d._replace(p=None))
            elif not drop_p and state.d.p is None:
                p = model.kernel._inv_real(state.d.ph)
                state = state._replace(d=state.d._replace(p=p))
        model.state = state
        if "diagnostics" in f:
            for name in f["diagnostics"]:
                if name in model._diag_acc.series:
                    model._diag_acc.series[name] = [np.asarray(f["diagnostics"][name])]
    return model
